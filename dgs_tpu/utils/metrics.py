"""Structured per-step metrics logging (JSONL).

The reference has no observability beyond stderr prints (SURVEY.md section 5);
this provides the samples/s / loss / grad-norm / overflow-diagnostic stream
the training loop and benchmarks emit.
"""

from __future__ import annotations

import json
import time
from typing import IO, Optional


class JsonlLogger:
    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None):
        self._fh = open(path, "a") if path else stream
        self._owns = path is not None
        self._t0 = time.time()

    def log(self, record: dict) -> None:
        record = dict(record)
        record.setdefault("t", round(time.time() - self._t0, 3))
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._owns and self._fh is not None:
            self._fh.close()
