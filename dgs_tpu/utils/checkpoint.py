"""Checkpoint / resume for training state (Orbax).

The reference has no checkpointing (its snapshot dumps are crash forensics,
__init__.py:44, not resumable state - SURVEY.md section 5).  Here the full
TrainState pytree (Gaussian field + optimizer state + step counter) round-
trips through Orbax.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(state), force=True)


def restore(path: str, template: Any) -> Any:
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path, item=jax.device_get(template))
    return jax.tree.map(jax.numpy.asarray, restored)
