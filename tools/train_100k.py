"""Config-4 at spec: PIGS training at P=100k on one chip, dynamics net
included (BASELINE.json config 4; SURVEY.md 3.5 composition).

Phase A - PIGS PDE training (sampling subsystem): 100k Gaussians, PDE
residual + data loss over resampled collocation points, Adam on all field
parameters (means move: validates the planner's drift headroom - every
overflow diagnostic must end at 0).

Phase B - dynamics training (aggregation subsystem): the attention
neighbor-aggregation layer rolls the 100k-Gaussian field forward in time
against the advection-diffusion solution, through the Pallas chunked
pair-sweep kernels.

Prints one JSON line per phase with step time, loss start/end, overflow.

Env: T100K_P, T100K_STEPS, T100K_COLLOC, T100K_DSTEPS, T100K_EVAL.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from dgs_tpu.config import SamplerConfig
from dgs_tpu.models import dynamics, pigs


def main():
    P = int(os.environ.get("T100K_P", 100_000))
    steps = int(os.environ.get("T100K_STEPS", 300))
    n_col = int(os.environ.get("T100K_COLLOC", 262_144))
    d_steps = int(os.environ.get("T100K_DSTEPS", 60))
    n_eval = int(os.environ.get("T100K_EVAL", 65_536))
    D = 2
    sigma = 2.0 / max(P, 1) ** 0.5

    # ---- Phase A: PIGS PDE training at 100k ----
    skip_a = os.environ.get("T100K_SKIP_A")
    cfg = SamplerConfig(tile_size=float(os.environ.get("T100K_TILE", 0.051)),
                        eig_floor=1e-12,
                        axis_radii=os.environ.get("BENCH_AXIS", "1") == "1",
                        ellip_cull=os.environ.get("BENCH_ELLIP", "1") == "1",
                        work_span_fwd=int(os.environ.get("BENCH_SPAN_F", 2)),
                        work_span_bwd=int(os.environ.get("BENCH_SPAN_B", 2)))
    if not skip_a:
        t0 = time.perf_counter()
        state, history = pigs.train(
            cfg, P=P, D=D, C=1, steps=steps, n_collocation=n_col,
            learning_rate=2e-3, sigma=sigma, method="tiled",
            log_every=max(steps // 6, 1),
        )
        dt = time.perf_counter() - t0
        last = history[-1]
        overflow = {
            k: last.get(k, 0.0)
            for k in ("bin_overflow", "work_overflow_fwd",
                      "work_overflow_bwd")
        }
        # Steady-state step time: min over warm scan chunks (the first
        # chunk pays compilation; dt/steps would smear it in).
        warm = [h["t_step_s"] for h in history[1:]] or [dt / steps]
        print(json.dumps({
            "metric": "pigs_100k_train_step_seconds",
            "value": round(min(warm), 5),
            "wall_s_per_step_incl_compile": round(dt / steps, 5),
            "unit": "s/step",
            "P": P, "steps": steps, "n_collocation": n_col,
            "loss_first": round(history[0]["loss"], 3),
            "loss_last": round(last["loss"], 3),
            "overflow": overflow,
            "loss_curve": [round(h["loss"], 3) for h in history],
            "backend": jax.default_backend(),
        }))
        assert all(v == 0 for v in overflow.values()), overflow
        assert last["loss"] < history[0]["loss"] * 0.5, "no convergence"

    # ---- Phase B: dynamics net (aggregation) at 100k ----
    # Production loop shape: batched rollout evaluation (one sampler call
    # for every rollout depth), scan-chunked optimizer steps, shared-base
    # frequency ladder (angle-addition sincos recurrence in the kernels).
    # The eval tile auto-shrinks to the cloud's footprints inside
    # make_value_eval (T100K_DTILE overrides it explicitly).
    cfg_d = SamplerConfig(
        eig_floor=1e-12,
        tile_size=float(os.environ.get("T100K_DTILE", 0.51)),
        axis_radii=os.environ.get("BENCH_AXIS", "1") == "1",
        ellip_cull=os.environ.get("BENCH_ELLIP", "1") == "1",
        work_span_fwd=int(os.environ.get("BENCH_SPAN_F", 2)),
        work_span_bwd=int(os.environ.get("BENCH_SPAN_B", 2)))
    t0 = time.perf_counter()
    params, dhist = dynamics.train(
        cfg_d, P=P, D=D, steps=d_steps, rollout=2, sigma=sigma * 3.0,
        n_eval=n_eval, method="pallas", eval_method="tiled",
        log_every=max(d_steps // 6, 1), ladder_frequencies=True,
        scan_chunk=int(os.environ.get("T100K_DCHUNK", 10)),
    )
    dt = time.perf_counter() - t0
    warm_d = min(h["t_step_s"] for h in dhist[1:]) if len(dhist) > 1 else (
        dt / d_steps)
    print(json.dumps({
        "metric": "dynamics_100k_train_step_seconds",
        "value": round(warm_d, 5),
        "wall_s_per_step_incl_compile": round(dt / d_steps, 5),
        "unit": "s/step",
        "P": P, "steps": d_steps, "rollout": 2, "n_eval": n_eval,
        "loss_first": round(dhist[0]["loss"], 6),
        "loss_last": round(dhist[-1]["loss"], 6),
        "nbr_overflow": dhist[-1]["nbr_overflow"],
        "eval_overflow": dhist[-1]["eval_overflow"],
        "backend": jax.default_backend(),
    }))
    assert dhist[-1]["nbr_overflow"] == 0
    assert dhist[-1]["eval_overflow"] == 0
    assert dhist[-1]["loss"] < dhist[0]["loss"], "dynamics no improvement"


if __name__ == "__main__":
    main()
