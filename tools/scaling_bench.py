"""Scaling benchmark: samples/s vs device count (BASELINE.json config 5).

Weak scaling of the sharded PIGS-style fused fwd+bwd step: collocation
points shard over 'data', Gaussians optionally shard over 'model'
(partial-mixture psum + shard-local optimizer).  The scaling gate is
>= 80% linear samples/s from 1 device to N devices.

On real multi-chip hardware run one process per host with
``jax.distributed.initialize`` (parallel/mesh.initialize_distributed) and the
same flags.  Without a pod this validates mechanics and measures on a virtual
CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py

Env: SCALE_P (gaussians/device), SCALE_N (samples/device), SCALE_STEPS,
SCALE_MODE (replicated|model), SCALE_DEVICES (comma list of device counts),
SCALE_STRONG=1 (strong scaling: SCALE_P/SCALE_N are TOTALS held fixed
across device counts - on the virtual mesh this separates sharded-step
overhead from CPU-silicon saturation, since total FLOPs no longer grow
with the device count).
Prints one JSON line per device count.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# The axon sitecustomize force-registers the tunneled TPU and overrides
# JAX_PLATFORMS; honor the env explicitly (must happen before device use).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from dgs_tpu.config import SamplerConfig
from dgs_tpu.models import pigs
from dgs_tpu.models.field import init_field
from dgs_tpu.parallel import mesh as pmesh


def run_one(n_dev: int, P_per: int, N_per: int, steps: int, mode: str,
            strong: bool):
    devices = jax.devices()[:n_dev]
    n_model = 2 if (mode == "model" and n_dev % 2 == 0) else 1
    mesh = pmesh.make_mesh((n_dev // n_model, n_model), devices=devices)
    cfg = SamplerConfig(work_blocks_fwd=16, work_blocks_bwd=32)
    u_star, f_rhs = pigs.manufactured_solution(2)
    if strong:
        # Fixed TOTAL workload: P_per/N_per are totals; each device holds a
        # 1/n slice.  Ideal strong scaling keeps samples/s flat per device
        # count times n; on the virtual mesh total FLOPs stay constant, so
        # any efficiency loss is sharded-step overhead, not silicon.
        P = P_per
        N = N_per
    else:
        P = P_per * (n_model if mode == "model" else 1)
        N = N_per * n_dev
    field = init_field(jax.random.PRNGKey(0), P, 2, 1, sigma=2.0 / P**0.5)
    opt = optax.adam(1e-3)

    if mode == "model":
        step, shard_field = pmesh.make_model_sharded_pigs_step(
            cfg, mesh, opt, f_rhs, u_star, n_collocation=N, method="tiled"
        )
        state = pigs.TrainState(
            shard_field(field), shard_field(opt.init(field)),
            jnp.zeros((), jnp.int32),
        )
    else:
        step = pmesh.make_sharded_pigs_step(
            cfg, mesh, opt, f_rhs, u_star, n_collocation=N, method="tiled"
        )
        state = pmesh.replicate(
            pigs.TrainState(field, opt.init(field), jnp.zeros((), jnp.int32)),
            mesh,
        )

    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    state, metrics = step(state, sub)
    jax.block_until_ready(metrics)  # compile

    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / steps
    return N / dt, dt


def main():
    P_per = int(os.environ.get("SCALE_P", 20_000))
    N_per = int(os.environ.get("SCALE_N", 100_000))
    steps = int(os.environ.get("SCALE_STEPS", 5))
    mode = os.environ.get("SCALE_MODE", "replicated")
    strong = os.environ.get("SCALE_STRONG", "") not in ("", "0")
    counts = [
        int(x)
        for x in os.environ.get("SCALE_DEVICES", "").split(",")
        if x
    ] or sorted({1, min(2, len(jax.devices())), len(jax.devices())})

    counts = [n for n in counts if n <= len(jax.devices())]
    if strong and counts:
        # Strong mode treats SCALE_P/SCALE_N as fixed totals; every device
        # count must divide them (make_sharded_pigs_step asserts it).  Round
        # up front so an indivisible total can't abort mid-sweep.
        lcm = 1
        for n in counts:
            import math

            lcm = lcm * n // math.gcd(lcm, n)
        N_r = -(-N_per // lcm) * lcm
        P_r = -(-P_per // lcm) * lcm
        if (N_r, P_r) != (N_per, P_per):
            print(f"note: rounding SCALE_N {N_per}->{N_r}, SCALE_P "
                  f"{P_per}->{P_r} to a multiple of the device counts "
                  f"{counts}", file=sys.stderr)
            N_per, P_per = N_r, P_r

    base = None
    for n in counts:
        sps, dt = run_one(n, P_per, N_per, steps, mode, strong)
        if base is None:
            base, base_n = sps, n
        # Weak scaling: ideal = per-device throughput fixed, so total
        # throughput scales as n / base_n relative to the FIRST measured
        # count (which need not be 1 device).  Strong scaling: ideal = step
        # time drops 1/n, so the same n/base_n ratio applies.
        eff = (sps / base) * (base_n / n)
        print(json.dumps({
            "metric": ("strong" if strong else "weak")
                      + "_scaling_samples_per_sec",
            "devices": n,
            "mode": mode,
            "value": round(sps, 1),
            "step_s": round(dt, 5),
            "scaling_efficiency_vs_first_count": round(eff, 4),
            "baseline_devices": base_n,
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
