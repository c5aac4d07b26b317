"""On-chip sweep of the tiled kernels' pair-block sizes.

Runs the bench workload once per block configuration in a single process
(kernel compiles dominate; the slow first device->host transfer is paid once
at the end).  Usage:  python tools/sweep_blocks.py
Env: SWEEP_P, SWEEP_N, SWEEP_TILE, SWEEP_STEPS.
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgs_tpu.config import SamplerConfig
from dgs_tpu.models.field import init_field
from dgs_tpu.models.pigs import field_outputs
from dgs_tpu.ops import formulas
from dgs_tpu.utils import native

import os as _os

COMBOS = [
    tuple(int(x) for x in c.split("x"))
    for c in _os.environ.get(
        "SWEEP_COMBOS",
        "512x128x256x256,512x256x256x256,512x128x512x256,512x256x256x512,"
        "1024x256x256x256").split(",")
]  # (block_n, block_p, block_n_bwd, block_p_bwd); override via SWEEP_COMBOS

ORDERS = ("value", "derivative", "laplacian")


def main():
    P = int(os.environ.get("SWEEP_P", 100_000))
    D = int(os.environ.get("SWEEP_D", 2))
    N = int(os.environ.get("SWEEP_N", 1_000_000))
    steps = int(os.environ.get("SWEEP_STEPS", 8))
    tile = float(os.environ.get("SWEEP_TILE", {2: 0.051, 3: 0.25}.get(D, 0.1)))
    C = 4
    sigma = 2.0 / max(P, 1) ** (1.0 / D)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        field = init_field(jax.random.PRNGKey(0), P, D, C, sigma=sigma)
        samples = jax.random.uniform(
            jax.random.PRNGKey(1), (N, D), minval=-1.0, maxval=1.0
        )
    dev = jax.devices()[0]
    field_d = jax.device_put(field, dev)
    samples_d = jax.device_put(samples, dev)

    mults = {
        o: jnp.asarray(formulas.sym_multiplicity(o, D), jnp.float32)
        for o in ORDERS
    }

    results = []
    for combo in COMBOS:
        bn, be, bbn, bbe = combo
        cfg0 = SamplerConfig(
            tile_size=tile, max_tiles_per_gaussian=3, eig_floor=1e-12,
            block_n=bn, block_p=be, block_n_bwd=bbn, block_p_bwd=bbe,
            axis_radii=os.environ.get("BENCH_AXIS", "1") == "1",
            work_span_fwd=int(os.environ.get("BENCH_SPAN_F", 2)),
            work_span_bwd=int(os.environ.get("BENCH_SPAN_B", 2)),
        )
        plan = native.plan_capacities(cfg0, field.means, field.covariances(),
                                      samples)
        cfg = native.config_from_plan(cfg0, plan, P)

        from dgs_tpu.binning import grid as binning

        def loss_fn(f, s, sb):
            outs, diag = field_outputs(cfg, f, s, orders=ORDERS,
                                       method="tiled", sorted_outputs=True,
                                       unique_outputs=True,
                                       padded_outputs=True, sample_binning=sb)
            loss = sum(jnp.einsum("ucn,u->", o * o, mults[k])
                       for k, o in outs.items())
            return loss

        import functools

        @functools.partial(jax.jit, static_argnums=(3,))
        def run(f, s, sb, n):
            def step(f, _):
                l, g = jax.value_and_grad(loss_fn)(f, s, sb)
                return jax.tree.map(lambda p, gr: p - 1e-12 * gr, f, g), l
            return jax.lax.scan(step, f, None, length=n)

        sb = jax.jit(binning.bin_samples, static_argnums=0)(cfg, samples_d)
        t0 = time.perf_counter()
        out = run(field_d, samples_d, sb, steps)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = run(field_d, samples_d, sb, steps)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / steps
        results.append((combo, dt, compile_s))
        print(f"combo {combo}: {dt*1e3:.1f} ms/step "
              f"(compile {compile_s:.0f}s)", flush=True)

    results.sort(key=lambda r: r[1])
    print("\nbest-to-worst:")
    for combo, dt, _ in results:
        print(f"  {combo}: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
