"""On-chip sweep of the chunk-packed sampling path (ops/sampling_chunked).

Sweeps (tile_size, block_n, block_e) at a fixed workload and prints a
ms/step table.  The chunked path's thesis: fine tiles cut the same-tile
candidate-pair total toward the true 3-sigma neighborhood ((2r+tile)^D
scaling) where the range-overlap work list of kernels/tiled.py would
collapse in density - this tool measures where that trade actually wins.

Timing: 1-vs-3 chained-run difference with a device_get scalar sync
(jax.block_until_ready can return early over the tunneled backend - see
bench.py).

Env: SWEEP_D (2), SWEEP_P (100_000), SWEEP_N (1_000_000), SWEEP_STEPS (5),
SWEEP_TILES / SWEEP_BLOCKS (comma lists; blocks as bnxbe items).
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgs_tpu.config import SamplerConfig
from dgs_tpu.models.field import init_field
from dgs_tpu.ops import formulas, sampling_chunked

ORDERS = ("value", "derivative", "laplacian")


def measure(cfg, cplan, field, samples, steps):
    dev = jax.devices()[0]
    field = jax.device_put(field, dev)
    samples = jax.device_put(samples, dev)
    sb = sampling_chunked.chunk_samples(cfg, samples, cplan, cfg.block_n)
    N, D = samples.shape

    def loss_fn(field, samples, sb):
        outs, diag = sampling_chunked.sample_chunked(
            cfg, field.means, field.values, field.conics(),
            field.covariances(), samples, cplan, sb, ORDERS,
            padded_outputs=True)
        loss = sum(
            jnp.einsum("ucn,u->", o * o,
                       jnp.asarray(formulas.sym_multiplicity(order, D),
                                   jnp.float32))
            for order, o in outs.items()
        )
        return loss / N, {k: v for k, v in diag.items() if k != "perm"}

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(field, samples, sb, n):
        def step(field, _):
            (loss, diag), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(field, samples, sb)
            field = jax.tree.map(lambda p, g: p - 1e-12 * g, field, grads)
            return field, (loss, diag)

        return jax.lax.scan(step, field, None, length=n)

    fw, (loss, diag) = run(field, samples, sb, steps)
    float(jax.device_get(loss[-1]))
    t0 = time.perf_counter()
    f, (loss, _) = run(fw, samples, sb, steps)
    float(jax.device_get(loss[-1]))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    f, (loss, _) = run(fw, samples, sb, steps)
    f, (loss, _) = run(f, samples, sb, steps)
    f, (loss, diag) = run(f, samples, sb, steps)
    float(jax.device_get(loss[-1]))
    t_three = time.perf_counter() - t0
    dt = (t_three - t_one) / (2 * steps)
    overflow = {k: int(v) for k, v in jax.tree.map(
        lambda x: jax.device_get(x[-1]), diag).items()}
    return dt, overflow


def main():
    D = int(os.environ.get("SWEEP_D", 2))
    P = int(os.environ.get("SWEEP_P", 100_000))
    N = int(os.environ.get("SWEEP_N", 1_000_000))
    steps = int(os.environ.get("SWEEP_STEPS", 5))
    C = 4
    sigma = 2.0 / max(P, 1) ** (1.0 / D)
    default_tiles = {2: "0.051,0.04,0.032,0.025,0.02",
                     3: "0.25,0.2,0.16,0.125,0.1"}[D]
    tiles = [float(t) for t in
             os.environ.get("SWEEP_TILES", default_tiles).split(",")]
    blocks = [tuple(int(x) for x in b.split("x")) for b in
              os.environ.get("SWEEP_BLOCKS", "256x128").split(",")]

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        field = init_field(jax.random.PRNGKey(0), P, D, C, sigma=sigma)
        samples = jax.random.uniform(
            jax.random.PRNGKey(1), (N, D), minval=-1.0, maxval=1.0)

    print(f"D={D} P={P} N={N} sigma={sigma:.4f} orders={ORDERS}")
    print(f"{'tile':>7} {'bn':>4} {'be':>4} {'entries':>9} {'work_f':>7} "
          f"{'work_b':>7} {'ms/step':>8} {'Msmp/s':>7}  overflow")
    for tile in tiles:
        for bn, be in blocks:
            cfg = SamplerConfig(
                tile_size=tile, max_tiles_per_gaussian=3, eig_floor=1e-12,
                block_n=bn, block_p=be, block_n_bwd=bn, block_p_bwd=be,
                axis_radii=os.environ.get("BENCH_AXIS", "1") == "1",
                work_span_fwd=int(os.environ.get("BENCH_SPAN_F", 1)),
                work_span_bwd=int(os.environ.get("BENCH_SPAN_B", 1)))
            try:
                with jax.default_device(cpu):
                    cfg, cplan = sampling_chunked.plan_chunked(
                        cfg, field.means, field.covariances(), samples)
            except ValueError as e:
                print(f"{tile:>7} {bn:>4} {be:>4}  SKIP: {e}")
                continue
            dt, overflow = measure(cfg, cplan, field, samples, steps)
            bad = {k: v for k, v in overflow.items() if v}
            print(f"{tile:>7} {bn:>4} {be:>4} {cplan.entries:>9} "
                  f"{cplan.work_fwd:>7} {cplan.work_bwd:>7} "
                  f"{dt * 1e3:>8.2f} {N / dt / 1e6:>7.1f}  {bad or 'ok'}",
                  flush=True)


if __name__ == "__main__":
    main()
