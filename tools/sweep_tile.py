"""On-chip tile_size sweep for the TILED sampling path.

Pairs scale as (tile + 2r)^D while per-entry structure costs (sort,
gather, grad segment-sum) scale with the entry count P*(1 + 2r/tile)^D -
this tool measures where the trade sits after each round's entry-cost
changes.  Timing: 1-vs-3 chained-run difference with a device_get scalar
sync (see bench.py).

Env: SWEEP_D (2), SWEEP_P (100_000), SWEEP_N (1_000_000), SWEEP_STEPS (5),
SWEEP_TILES (comma list), SWEEP_BLOCKS (bnxbexbbnxbbe items).
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
from dgs_tpu.models.pigs import field_outputs
from dgs_tpu.ops import formulas
from dgs_tpu.utils import native

ORDERS = tuple(
    os.environ.get("SWEEP_ORDERS", "value,derivative,laplacian").split(","))


def measure(cfg, field, samples, steps):
    from dgs_tpu.binning import grid as binning

    dev = jax.devices()[0]
    field = jax.device_put(field, dev)
    samples = jax.device_put(samples, dev)
    N, D = samples.shape
    mults = {o: jnp.asarray(formulas.sym_multiplicity(o, D), jnp.float32)
             for o in ORDERS}

    def loss_fn(f, s, sb):
        outs, diag = field_outputs(cfg, f, s, orders=ORDERS, method="tiled",
                                   sorted_outputs=True, unique_outputs=True,
                                   padded_outputs=True, sample_binning=sb)
        loss = sum(jnp.einsum("ucn,u->", o * o, mults[k])
                   for k, o in outs.items())
        return loss / N, {k: v for k, v in diag.items() if k != "perm"}

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(f, s, sb, n):
        def step(f, _):
            (l, diag), g = jax.value_and_grad(
                loss_fn, has_aux=True)(f, s, sb)
            return jax.tree.map(lambda p, gr: p - 1e-12 * gr, f, g), (l, diag)
        return jax.lax.scan(step, f, None, length=n)

    sb = jax.jit(binning.bin_samples, static_argnums=0)(cfg, samples)
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
    default_tiles = {1: "0.02,0.01", 2: "0.051,0.04,0.032,0.025",
                     3: "0.25,0.2,0.167"}[D]
    tiles = [float(t) for t in
             os.environ.get("SWEEP_TILES", default_tiles).split(",")]
    dflt = SamplerConfig()
    dblk = f"{dflt.block_n}x{dflt.block_p}x{dflt.bwd_blocks[0]}x" \
           f"{dflt.bwd_blocks[1]}"
    blocks = [tuple(int(x) for x in b.split("x")) for b in
              os.environ.get("SWEEP_BLOCKS", dblk).split(",")]

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        field = init_field(jax.random.PRNGKey(0), P, D, C, sigma=sigma)
        samples = jax.random.uniform(
            jax.random.PRNGKey(1), (N, D), minval=-1.0, maxval=1.0)

    print(f"D={D} P={P} N={N} sigma={sigma:.4f} orders={ORDERS}")
    print(f"{'tile':>7} {'blocks':>18} {'entries':>9} {'R':>2} "
          f"{'ms/step':>8} {'Msmp/s':>7}  overflow")
    for tile in tiles:
        for bn, be, bbn, bbe in blocks:
            cfg0 = SamplerConfig(
                tile_size=tile, max_tiles_per_gaussian=4, eig_floor=1e-12,
                block_n=bn, block_p=be, block_n_bwd=bbn, block_p_bwd=bbe)
            with jax.default_device(cpu):
                plan = native.plan_capacities(
                    cfg0, field.means, field.covariances(), samples)
                cfg = native.config_from_plan(cfg0, plan, P)
            dt, overflow = measure(cfg, field, samples, steps)
            bad = {k: v for k, v in overflow.items() if v}
            print(f"{tile:>7} {f'{bn}x{be}x{bbn}x{bbe}':>18} "
                  f"{plan['entries']:>9} {plan['max_extent']:>2} "
                  f"{dt * 1e3:>8.2f} {N / dt / 1e6:>7.1f}  {bad or 'ok'}",
                  flush=True)


if __name__ == "__main__":
    main()
