"""Stage timing at the benchmark operating point (same config as bench.py).

Measures, on the real chip, median sustained time of:
  * binning build + geometry + work lists (no kernels)
  * forward only (loss value, no grad)
  * full fwd+bwd (value_and_grad)
Differences localize kernel time.  Usage: python tools/profile_bench.py
(env overrides as in bench.py).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dgs_tpu.config import SamplerConfig
from dgs_tpu.models.field import init_field
from dgs_tpu.models.pigs import field_outputs
from dgs_tpu.ops import formulas
from dgs_tpu.utils import native
from dgs_tpu.binning import grid as binning

ORDERS = ("value", "derivative", "laplacian")


def timeit(name, fn, *args, reps=7):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    med = 1e3 * sorted(ts)[len(ts) // 2]
    print(f"{name:28s} {med:9.2f} ms", flush=True)
    return out, med


def main():
    P = int(os.environ.get("BENCH_P", 100_000))
    N = int(os.environ.get("BENCH_N", 1_000_000))
    tile = float(os.environ.get("BENCH_TILE", 0.0637))
    D, C = 2, 4
    sigma = float(os.environ.get("BENCH_SIGMA", 2.0 / max(P, 1) ** 0.5))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        field = init_field(jax.random.PRNGKey(0), P, D, C, sigma=sigma)
        samples = jax.random.uniform(
            jax.random.PRNGKey(1), (N, D), minval=-1.0, maxval=1.0
        )
    cfg = SamplerConfig(
        tile_size=tile,
        max_tiles_per_gaussian=int(os.environ.get("BENCH_R", 3)),
        eig_floor=float(os.environ.get("BENCH_EIG_FLOOR", 1e-12)),
    )
    plan = native.plan_capacities(cfg, field.means, field.covariances(),
                                  samples)
    print({k: int(v) for k, v in plan.items()})
    dev = jax.devices()[0]
    field = jax.device_put(field, dev)
    samples = jax.device_put(samples, dev)
    cfg = native.config_from_plan(cfg, plan, P)

    @jax.jit
    def bin_only(field, samples):
        st = binning.build(cfg, field.means, field.covariances(), samples)
        fg = binning.forward_geometry(st, cfg.block_n, cfg.block_p)
        bg = binning.backward_geometry(st, cfg.bwd_blocks[1],
                                       cfg.bwd_blocks[0])
        return st.ent_gid, st.s_perm, fg, bg

    def loss_fn(field, samples):
        outs, diag = field_outputs(cfg, field, samples, orders=ORDERS,
                                   method="tiled", sorted_outputs=True,
                                   unique_outputs=True)
        loss = sum(
            jnp.einsum("nuc,u->", o * o,
                       jnp.asarray(formulas.sym_multiplicity(order, D),
                                   jnp.float32))
            for order, o in outs.items()
        )
        return loss

    fwd_only = jax.jit(loss_fn)

    @jax.jit
    def full(field, samples):
        loss, grads = jax.value_and_grad(loss_fn)(field, samples)
        return jax.tree.map(lambda p, g: p - 1e-12 * g, field, grads)

    _, t_bin = timeit("binning+geometry", bin_only, field, samples)
    _, t_fwd = timeit("binning+forward", fwd_only, field, samples)
    _, t_all = timeit("full fwd+bwd step", full, field, samples)
    print(f"{'=> forward kernels':28s} {t_fwd - t_bin:9.2f} ms")
    print(f"{'=> backward part':28s} {t_all - t_fwd:9.2f} ms")


if __name__ == "__main__":
    main()
