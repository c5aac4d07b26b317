"""Stage-level timing of the tiled pipeline on the real chip.

Splits the benchmark step into: binning build, forward geometry, tiled
forward, tiled backward (via grad of fwd), and reports each in ms.
Usage: python tools/profile_stages.py [P] [N] [tile] [bn] [be] [bbn] [bbe]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from dgs_tpu.config import SamplerConfig
from dgs_tpu.binning import grid as binning
from dgs_tpu.models.field import init_field
from dgs_tpu.ops import sampling

P = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
tile = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0637
bn = int(sys.argv[4]) if len(sys.argv) > 4 else 256
be = int(sys.argv[5]) if len(sys.argv) > 5 else 512
bbn = int(sys.argv[6]) if len(sys.argv) > 6 else 128
bbe = int(sys.argv[7]) if len(sys.argv) > 7 else 256
ORDERS = ("value", "derivative", "laplacian")

cfg = SamplerConfig(
    tile_size=tile, eig_floor=1e-12, max_tiles_per_gaussian=2,
    work_blocks_fwd=64, work_blocks_bwd=256,
)
sigma = 2.0 / P**0.5
field = init_field(jax.random.PRNGKey(0), P, 2, 4, sigma=sigma)
samples = jax.random.uniform(jax.random.PRNGKey(1), (N, 2), minval=-1, maxval=1)
means, values = field.means, field.values
conics, covs = field.conics(), field.covariances()


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s} {1e3 * sorted(ts)[len(ts) // 2]:9.2f} ms")
    return out


build = jax.jit(binning.build, static_argnums=(0,))
state = timeit("binning.build", build, cfg, means, covs, samples)

geom = jax.jit(
    lambda st: (
        binning.forward_geometry(st, bn, be),
        binning.backward_geometry(st, bbe, bbn),
    )
)
(fg, bg) = timeit("geometry", geom, state)
fwd_work = int(jax.device_get(fg[1].max()))
bwd_work = int(jax.device_get(bg[1].max()))
print(f"{'fwd/bwd work blocks':24s} {fwd_work:6d} {bwd_work:6d}")
E = state.num_entries
print(f"{'entries (E)':24s} {E:9d}")


@jax.jit
def fwd(m, v, c):
    outs = sampling.sample_tiled_multi(
        ORDERS, cfg.period, m, v, c, samples, state, fg, bg,
        fwd_work, bwd_work, block_n=bn, block_e=be,
        bwd_block_n=bbn, bwd_block_e=bbe,
    )
    return outs


timeit("tiled forward", fwd, means, values, conics)


@jax.jit
def fwdbwd(m, v, c):
    def loss(m_, v_, c_):
        outs = sampling.sample_tiled_multi(
            ORDERS, cfg.period, m_, v_, c_, samples, state, fg, bg,
            fwd_work, bwd_work, block_n=bn, block_e=be,
            bwd_block_n=bbn, bwd_block_e=bbe,
        )
        return sum(jnp.sum(o * o) for o in outs)

    return jax.value_and_grad(loss, argnums=(0, 1, 2))(m, v, c)


timeit("tiled fwd+bwd", fwdbwd, means, values, conics)
