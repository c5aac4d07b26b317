"""Microbench: in-kernel Mosaic dot patterns at the backward/forward block
shapes, isolating the K-thin-dots vs one-folded-dot tradeoff at both
precisions.  Each variant runs the same grid of work items; only the dot
structure differs.  Usage: python tools/bench_dots.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ITEMS = int(os.environ.get("DOTS_ITEMS", 4000))
BN = int(os.environ.get("DOTS_BN", 256))
BP = int(os.environ.get("DOTS_BP", 128))
K = int(os.environ.get("DOTS_K", 6))
C = int(os.environ.get("DOTS_C", 4))
R = int(os.environ.get("DOTS_R", 104))


def _kern(mode, prec, g_ref, w_ref, cb_ref, out_ref):
    G = w_ref[...]                    # (BN, BP) stand-in for the pair array
    if mode == "classic":
        acc = None
        for k in range(K):
            g_t = g_ref[k * C:(k + 1) * C, :]      # (C, BN)
            # per-component weight: one elementwise multiply (the G*poly)
            wk = G * (1.0 + 1e-3 * k)
            dv = jnp.dot(g_t, wk, preferred_element_type=jnp.float32,
                         precision=prec)
            acc = dv if acc is None else acc + dv
        out_ref[0:C, :] = acc
    elif mode == "folded":
        Z = jnp.dot(cb_ref[...], G, preferred_element_type=jnp.float32,
                    precision=prec)                # (R, BP)
        acc = None
        for r in range(0, R - C + 1, C):
            t = Z[r:r + C, :] * (1.0 + 1e-4 * r)
            acc = t if acc is None else acc + t
        out_ref[0:C, :] = acc
    else:  # none: no dot at all (baseline kernel overhead)
        out_ref[0:C, :] = G[0:C, :] * 2.0


def run(mode, prec):
    g = jnp.ones((K * C, BN), jnp.float32)
    w = jnp.ones((ITEMS, BN, BP), jnp.float32) * 0.5
    cb = jnp.ones((R, BN), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ITEMS,),
        in_specs=[
            pl.BlockSpec((K * C, BN), lambda w_: (0, 0)),
            pl.BlockSpec((1, BN, BP), lambda w_: (w_, 0, 0)),
            pl.BlockSpec((R, BN), lambda w_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, BP), lambda w_: (0, 0)),
    )

    def kern(g_ref, w_ref, cb_ref, out_ref):
        _kern(mode, prec, g_ref, w_ref[0], cb_ref, out_ref)

    f = jax.jit(lambda g, w, cb: pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, BP), jnp.float32),
    )(g, w, cb))
    out = jax.block_until_ready(f(g, w, cb))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(g, w, cb))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{mode:8s} {str(prec).split('.')[-1]:8s} "
          f"{med * 1e3:8.2f} ms  ({med / ITEMS * 1e9:7.1f} ns/item)",
          flush=True)


if __name__ == "__main__":
    for mode in ("none", "classic", "folded"):
        for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
            run(mode, prec)
