"""Measure the Pallas per-work-item (grid step) overhead on the real chip.

Runs a scalar-prefetch work-list kernel whose compute is a single in-place
add over the output block, for several item counts and block sizes; the
slope of time vs items is the pure per-item cost (index-map evals + DMA
issue + grid step).  This number decides whether packing multiple column
blocks into one work item (fewer, fatter items) can pay.

Env: OH_ITEMS (comma list), OH_BLOCKS ("bnxbe" list), OH_REPS.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _kernel(n_prefetch, span, *refs):
    aux_ref = refs[0]
    in_refs = refs[n_prefetch:n_prefetch + span]
    out_ref = refs[n_prefetch + span]
    w = pl.program_id(0)
    a = aux_ref[w]

    @pl.when((a & 2) != 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    for m in range(span):
        @pl.when((a & 1) != 0)
        def _compute(m=m):
            out_ref[...] += in_refs[m][...]


def run_case(items, bn, be, rows, reps, span=1):
    """``span`` packs that many column blocks into one grid step (one input
    ref per sub-block, same underlying array): items/span grid steps cover
    the same logical blocks - the difference isolates the per-grid-step
    (non-DMA) share of the item overhead."""
    RB = 64  # output row blocks; items spread round-robin over columns
    steps = -(-items // span)
    aux = ((jnp.arange(steps, dtype=jnp.int32) % RB) * 4 + 1)
    aux = aux.at[:RB].add(2)  # first visit of each row block inits
    # sort by row block so the output index map is monotone
    aux = jnp.sort(aux)
    col = jnp.arange(steps, dtype=jnp.int32) % RB
    x = jnp.ones((rows, RB * be), jnp.float32)

    def col_map_m(m):
        def col_map(w, a, c):
            return (0, jnp.minimum(c[w] + m, RB - 1))
        return col_map

    def row_map(w, a, c):
        return (0, a[w] >> 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=[pl.BlockSpec((rows, be), col_map_m(m))
                  for m in range(span)],
        out_specs=pl.BlockSpec((rows, bn), row_map),
    )
    f = jax.jit(lambda a, c, x: pl.pallas_call(
        functools.partial(_kernel, 2, span),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, RB * bn), jnp.float32),
    )(a, c, *([x] * span)))

    # hmm: in block (rows, be) vs out block (rows, bn) need bn == be for +=
    o = f(aux, col, x)
    float(jax.device_get(o.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(aux, col, x)
    float(jax.device_get(o.ravel()[0]))
    t1 = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(3 * reps):
        o = f(aux, col, x)
    float(jax.device_get(o.ravel()[0]))
    t3 = (time.perf_counter() - t0) / reps
    return (t3 - t1) / 2


def main():
    items_list = [int(x) for x in os.environ.get(
        "OH_ITEMS", "2000,8000,32000,128000").split(",")]
    blocks = [tuple(int(v) for v in b.split("x")) for b in os.environ.get(
        "OH_BLOCKS", "128x128,512x512").split(",")]
    reps = int(os.environ.get("OH_REPS", 5))
    spans = [int(x) for x in os.environ.get("OH_SPAN", "1").split(",")]
    for bn, be in blocks:
        assert bn == be, "in/out blocks must match for the += kernel"
        for span in spans:
            prev = None
            for items in items_list:
                dt = run_case(items, bn, be, 8, reps, span=span)
                slope = ""
                if prev is not None:
                    di, dtm = items - prev[0], dt - prev[1]
                    slope = f"  slope {dtm / di * 1e9:.0f} ns/logical-block"
                print(f"block {bn}x{be} span {span} items {items:>7}: "
                      f"{dt*1e3:8.3f} ms{slope}", flush=True)
                prev = (items, dt)


if __name__ == "__main__":
    main()
