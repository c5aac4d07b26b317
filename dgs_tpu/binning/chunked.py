"""Per-tile chunk packing for same-tile pair sweeps.

The generic work list (kernels/tiled.py) pairs row blocks with column blocks
whenever their tile RANGES overlap; when both sides have only a few dozen
rows per tile (the aggregation regime: ~100 entries and ~30 centers per
tile at P=100k) the pair blocks are mostly cross-tile slack - measured 8.9%
same-tile pair density at 256x256 blocks.  This module instead pads each
side so every tile's rows start at a chunk boundary, and emits one work
item per same-tile (row-chunk, col-chunk) pair: density becomes
sum_t e_t*c_t / (ceil(e_t/Be)*Be * ceil(c_t/Bc)*Bc) - ~50-60% at
(Be, Bc) = (128, 16..32) for Poisson-occupancy tiles.

Both layouts and the work lists are shape-static and jit-compatible; the
planner measures exact capacities from one eager geometry build.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunk_counts(starts: jnp.ndarray, block: int) -> jnp.ndarray:
    """(T,) chunks per tile for tile-sorted rows with range table ``starts``
    ((T+2,) searchsorted layout; sentinel rows beyond tile T-1 excluded)."""
    T = starts.shape[0] - 2
    n = starts[1:T + 1] - starts[:T]
    return -(-n // block)


def chunk_layout(starts: jnp.ndarray, block: int, cap_chunks: int):
    """Padded per-tile chunk layout for tile-sorted rows.

    Rows of tile t (the contiguous range [starts[t], starts[t+1])) are
    re-laid-out to begin at chunk boundary ``base[t] * block``; every chunk
    holds rows of exactly one tile (trailing slots are pads).

    Every per-slot array is built as a (cap_chunks, block) broadcast of
    chunk-level quantities - per-SLOT gathers (hundreds of thousands of
    rows) serialize at ~10ns/row on TPU and would dominate the preprocess.

    Returns (src, valid, slot_tile, chunk_tile, base, m, overflow):
      src        (cap_chunks*block,) int32 source row per padded slot
                 (monotone nondecreasing; clipped for pads)
      valid      (cap_chunks*block,) bool, False for pad slots
      slot_tile  (cap_chunks*block,) int32 tile of each slot, T for pads
      chunk_tile (cap_chunks,) int32 tile of each chunk, T for unused chunks
      base       (T,) int32 first chunk index of each tile
      m          (T,) int32 chunks per tile
      overflow   () int32 chunks beyond cap_chunks (0 => exact layout)
    """
    T = starts.shape[0] - 2
    m = chunk_counts(starts, block)
    base = (jnp.cumsum(m) - m).astype(jnp.int32)
    total = base[-1] + m[-1]
    overflow = jnp.maximum(total - cap_chunks, 0).astype(jnp.int32)

    # chunk -> tile: scatter tile boundaries, prefix-sum.  base is
    # nondecreasing with duplicates (m_t == 0 tiles); add-with-drop
    # accumulates one increment per crossed boundary.
    c = jnp.arange(cap_chunks, dtype=jnp.int32)
    chunk_tile = jnp.cumsum(
        jnp.zeros((cap_chunks,), jnp.int32).at[base[1:]].add(1, mode="drop")
    )
    chunk_tile = jnp.clip(chunk_tile, 0, T - 1)
    chunk_tile = jnp.where(c < total, chunk_tile, T)

    t_of = jnp.clip(chunk_tile, 0, T - 1)          # chunk-level gathers
    chunk_src0 = starts[t_of] + (c - base[t_of]) * block
    off = jnp.arange(block, dtype=jnp.int32)[None, :]
    src2 = chunk_src0[:, None] + off               # (cap_chunks, block)
    lim = starts[t_of + 1]
    valid2 = (src2 < lim[:, None]) & (chunk_tile < T)[:, None]
    slot_tile2 = jnp.where(
        valid2, jnp.broadcast_to(chunk_tile[:, None], valid2.shape), T
    )
    src = jnp.clip(src2, 0, jnp.maximum(starts[T] - 1, 0)).reshape(-1)
    return (src, valid2.reshape(-1), slot_tile2.reshape(-1), chunk_tile,
            base, m.astype(jnp.int32), overflow)


def work_total(m_row: jnp.ndarray, m_col: jnp.ndarray,
               span: int = 1) -> jnp.ndarray:
    """Work items for a row-major same-tile chunk sweep: every row chunk
    emits at least one item (zero-init), real items are the per-tile
    (row-chunk x ceil(col-chunks / span)) cross products."""
    return jnp.sum(m_row * jnp.maximum(-(-m_col // span), 1))


def work_list(m_row, m_col, row_base, col_base, cap: int, colmax: int,
              span: int = 1):
    """Same-tile chunk work list, ordered row-chunk-major.

    For each tile: m_row[t] x max(ceil(m_col[t]/span), 1) items, grouped by
    row chunk (so the kernel's output block accumulates across consecutive
    grid steps) with the tile's col chunks enumerated inside.  Encoding
    matches kernels/tiled.work_list: aux = row_chunk * 4 + first * 2 +
    compute, col = FIRST col chunk of the item's span consecutive
    sub-blocks, lcnt = live sub-blocks.

    Returns (aux (cap,), col (cap,), lcnt (cap,), overflow ()).
    """
    T = m_row.shape[0]
    mi = jnp.maximum(-(-m_col // span), 1)   # items per row chunk
    it = m_row * mi
    istart = (jnp.cumsum(it) - it).astype(jnp.int32)
    total = istart[-1] + it[-1]
    overflow = jnp.maximum(total - cap, 0).astype(jnp.int32)

    w = jnp.arange(cap, dtype=jnp.int32)
    t = jnp.cumsum(
        jnp.zeros((cap,), jnp.int32).at[istart[1:]].add(1, mode="drop")
    )
    t = jnp.clip(t, 0, T - 1)
    o = w - istart[t]
    mi_t = mi[t]
    rl = o // mi_t
    cl = (o - rl * mi_t) * span
    live = w < total
    first = ((cl == 0) & live).astype(jnp.int32)
    lcnt = jnp.where(live, jnp.clip(m_col[t] - cl, 0, span), 0
                     ).astype(jnp.int32)
    compute = (lcnt > 0).astype(jnp.int32)
    row_chunk = row_base[t] + rl
    col_chunk = jnp.clip(
        col_base[t] + jnp.minimum(cl, jnp.maximum(m_col[t] - 1, 0)),
        0, colmax - 1,
    )
    aux = row_chunk * 4 + first * 2 + compute
    return (aux.astype(jnp.int32), col_chunk.astype(jnp.int32), lcnt,
            overflow)


def row_sweeps(m_row, m_col, row_base, col_base, chunk_tile_row, colmax: int,
               span: int = 1):
    """Per-row-chunk (first col chunk, first work item) scalars for the
    COMPRESSED work-list form (kernels/tiled.py, cap > COMPRESS_ABOVE:
    per-item aux only, col derived as clip(base[row] + (w - start[row]) *
    span)).

    Valid because a row chunk's col sweep is contiguous by construction:
    row chunk rl of tile t owns items [istart[t] + rl*mi, ...+mi) over col
    chunks [col_base[t], col_base[t]+m_col) - exactly the (base, start)
    affine form.  ``chunk_tile_row`` is chunk_layout's chunk->tile map for
    the ROW side (T on unused chunks - their scalars are never read: no aux
    entry points at them)."""
    T = m_row.shape[0]
    mi = jnp.maximum(-(-m_col // span), 1)
    it = m_row * mi
    istart = (jnp.cumsum(it) - it).astype(jnp.int32)
    t = jnp.clip(chunk_tile_row, 0, T - 1)
    rc = jnp.arange(chunk_tile_row.shape[0], dtype=jnp.int32)
    starts = istart[t] + (rc - row_base[t]) * mi[t]
    base_c = jnp.clip(
        col_base[t], 0, jnp.maximum(colmax - (mi[t] - 1) * span - 1, 0))
    # Per-row live column count (the compressed form's span live-count
    # source; kernels derive lcnt = clip(ncols - off*span, 0, span)).
    ncols = m_col[t]
    return (base_c.astype(jnp.int32), starts.astype(jnp.int32),
            ncols.astype(jnp.int32))
