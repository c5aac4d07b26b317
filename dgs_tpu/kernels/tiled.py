"""Pallas TPU kernels over the tile-binned acceleration structure.

The TPU analogue of the reference's per-tile render kernels
(forward.cu:88-166, backward.cu:27-106).  The CUDA design gives each spatial
tile a thread block that walks its dynamic [start,end) range of sorted
Gaussian IDs; here the (sample-block x entry-block) pair blocks that actually
need work are flattened into a **work list** - one grid step per real block
pair, scalar-prefetched - so the kernel grid carries no predicated-off slack
(the earlier rectangular sweep paid max-over-blocks iterations for every
block).  Pair validity inside a block is ``entry_tile == sample_tile`` - the
exact pairing the reference's binning produces (a Gaussian meets a sample iff
its 3-sigma rect covers the sample's tile).

IO is packed LANE-MAJOR everywhere (a (N, K*C) f32 array with K*C=24 is
physically padded to 128 lanes on TPU - the row-major orientation costs ~5x
its logical bandwidth on every read and write):

  * per-entry parameters ride in one lane-major ``geom`` array
    (D+tri+C, Ep): means rows, conic rows, value rows;
  * the forward writes one packed (K*C, Np) output (component-major rows) -
    its pair blocks are (entries, samples)-oriented so the output lands
    lane-major with no epilogue transpose;
  * the backward consumes the cotangent in both orientations (the h matmuls
    want (Np, K*C) rows, backward.cu:122; the value-gradient matmuls the
    lane-major (K*C, Np) - one outside transpose beats in-kernel
    transposed-lhs dots) and writes per-entry gradients into one packed
    (D+tri+C, Ep) array which the caller segment-sums by gaussian id - a
    deterministic replacement for the reference's atomicAdd scatter
    (backward.cu:121-152).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import tri_size
from ..binning.grid import BinningState
from ..ops import formulas
from .dense import _interpret, _pad_axis, _round_up


def total_unique(orders, D: int) -> int:
    """Unique (canonical) components across the fused orders - the kernels
    compute only i<=j<=k of the symmetric tensors; the public layer mirrors
    (see formulas.sym_indices)."""
    return sum(formulas.n_unique(o, D) for o in orders)


def n_params(D: int, C: int) -> int:
    """Rows of the packed per-entry parameter/gradient arrays."""
    return D + tri_size(D) + C


def prepare_entries(state: BinningState, means, values, conics, block_e: int,
                    period=None):
    """Entry-ordered packed parameters, padded to a block multiple.

    One row gather builds (Ep, D+tri+C); the transpose is the lane-major
    ``geom`` consumed by both kernels (mean rows, conic rows, value rows -
    the value rows are the (C, BP) matmul operand of both directions).
    Shared by forward and backward (ops/sampling.py computes it once per
    custom_vjp forward and stows it in the residuals).

    With ``period`` set, each entry's mean is shifted to the periodic image
    its tile sees (mu' = mu - period * k from the binning's packed shift),
    so X = mu' - x equals the minimum-image displacement for every pair the
    binning pairs it with - letting the kernels skip the per-pair wrap when
    footprints are compact (cfg.unwrapped_kernels).  The shift is a no-op
    under the wrapped kernels (wrap is period-invariant), so it is always
    applied for periodic domains.

    Sentinel entries (gid == P) hit an appended zero row; they are also
    tile-masked in-kernel, so both forward and backward contributions vanish.
    """
    P, D = means.shape
    C = values.shape[1]
    tri = tri_size(D)
    E = state.num_entries
    Ep = _round_up(E, block_e)

    gid = _pad_axis(state.ent_gid, 0, Ep)
    gid = jnp.where(jnp.arange(Ep) >= E, P, gid)
    tile = _pad_axis(state.ent_tile, 1, Ep)
    tile = jnp.where(jnp.arange(Ep)[None, :] >= E, jnp.int32(2**30), tile)

    params = jnp.concatenate([means, conics, values], axis=1)  # (P, NPARAM)
    params = jnp.concatenate(
        [params, jnp.zeros((1, params.shape[1]), params.dtype)], 0
    )
    ent = params[gid]              # (Ep, NPARAM) - single row gather
    if period is not None:
        shift = _pad_axis(state.ent_shift, 0, Ep)
        k = jnp.stack(
            [((shift >> (2 * d)) & 3) - 1 for d in range(D)], axis=1
        ).astype(ent.dtype)        # (Ep, D)
        ent = ent.at[:, :D].add(-period * k)
    geom = ent.T                   # (NPARAM, Ep) lane-major
    return gid, tile, geom, Ep


def prepare_samples(state: BinningState, samples, block_n: int):
    N, D = samples.shape
    Np = _round_up(N, block_n)
    s_sorted = _pad_axis(state.s_sorted, 1, Np)  # sorted coords ride the sort
    s_tile = _pad_axis(state.s_tile, 1, Np)
    s_tile = jnp.where(jnp.arange(Np)[None, :] >= N, jnp.int32(2**30 + 1), s_tile)
    return s_sorted, s_tile, Np


def _tile_mask(s_tile_ref, ent_tile_ref):
    return (
        s_tile_ref[0, :][:, None] == ent_tile_ref[0, :][None, :]
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Work list
# ---------------------------------------------------------------------------


def work_list(base, nblk, colmax: int, cap: int):
    """Flatten per-row-block column sweeps into a static work-item list.

    ``base``/``nblk`` give each row block's sweep [base, base+nblk) over
    column blocks (binning.forward_geometry / backward_geometry, already
    padded to the kernel's row-block count).  Every row block emits at least
    one item (so its output block gets zero-initialized even when it has no
    work).  Items are ordered by row block, so the kernel's output index map
    is monotone and Pallas accumulates in VMEM between flushes.

    The kernels read the work list in one of two forms (their ``compressed``
    flag): per-item (aux, col) arrays (fastest index maps: one scalar read
    each), or - when the item count would overflow the 1MB scalar SMEM
    (COMPRESS_ABOVE, hit around 130k items, e.g. a 16M-sample single-chip
    shard) - per-item aux plus per-ROW (base, start) scalars with
    col = clip(base[row] + (w - start[row])) derived in the index maps
    (4 bytes per item instead of 8, at ~3% step cost).

    Returns (aux, col, base_c, starts, initialized, overflow):
      aux      (cap,) int32 = row * 4 + first * 2 + compute, where ``row`` is
        the item's row-block index, ``first`` flags its row block's first
        item (-> zero-init the output block), ``compute`` flags real work
      col      (cap,) int32 column-block index per work item
      base_c   (B,) int32 per-row first column block, pre-clipped so derived
        cols stay in [0, colmax)
      starts   (B,) int32 per-row first work-item index
      initialized (B,) bool per row block: its first item fit under ``cap``
        (rows of uninitialized blocks are garbage; callers must treat any
        overflow as invalid results)
      overflow () int32: work items beyond ``cap`` (0 => exact)
    """
    B = base.shape[0]
    nblk_eff = jnp.maximum(nblk, 1)
    offs = jnp.cumsum(nblk_eff)
    total = offs[-1]
    starts = (offs - nblk_eff).astype(jnp.int32)
    w = jnp.arange(cap, dtype=jnp.int32)
    # row[w] = which row block work item w belongs to.  starts is strictly
    # increasing (nblk_eff >= 1), so scatter block boundaries and prefix-sum
    # - much cheaper than searchsorted (XLA lowers that to a while loop).
    row = jnp.cumsum(
        jnp.zeros((cap,), jnp.int32)
        .at[starts[1:]].add(1, mode="drop")
    )
    row = jnp.clip(row, 0, B - 1)
    off = w - starts[row]
    live = w < total
    first = ((off == 0) & live).astype(jnp.int32)
    compute = ((off < nblk[row]) & live).astype(jnp.int32)
    col = jnp.clip(
        base[row] + jnp.minimum(off, jnp.maximum(nblk[row] - 1, 0)),
        0, colmax - 1,
    ).astype(jnp.int32)
    # Derived col = base_c[row] + (w - starts[row]) must stay in range even
    # for padded / non-compute items: clip the base so base + nblk_eff - 1
    # < colmax, and cap sentinel-tail offsets via the index maps' min.
    base_c = jnp.clip(
        base, 0, jnp.maximum(colmax - nblk_eff, 0)
    ).astype(jnp.int32)
    initialized = starts < cap
    overflow = jnp.maximum(total - cap, 0).astype(jnp.int32)
    aux = row * 4 + first * 2 + compute
    return aux, col, base_c, starts, initialized, overflow


# Work-item count above which the kernels switch to the compressed
# (per-row) work-list form to stay inside the ~1MB scalar SMEM.
COMPRESS_ABOVE = 120_000


def work_total(nblk) -> jnp.ndarray:
    """Work items needed for a (padded) nblk vector; compare against the
    static capacity for the overflow diagnostic."""
    return jnp.sum(jnp.maximum(nblk, 1))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _wl_forward_kernel(orders, period, D, C, n_prefetch, *refs):
    """Pair arrays are (BP entries, BN samples): entries ride the sublanes so
    the outputs land lane-major (K*C, BN) - a (N, K*C) layout would pad its
    24 columns to 128 lanes in HBM (5x physical traffic on every read and
    write of the packed outputs/cotangents)."""
    aux_ref = refs[0]
    (geom_ref, ent_tile_ref, samples_ref, s_tile_ref,
     out_ref) = refs[n_prefetch:]
    w = pl.program_id(0)
    a_w = aux_ref[w]

    @pl.when((a_w & 2) != 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        tri = tri_size(D)
        Xs = [
            formulas.wrap(
                geom_ref[d, :][:, None] - samples_ref[d, :][None, :], period
            )
            for d in range(D)
        ]
        con = [geom_ref[D + t, :][:, None] for t in range(tri)]
        G, a = formulas.power_terms(Xs, con)
        G = G * (
            ent_tile_ref[0, :][:, None] == s_tile_ref[0, :][None, :]
        ).astype(jnp.float32)
        values_t = geom_ref[D + tri:D + tri + C, :]  # (C, BP)
        accs = []
        for order in orders:
            for wgt in formulas.components_unique(order, Xs, con, G, a):
                # (C, BP) @ (BP, BN) on the MXU; fp32 accumulation
                # (config.h:20).
                accs.append(jnp.dot(values_t, wgt,
                                    preferred_element_type=jnp.float32))
        out_ref[...] += jnp.concatenate(accs, axis=0)  # (K*C, BN)


def tiled_forward(
    orders: Tuple[str, ...],
    period: Optional[float],
    D: int, C: int,
    wl,                    # (row, col, first, compute) from work_list
    ent,                   # prepare_entries product
    smp,                   # prepare_samples product
    *,
    block_n: int = 256,
    block_e: int = 512,
) -> jnp.ndarray:
    """Packed lane-major (K*C, Np) outputs in tile-sorted sample order.

    Row layout is component-major: rows [k*C, (k+1)*C) hold component k
    (components enumerate ``orders`` in sequence).  Columns of sample blocks
    whose work items overflowed the capacity are garbage - callers must
    treat any work-list overflow as invalid results.
    """
    aux, col, base_c, starts = wl
    gid, ent_tile, geom, Ep = ent
    s_sorted, s_tile, Np = smp
    K = total_unique(orders, D)
    NPARAM = n_params(D, C)
    tri = tri_size(D)
    cap = aux.shape[0]
    EB = Ep // block_e

    if cap > COMPRESS_ABOVE:
        nsp = 3
        operands = (aux, base_c, starts)

        def col_map(w, a, b, s):
            r = a[w] >> 2
            return (0, jnp.minimum(b[r] + (w - s[r]), EB - 1))

        def row_map(w, a, b, s):
            return (0, a[w] >> 2)
    else:
        nsp = 2
        operands = (aux, col)

        def col_map(w, a, c):
            return (0, c[w])

        def row_map(w, a, c):
            return (0, a[w] >> 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((NPARAM, block_e), col_map),
            pl.BlockSpec((1, block_e), col_map),
            pl.BlockSpec((D, block_n), row_map),
            pl.BlockSpec((1, block_n), row_map),
        ],
        out_specs=pl.BlockSpec((K * C, block_n), row_map),
    )

    return pl.pallas_call(
        functools.partial(_wl_forward_kernel, orders, period, D, C, nsp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K * C, Np), jnp.float32),
        interpret=_interpret(),
    )(*operands, geom, ent_tile, s_sorted, s_tile)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _wl_backward_kernel(orders, period, D, C, n_prefetch, *refs):
    aux_ref = refs[0]
    (geom_ref, ent_tile_ref, samples_ref, s_tile_ref,
     ct_ref, ct_t_ref, dent_ref) = refs[n_prefetch:]
    w = pl.program_id(0)
    tri = tri_size(D)
    a_w = aux_ref[w]

    @pl.when((a_w & 2) != 0)
    def _init():
        dent_ref[...] = jnp.zeros_like(dent_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        Xs = [
            formulas.wrap(
                geom_ref[d, :][None, :] - samples_ref[d, :][:, None], period
            )
            for d in range(D)
        ]
        con = [geom_ref[D + t, :][None, :] for t in range(tri)]
        G, a = formulas.power_terms(Xs, con)
        G = G * _tile_mask(s_tile_ref, ent_tile_ref)
        values_t = geom_ref[D + tri:D + tri + C, :]  # (C, BP)

        k0 = 0
        dvals = None
        all_hs, lap_polys, third_polys = [], None, None
        for order in orders:
            nk = formulas.n_unique(order, D)
            polys = formulas.component_polys(order, Xs, con, a)
            if order == "laplacian":
                lap_polys = polys
            elif order == "third":
                third_polys = polys
            for k in range(nk):
                g_nc = ct_ref[:, (k0 + k) * C:(k0 + k + 1) * C]   # (BN, C)
                # h[n,p] = sum_c g[n,c] * values[c,p]  (backward.cu:122)
                all_hs.append(jnp.dot(g_nc, values_t,
                                      preferred_element_type=jnp.float32))
                # dL/dvalues[c,p] += sum_n g[c,n] * W_k[n,p]
                g_t = ct_t_ref[(k0 + k) * C:(k0 + k + 1) * C, :]  # (C, BN)
                w_k = G if isinstance(polys[k], float) else G * polys[k]
                dv = jnp.dot(g_t, w_k,
                             preferred_element_type=jnp.float32)
                dvals = dv if dvals is None else dvals + dv
            k0 += nk
        # Collapsed closed form across ALL fused orders - one shared VJP
        # instead of per-component loops (formulas.vjp_params_fused).
        dmu_acc, dcon_acc = formulas.vjp_params_fused(
            orders, Xs, con, G, a, all_hs, lap_polys, third_polys
        )

        rows = (
            [jnp.sum(m, axis=0, keepdims=True) for m in dmu_acc]
            + [jnp.sum(ctn, axis=0, keepdims=True) for ctn in dcon_acc]
            + [dvals]
        )
        dent_ref[...] += jnp.concatenate(rows, axis=0)  # (NPARAM, BP)


def tiled_backward(
    orders: Tuple[str, ...],
    period: Optional[float],
    D: int, C: int,
    wl,                    # (aux=row*4+first*2+compute, col=sample block)
    ent, smp,
    ct,                    # (Np, K*C) packed cotangents, tile-sorted rows
    ct_t,                  # (K*C, Np) the same, lane-major
    *,
    block_n: int = 128,
    block_e: int = 256,
) -> jnp.ndarray:
    """Packed per-entry gradients (D+tri+C, Ep): means rows, conic rows,
    value rows.  The caller segment-sums by gaussian id (deterministic
    replacement for backward.cu's atomicAdd scatter); any work-list overflow
    means invalid results (callers check the diagnostics)."""
    aux, col, base_c, starts = wl
    gid, ent_tile, geom, Ep = ent
    s_sorted, s_tile, Np = smp
    K = total_unique(orders, D)
    NPARAM = n_params(D, C)
    tri = tri_size(D)
    cap = aux.shape[0]
    NB = Np // block_n

    if cap > COMPRESS_ABOVE:
        nsp = 3
        operands = (aux, base_c, starts)

        def _col(w, a, b, s):
            r = a[w] >> 2
            return jnp.minimum(b[r] + (w - s[r]), NB - 1)

        def col_map0(w, a, b, s):
            return (0, _col(w, a, b, s))

        def col_map_r(w, a, b, s):
            return (_col(w, a, b, s), 0)

        def row_map(w, a, b, s):
            return (0, a[w] >> 2)
    else:
        nsp = 2
        operands = (aux, col)

        def col_map0(w, a, c):
            return (0, c[w])

        def col_map_r(w, a, c):
            return (c[w], 0)

        def row_map(w, a, c):
            return (0, a[w] >> 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((NPARAM, block_e), row_map),
            pl.BlockSpec((1, block_e), row_map),
            pl.BlockSpec((D, block_n), col_map0),
            pl.BlockSpec((1, block_n), col_map0),
            pl.BlockSpec((block_n, K * C), col_map_r),
            pl.BlockSpec((K * C, block_n), col_map0),
        ],
        out_specs=pl.BlockSpec((NPARAM, block_e), row_map),
    )

    return pl.pallas_call(
        functools.partial(_wl_backward_kernel, orders, period, D, C, nsp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NPARAM, Ep), jnp.float32),
        interpret=_interpret(),
    )(*operands, geom, ent_tile, s_sorted, s_tile, ct, ct_t)
