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

# Perf-ablation hook (tools only; static at trace time): comma list of
# kernel pieces to skip when decomposing kernel time on-chip.
# Pieces: "dvals" (value-gradient dots), "h" (cotangent h chains),
# "vjp" (per-pair parameter VJP).  Results are WRONG under any ablation.
import os as _os
_ABLATE = set(filter(None, _os.environ.get("DGS_ABLATE", "").split(",")))


def total_unique(orders, D: int) -> int:
    """Unique (canonical) components across the fused orders - the kernels
    compute only i<=j<=k of the symmetric tensors; the public layer mirrors
    (see formulas.sym_indices)."""
    return sum(formulas.n_unique(o, D) for o in orders)


def n_params(D: int, C: int) -> int:
    """Rows of the packed per-entry parameter/gradient arrays."""
    return D + tri_size(D) + C


def sep_rows(D: int) -> int:
    """Extra geom rows carried by the separable kernels: u (1), b = C mu_l
    (D), and D a-coefficient groups [b_d, -c_d0..-c_dD-1] of 1+D rows."""
    return 1 + D + D * (1 + D)


def mono_rows(D: int) -> int:
    """Rows of the per-sample monomial matrix: [1, x_l (D),
    -w_t/2 * x_i x_j (tri)] with off-diagonal weight 2."""
    return 1 + D + tri_size(D)


def folded_geom(cfg, ent, tile, D: int, C: int, orders, fold_meta,
                vjp: bool = False):
    """Folded-values entry operands: tile-local geom with alpha rows plus
    the separate (A*C, Ep) fold array (the forward's single-dot lhs).

    geom rows: [tile(1), mu_l(D), con(tri), values(C), alpha(A)] - the
    forward reads only the [tile, mu_l, con] prefix (+ the fold operand),
    the backward the full array (values feed the h chains, alpha the folded
    dvalues recombination).  Sentinel entries' garbage tile centers are
    harmless: their gid hits the zero parameter row and the tile row (-1.0)
    masks every pair."""
    from ..binning import grid as binning

    centers = binning.tile_centers(cfg, tile.reshape(-1), D)   # (Ep, D)
    ent_local = ent.at[:, :D].set(ent[:, :D] - centers)
    alpha, fold, foldw = build_folded(orders, D, C, ent_local, fold_meta,
                                      vjp=vjp)
    geom = jnp.concatenate(
        [entry_tile_row(tile), ent_local.T, alpha], axis=0)
    return geom, fold, foldw


def prepare_entries(state: BinningState, means, values, conics, block_e: int,
                    cfg=None, separable: bool = False,
                    folded=None, fold_meta=None, folded_vjp: bool = False):
    """Entry-ordered packed parameters, padded to a block multiple.

    One row gather builds (Ep, D+tri+C); the transpose is the lane-major
    ``geom`` consumed by both kernels (mean rows, conic rows, value rows -
    the value rows are the (C, BP) matmul operand of both directions).
    Shared by forward and backward (ops/sampling.py computes it once per
    custom_vjp forward and stows it in the residuals).

    For a periodic config, each entry's mean is shifted to the periodic image
    its tile sees (mu' = mu - period * k), so X = mu' - x equals the
    minimum-image displacement for every pair the binning pairs it with -
    letting the kernels skip the per-pair wrap when footprints are compact
    (cfg.unwrapped_kernels).  The shift is a no-op under the wrapped kernels
    (wrap is period-invariant), so it is always applied for periodic domains.
    Which image an entry is (k_d) is recomputed from (tile, rect lo) - the
    rect lo rows ride the SAME row gather as the parameters (rows are
    lane-padded to 128 in HBM, so the extra D columns are free), which is
    cheaper than carrying a shift payload through the binning's entry sort.

    Sentinel entries (gid == P) hit an appended zero row; they are also
    tile-masked in-kernel, so both forward and backward contributions vanish
    (their garbage shift is harmless).

    Row 0 of ``geom`` is the entry's tile id as f32 (-1.0 on pad slots):
    the kernels mask pairs by comparing it against the sample operand's
    tile row, so the tile ids ride the SAME DMA as the parameters instead
    of a separate (1, block) operand per sub-block (DMA issue is the bulk
    of the fixed per-work-item cost).  Exact while tile counts stay below
    2^24 (f32 integer range); sample pads use -2.0 so pads never pair.
    """
    from ..binning import grid as binning

    P, D = means.shape
    C = values.shape[1]
    tri = tri_size(D)
    E = state.num_entries
    Ep = _round_up(E, block_e)

    gid = _pad_axis(state.ent_gid, 0, Ep)
    gid = jnp.where(jnp.arange(Ep) >= E, P, gid)
    tile = _pad_axis(state.ent_tile, 1, Ep)
    tile = jnp.where(jnp.arange(Ep)[None, :] >= E, jnp.int32(2**30), tile)

    period = None if cfg is None else cfg.period
    params = jnp.concatenate([means, conics, values], axis=1)  # (P, NPARAM)
    if period is not None:
        # The rect is binning structure, not a differentiable quantity (floor
        # has zero gradient; radii would otherwise leak the outer
        # linearization's tangents into the custom_vjp closure).
        lo, _ = binning.gaussian_rects(
            cfg.with_dims(D), jax.lax.stop_gradient(means),
            jax.lax.stop_gradient(state.radii))
        params = jnp.concatenate([params, lo.astype(params.dtype)], axis=1)
    params = jnp.concatenate(
        [params, jnp.zeros((1, params.shape[1]), params.dtype)], 0
    )
    ent = params[gid]              # (Ep, NPARAM[+D]) - single row gather
    if period is not None:
        k = binning.image_shift(cfg.with_dims(D), tile, ent[:, D + tri + C:])
        ent = ent[:, :D + tri + C].at[:, :D].add(-period * k.astype(ent.dtype))
    if folded is not None:
        geom, fold, foldw = folded_geom(cfg.with_dims(D), ent, tile, D, C,
                                        folded, fold_meta, vjp=folded_vjp)
        return gid, tile, geom, Ep, fold, foldw
    if separable:
        ent = separable_extend(cfg.with_dims(D), ent, tile, D)
    tile_f = entry_tile_row(tile)
    # (1 + NPARAM[+sep_rows], Ep) lane-major; row 0 is the tile row.
    geom = jnp.concatenate([tile_f, ent.T], axis=0)
    return gid, tile, geom, Ep, None


def entry_tile_row(tile) -> jnp.ndarray:
    """(1, E) f32 tile row for the entry-side operand: valid tile ids pass
    through exactly (tiles < 2^24), pad slots (tile >= 2^30) become -1.0 so
    they can never equal a sample tile (sample pads are -2.0)."""
    t = tile.reshape(1, -1)
    return jnp.where(t >= jnp.int32(2**30), -1.0, t.astype(jnp.float32))


def sample_tile_row(tile) -> jnp.ndarray:
    """(1, N) f32 tile row for the sample-side operand (pads -> -2.0)."""
    t = tile.reshape(1, -1)
    return jnp.where(t >= jnp.int32(2**30), -2.0, t.astype(jnp.float32))


def separable_extend(cfg, ent, tile, D: int):
    """Tile-local separable rows (see _wl_forward_kernel): the mean columns
    of ``ent`` (rows [means, conics, ...rest]) become mu_l = mu' -
    tile_center, and [u, b, acoef] columns are appended so the kernels
    evaluate power and a = C X on the MXU instead of per-pair VPU chains.
    Exact only when X never needs the per-pair torus wrap (unwrapped/open
    configs - the callers gate on that)."""
    from ..binning import grid as binning
    from ..config import tri_index

    tri = tri_size(D)
    centers = binning.tile_centers(cfg, tile.reshape(-1), D)   # (Ep, D)
    mu_l = ent[:, :D] - centers
    conr = [ent[:, D + t] for t in range(tri)]
    b = [
        sum(conr[tri_index(D, d, m)] * mu_l[:, m] for m in range(D))
        for d in range(D)
    ]
    u = -0.5 * sum(b[d] * mu_l[:, d] for d in range(D))
    acoef = []
    for d in range(D):
        acoef.append(b[d])
        acoef.extend(-conr[tri_index(D, d, m)] for m in range(D))
    extra = jnp.stack([u] + b + acoef, axis=1)
    return jnp.concatenate([ent.at[:, :D].set(mu_l), extra], axis=1)


def sample_monomials(cfg, s_coords, s_tile, D: int):
    """The separable kernels' per-sample matrix (mono_rows(D), Np):
    [1, x_l, -w_t/2 * x_l,i x_l,j] in tile-local coordinates; columns with
    out-of-grid (sentinel) tiles are zeroed."""
    from ..binning import grid as binning

    T = binning.num_tiles(cfg, D)
    Np = s_coords.shape[1]
    centers = binning.tile_centers(cfg, s_tile.reshape(-1), D)  # (Np, D)
    valid = (s_tile.reshape(-1) < T)[None, :]
    xl = jnp.where(valid, s_coords - centers.T, 0.0)            # (D, Np)
    q = []
    for i in range(D):
        for j in range(i, D):
            w = -0.5 if i == j else -1.0
            q.append(w * (xl[i] * xl[j]))
    return jnp.concatenate(
        [jnp.ones((1, Np), jnp.float32), xl, jnp.stack(q, axis=0)], axis=0
    )


def sample_monomials_raw(cfg, s_coords, s_tile, D: int, deg: int):
    """Raw monomial matrix of the folded-values kernels: rows follow
    formulas.monomials_upto(D, deg) ([1, x_l, x_i x_j, x_i x_j x_k] in
    tile-local coordinates), invalid (sentinel-tile) columns zeroed in the
    x rows so every product stays finite.  The degree-1 rows sit at 1..D -
    the kernels read tile-local x from them (no separate coords operand)."""
    from ..binning import grid as binning
    from ..ops import formulas

    T = binning.num_tiles(cfg, D)
    Np = s_coords.shape[1]
    centers = binning.tile_centers(cfg, s_tile.reshape(-1), D)  # (Np, D)
    valid = (s_tile.reshape(-1) < T)[None, :]
    xl = jnp.where(valid, s_coords - centers.T, 0.0)            # (D, Np)
    rows = []
    for e in formulas.monomials_upto(D, deg):
        if sum(e) == 0:
            rows.append(jnp.ones((1, Np), jnp.float32))
            continue
        r = None
        for d, p in enumerate(e):
            for _ in range(p):
                r = xl[d] if r is None else r * xl[d]
        rows.append(r[None, :])
    return jnp.concatenate(rows, axis=0)


def fold_rows(fold_meta, C: int):
    """(dense row count R, 8-padded row count R8) of the folded layout."""
    R = C * sum(len(m) for m in fold_meta)
    return R, _round_up(R, 8)


def fold_row_table(fold_meta, C: int):
    """(comp k, basis-monomial index m) -> first (c=0) row in the folded
    (k, i, c) row layout (fold / ct_beta / Zd rows)."""
    table = {}
    off = 0
    for k, mrows in enumerate(fold_meta):
        for m in mrows:
            table[(k, m)] = off
            off += C
    return table


def _pad_rows8(x, mult: int = 8):
    # The folded-VJP mode pads the folded row dimension to a full lane
    # multiple (128): it rides as the LANE axis of the transposed
    # beta-expanded cotangent blocks, and sub-128 lane dims lower terribly.
    return _pad_axis(x, 0, _round_up(x.shape[0], mult))


def build_folded(orders, D: int, C: int, ent_local, fold_meta,
                 vjp: bool = False):
    """Per-entry rows of the folded-values scheme (formulas
    .component_coeff_polys): returns (alpha (A, Ep), fold (R8, Ep),
    foldw (D*R8, Ep) or None).

    ``ent_local`` is the (Ep, NPARAM) entry-parameter array with TILE-LOCAL
    means (rows [mu_l, con, values]); alpha rows are the component
    polynomials' monomial coefficients in (component-major, basis-sorted)
    order matching ``fold_meta`` (formulas.folded_structure), and
    fold[(k,i)*C + c] = values[c] * alpha[(k,i)] - the lhs of the kernels'
    single G contraction (zero-padded to a sublane multiple so the
    backward's per-l foldw slices stay aligned).

    With ``vjp`` the W-accumulator coefficient rows ride along:
    foldw[l*R8 + row(k,i,c)] = values[c] * W_l-coeff(k, monomial i)
    (formulas.w_coeff_polys) - the rhs of the backward's W dots."""
    from ..ops import formulas

    tri = tri_size(D)
    Ep = ent_local.shape[0]
    mu = [ent_local[:, d] for d in range(D)]
    con = [ent_local[:, D + t] for t in range(tri)]
    values_t = ent_local[:, D + tri:D + tri + C].T       # (C, Ep)
    polys = formulas.component_coeff_polys(orders, D, mu, con)
    deg = max(formulas.ORDER_DEGREE[o] for o in orders)
    basis = formulas.monomials_upto(D, deg)

    def row(c):
        return (jnp.full((Ep,), c, jnp.float32)
                if not hasattr(c, "shape") else c)

    rows = []
    for p, mrows in zip(polys, fold_meta):
        for m in mrows:
            rows.append(row(p[basis[m]]))
    alpha = jnp.stack(rows, axis=0)                      # (A, Ep)
    mult = 128 if vjp else 8
    fold = _pad_rows8(
        (alpha[:, None, :] * values_t[None, :, :]).reshape(-1, Ep), mult)
    foldw = None
    if vjp:
        table = fold_row_table(fold_meta, C)
        wps = formulas.w_coeff_polys(orders, D, mu, con)
        zero = jnp.zeros((Ep,), jnp.float32)
        wrows = []
        for l in range(D):
            acoef = [dict() for _ in range(len(fold_meta))]
            for (k, e), c in wps[l].items():
                acoef[k][e] = c
            arows = []
            for k, mrows in zip(range(len(fold_meta)), fold_meta):
                for m in mrows:
                    c = acoef[k].get(basis[m])
                    arows.append(zero if c is None else row(c))
            aw = jnp.stack(arows, axis=0)                # (A, Ep)
            wl = (aw[:, None, :] * values_t[None, :, :]).reshape(-1, Ep)
            wrows.append(_pad_rows8(wl, mult))
        foldw = jnp.concatenate(wrows, axis=0)           # (D*R8, Ep)
    return alpha, fold, foldw


def prepare_samples(state: BinningState, samples, block_n: int,
                    cfg=None, separable: bool = False,
                    folded_deg: Optional[int] = None):
    """Padded tile-sorted sample coordinates (+ the separable kernels' tile-
    local monomial matrix; parameter-independent, so hoistable with the
    sample binning).  Returns (s_sorted, s_tile, Np, mono-or-None); row 0 of
    both s_sorted and mono is the f32 sample tile row (see prepare_entries -
    the mask rides the parameter DMA)."""
    from ..binning import grid as binning

    N, D = samples.shape
    Np = _round_up(N, block_n)
    s_sorted = _pad_axis(state.s_sorted, 1, Np)  # sorted coords ride the sort
    s_tile = _pad_axis(state.s_tile, 1, Np)
    s_tile = jnp.where(jnp.arange(Np)[None, :] >= N, jnp.int32(2**30 + 1), s_tile)
    tile_f = sample_tile_row(s_tile)
    mono = None
    if folded_deg is not None:
        # Raw monomial basis for the folded-values kernels (tile row LAST,
        # as below).
        mono = jnp.concatenate(
            [sample_monomials_raw(cfg.with_dims(D), s_sorted, s_tile, D,
                                  folded_deg), tile_f], axis=0)
    elif separable:
        # Tile row LAST: the monomial rows keep their sublane-aligned
        # offsets for the moment/separable contractions (an offset slice
        # forces a per-vreg sublane shift).
        mono = jnp.concatenate(
            [sample_monomials(cfg.with_dims(D), s_sorted, s_tile, D),
             tile_f], axis=0)
    s_sorted = jnp.concatenate([s_sorted, tile_f], axis=0)
    return s_sorted, s_tile, Np, mono


def _tile_mask(s_tile_ref, ent_tile_ref):
    return (
        s_tile_ref[0, :][:, None] == ent_tile_ref[0, :][None, :]
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Work list
# ---------------------------------------------------------------------------


def work_list(base, nblk, colmax: int, cap: int, span: int = 1):
    """Flatten per-row-block column sweeps into a static work-item list.

    ``base``/``nblk`` give each row block's sweep [base, base+nblk) over
    column blocks (binning.forward_geometry / backward_geometry, already
    padded to the kernel's row-block count).  Every row block emits at least
    one item (so its output block gets zero-initialized even when it has no
    work).  Items are ordered by row block, so the kernel's output index map
    is monotone and Pallas accumulates in VMEM between flushes.

    ``span`` packs that many CONSECUTIVE column blocks into one work item
    (the kernel carries one operand ref per sub-block and loops over the
    live ones): ceil(nblk/span) items per row instead of nblk, amortizing
    the fixed per-grid-step cost (~200 ns/item measured on-chip,
    tools/bench_item_overhead.py) over span column blocks.  The DMA count
    is unchanged (span refs per item); only the grid steps shrink.

    The kernels read the work list in one of two forms (their ``compressed``
    flag): per-item (aux, col) arrays (fastest index maps: one scalar read
    each), or - when the item count would overflow the 1MB scalar SMEM
    (COMPRESS_ABOVE, hit around 130k items, e.g. a 16M-sample single-chip
    shard) - per-item aux plus per-ROW (base, start) scalars with
    col = clip(base[row] + (w - start[row]) * span) derived in the index
    maps (4 bytes per item instead of 8, at ~3% step cost).  With span > 1
    a per-item live-count vector rides along in both forms.

    Returns (aux, col, base_c, starts, lcnt, initialized, overflow):
      aux      (cap,) int32 = row * 4 + first * 2 + compute, where ``row`` is
        the item's row-block index, ``first`` flags its row block's first
        item (-> zero-init the output block), ``compute`` flags real work
      col      (cap,) int32 FIRST column-block index per work item (the
        item's sub-blocks cover [col, col + live))
      base_c   (B,) int32 per-row first column block, pre-clipped so derived
        cols stay in [0, colmax)
      starts   (B,) int32 per-row first work-item index
      lcnt     (cap,) int32 live sub-blocks per item, in [0, span]
      initialized (B,) bool per row block: its first item fit under ``cap``
        (rows of uninitialized blocks are garbage; callers must treat any
        overflow as invalid results)
      overflow () int32: work items beyond ``cap`` (0 => exact)
    """
    B = base.shape[0]
    n_items = jnp.maximum(-(-nblk // span), 1)
    offs = jnp.cumsum(n_items)
    total = offs[-1]
    starts = (offs - n_items).astype(jnp.int32)
    w = jnp.arange(cap, dtype=jnp.int32)
    # row[w] = which row block work item w belongs to.  starts is strictly
    # increasing (n_items >= 1), so scatter block boundaries and prefix-sum
    # - much cheaper than searchsorted (XLA lowers that to a while loop).
    row = jnp.cumsum(
        jnp.zeros((cap,), jnp.int32)
        .at[starts[1:]].add(1, mode="drop")
    )
    row = jnp.clip(row, 0, B - 1)
    off = (w - starts[row]) * span
    live = w < total
    first = ((off == 0) & live).astype(jnp.int32)
    lcnt = jnp.where(live, jnp.clip(nblk[row] - off, 0, span), 0
                     ).astype(jnp.int32)
    compute = (lcnt > 0).astype(jnp.int32)
    col = jnp.clip(
        base[row] + jnp.minimum(off, jnp.maximum(nblk[row] - 1, 0)),
        0, colmax - 1,
    ).astype(jnp.int32)
    # Derived col = base_c[row] + (w - starts[row]) * span must stay in
    # range even for padded / non-compute items: clip the base so
    # base + (n_items - 1) * span < colmax, and cap sentinel-tail offsets
    # via the index maps' min.
    base_c = jnp.clip(
        base, 0, jnp.maximum(colmax - (n_items - 1) * span - 1, 0)
    ).astype(jnp.int32)
    initialized = starts < cap
    overflow = jnp.maximum(total - cap, 0).astype(jnp.int32)
    aux = row * 4 + first * 2 + compute
    return aux, col, base_c, starts, lcnt, initialized, overflow


# Work-item count above which the kernels switch to the compressed
# (per-row) work-list form to stay inside the ~1MB scalar SMEM.
COMPRESS_ABOVE = 120_000

# PSD-mask tolerance for the separable (MXU-evaluated) power: absorbs the
# contraction's roundoff so the forward mask agrees with the backward's
# per-pair evaluation (see _wl_forward_kernel).
PSD_TOL = 1e-5


def work_total(nblk, span: int = 1) -> jnp.ndarray:
    """Work items needed for a (padded) nblk vector at the given span;
    compare against the static capacity for the overflow diagnostic."""
    return jnp.sum(jnp.maximum(-(-nblk // span), 1))


def span_capacity(cap: int, n_rows: int, span: int) -> int:
    """Safe static item capacity for a span-packed list given a span=1
    capacity ``cap`` >= total: sum(ceil(n/span)) <= (total + (span-1) *
    rows) / span."""
    if span == 1:
        return cap
    return max(-(-(cap + (span - 1) * n_rows) // span), n_rows)


def _use_compressed(cap: int, span: int) -> bool:
    """Switch to the compressed work-list form when the per-item scalars
    would crowd the ~1MB SMEM: the uncompressed form carries 8 bytes/item
    (aux, col) at span=1 and 12 (aux, col, lcnt) at span>1; compressed
    carries 4 (aux) plus per-ROW scalars."""
    return cap * (12 if span > 1 else 8) > 8 * COMPRESS_ABOVE


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _dot0(lhs, rhs, precision=jax.lax.Precision.HIGHEST):
    """(k, A) x (k, B) -> (A, B), contracting the leading (sublane) axis of
    both operands on the MXU."""
    return jax.lax.dot_general(
        lhs, rhs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def dot_precision(cfg) -> jax.lax.Precision:
    """Kernel matmul precision: fp32-class (HIGHEST; Mosaic only lowers
    DEFAULT/HIGHEST) unless the documented fast-math knob is on.  DEFAULT
    runs one bf16 MXU pass (~0.4% relative noise in every kernel dot) -
    outputs do NOT meet the fp32-allclose gate; the on-chip smoke suite
    refuses it unless explicitly requested (round-4 PRECISION FINDING,
    BASELINE.md)."""
    if getattr(cfg, "fast_math_dots", False):
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _separable_G_a(geom_ref, mono_ref, D, C, flip,
                   precision=jax.lax.Precision.HIGHEST):
    """MXU evaluation of the pair quadratic form and a = C X.

    With tile-local coordinates (prepare_entries/prepare_samples):
      power = u + b.x_l - 1/2 x_l^T C x_l = [u, b, c] . [1, x_l, q(x_l)]
      a_d   = b_d - (C x_l)_d           = [b_d, -c_d*] . [1, x_l]
    i.e. one (1+D+tri)-deep and D (1+D)-deep MXU contractions replace the
    per-pair VPU chains of power_terms.  ``flip`` selects the (BN, BP)
    backward orientation.  Returns (power, a) WITHOUT the PSD mask.

    Row 0 of the geom operand is its tile row (prepare_entries), so every
    geom row sits one below its logical index; the monomial operand keeps
    its rows at their aligned offsets (its tile row rides LAST).
    """
    tri = tri_size(D)
    MP = 1 + D
    NP0 = 1 + D + tri + C
    M1 = mono_ref[0:MP, :]
    M2 = mono_ref[MP:MP + tri, :]
    ub = geom_ref[NP0:NP0 + MP, :]
    conr = geom_ref[1 + D:1 + D + tri, :]
    if flip:
        power = (_dot0(M1, ub, precision)
                 + _dot0(M2, conr, precision))
        a = [
            _dot0(M1, geom_ref[NP0 + MP * (1 + d):NP0 + MP * (2 + d), :],
                  precision)
            for d in range(D)
        ]
    else:
        power = (_dot0(ub, M1, precision)
                 + _dot0(conr, M2, precision))
        a = [
            _dot0(geom_ref[NP0 + MP * (1 + d):NP0 + MP * (2 + d), :], M1,
                  precision)
            for d in range(D)
        ]
    return power, a


def _wl_forward_kernel(orders, period, D, C, separable, tile_local, span,
                       compressed, n_prefetch, folded, n_mono, precision,
                       *refs):
    """Pair arrays are (BP entries, BN samples): entries ride the sublanes so
    the outputs land lane-major (K*C, BN) - a (N, K*C) layout would pad its
    24 columns to 128 lanes in HBM (5x physical traffic on every read and
    write of the packed outputs/cotangents).

    In separable mode the samples operand is the monomial matrix
    (mono_rows(D), BN) and power/a come off the MXU (_separable_G_a); the
    component weights and value matmuls are unchanged (they only need
    (con, G, a)).

    With ``span`` > 1 one grid step owns span consecutive entry blocks (one
    geom ref per sub-block); the per-item live count gates each sub-block's
    compute.  Row 0 of the geom and sample operands is the f32 tile row
    (prepare_entries / prepare_samples) - the pair mask rides the parameter
    DMAs instead of separate (1, block) operands.

    Live-count source at span > 1: per-item ``lcnt`` scalars in the
    uncompressed form; derived from the per-ROW (starts, nblk) scalars in
    the compressed form (12 bytes/item would crowd SMEM)."""
    aux_ref = refs[0]
    rest = refs[n_prefetch:]
    geom_refs = rest[0:span]
    if folded is not None:
        fold_refs = rest[span:2 * span]
        samples_ref = rest[2 * span]
        out_ref = rest[2 * span + 1]
    else:
        fold_refs = [None] * span
        samples_ref = rest[span]
        out_ref = rest[span + 1]
    w = pl.program_id(0)
    a_w = aux_ref[w]

    @pl.when((a_w & 2) != 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def _compute_folded(geom_ref, fold_ref):
        # Folded-values form: ONE (R, BP) @ (BP, BN) dot whose rhs is the
        # masked G alone (per-entry coefficient x values rows carry all the
        # component/polynomial structure - formulas.component_coeff_polys),
        # then a cheap per-component monomial recombination on the VPU.
        # Replaces K thin value dots AND the per-pair polynomial
        # materialization; the multi-pass precision premium is paid once.
        tri = tri_size(D)
        con = [geom_ref[1 + D + t, :][:, None] for t in range(tri)]
        Xs = [
            geom_ref[1 + d, :][:, None] - samples_ref[1 + d, :][None, :]
            for d in range(D)
        ]
        G, _ = formulas.power_terms(Xs, con)
        G = G * (
            geom_ref[0, :][:, None] == samples_ref[n_mono, :][None, :]
        ).astype(jnp.float32)
        Z = jnp.dot(fold_ref[...], G,
                    preferred_element_type=jnp.float32,
                    precision=precision)              # (R, BN)
        off = 0
        accs = []
        for mrows in folded:
            acc = None
            for m in mrows:
                slab = Z[off:off + C, :]
                t = slab if m == 0 else slab * samples_ref[m, :][None, :]
                acc = t if acc is None else acc + t
                off += C
            accs.append(acc)
        out_ref[...] += jnp.concatenate(accs, axis=0)  # (K*C, BN)

    def _compute_one(geom_ref, fold_ref=None):
        if folded is not None:
            _compute_folded(geom_ref, fold_ref)
            return
        tri = tri_size(D)
        con = [geom_ref[1 + D + t, :][:, None] for t in range(tri)]
        if separable:
            power, a = _separable_G_a(geom_ref, samples_ref, D, C,
                                      flip=False, precision=precision)
            # The MXU-evaluated power has entry-scale cancellation: a pair
            # with X ~ 0 (G ~ 1, the largest contribution) can see power go
            # spuriously positive by ~1e-6 roundoff where the backward's
            # per-pair form (no cancellation) keeps it.  Mask with a small
            # positive tolerance so forward and backward agree; genuinely
            # non-PSD pairs have power >> tolerance and are still culled.
            G = jnp.where(power > PSD_TOL, 0.0,
                          jnp.exp(jnp.minimum(power, 0.0)))
            Xs = [None] * D
        elif tile_local:
            # The samples operand is the monomial matrix (moment-form
            # backward prep): xl rides rows [1, 1+D) and geom means are
            # tile-local, so X = mu_l - xl wrap-free on the VPU.
            Xs = [
                geom_ref[1 + d, :][:, None] - samples_ref[1 + d, :][None, :]
                for d in range(D)
            ]
            G, a = formulas.power_terms(Xs, con)
        else:
            Xs = [
                formulas.wrap(
                    geom_ref[1 + d, :][:, None]
                    - samples_ref[d, :][None, :],
                    period,
                )
                for d in range(D)
            ]
            G, a = formulas.power_terms(Xs, con)
        # Pair mask: geom tile row (row 0) vs the sample operand's tile row
        # (LAST: index mono_rows for the monomial operand, D for coords).
        srow_t = mono_rows(D) if (separable or tile_local) else D
        G = G * (
            geom_ref[0, :][:, None] == samples_ref[srow_t, :][None, :]
        ).astype(jnp.float32)
        values_t = geom_ref[1 + D + tri:1 + D + tri + C, :]  # (C, BP)
        accs = []
        for order in orders:
            if "fpolys" in _ABLATE:
                comps = [G] * formulas.n_unique(order, D)
            else:
                comps = formulas.components_unique(order, Xs, con, G, a)
            for wgt in comps:
                if "fdots" in _ABLATE:
                    accs.append(wgt[0:C, :] if wgt.shape[0] >= C
                                else jnp.broadcast_to(wgt[0:1, :],
                                                      (C, wgt.shape[1])))
                    continue
                # (C, BP) @ (BP, BN) on the MXU; fp32 accumulation
                # (config.h:20).
                accs.append(jnp.dot(values_t, wgt,
                                    preferred_element_type=jnp.float32,
                                    precision=precision))
        out_ref[...] += jnp.concatenate(accs, axis=0)  # (K*C, BN)

    if span == 1:
        @pl.when((a_w & 1) != 0)
        def _compute():
            _compute_one(geom_refs[0], fold_refs[0])
    else:
        if compressed:
            r = a_w >> 2
            lc = jnp.clip(refs[3][r] - (w - refs[2][r]) * span, 0, span)
        else:
            lc = refs[2][w]
        for m in range(span):
            @pl.when(m < lc)
            def _compute_m(m=m):
                _compute_one(geom_refs[m], fold_refs[m])


def tiled_forward(
    orders: Tuple[str, ...],
    period: Optional[float],
    D: int, C: int,
    wl,                    # (row, col, first, compute) from work_list
    ent,                   # prepare_entries product
    smp,                   # (coords-or-mono, s_tile, Np)
    *,
    block_n: int = 256,
    block_e: int = 512,
    separable: bool = False,
    tile_local: bool = False,
    span: int = 1,
    folded=None,
    n_mono: int = 0,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Packed lane-major (K*C, Np) outputs in tile-sorted sample order.

    Row layout is component-major: rows [k*C, (k+1)*C) hold component k
    (components enumerate ``orders`` in sequence).  Columns of sample blocks
    whose work items overflowed the capacity are garbage - callers must
    treat any work-list overflow as invalid results.

    ``span`` packs that many consecutive entry blocks per work item (the
    work list must be built with the same span); ``wl`` carries the per-row
    nblk vector as its 6th element (compressed live-count derivation).
    """
    aux, col, base_c, starts, lcnt, nblk = wl
    gid, ent_tile, geom, Ep = ent[:4]
    fold = ent[4] if len(ent) > 4 else None
    s_sorted, s_tile, Np = smp
    K = total_unique(orders, D)
    # The geom operand carries its f32 tile row at row 0 (+1 row); the
    # sample operand carries its tile row LAST (monomial rows keep their
    # aligned offsets), so SROWS spans through that last row.
    if folded is not None:
        # The folded forward reads only the [tile, mu_l, con] geom prefix
        # (values/alpha rows are backward-only); the fold array is its own
        # operand.  Raw monomial sample operand, tile row LAST.
        def _pref(want, full):
            blk = _round_up(want, 8)
            return blk if blk < full else full
        NPARAM = _pref(1 + D + tri_size(D), geom.shape[0])
        SROWS = n_mono + 1
    elif separable:
        NPARAM = 1 + n_params(D, C) + sep_rows(D)
        SROWS = mono_rows(D) + 1
    elif tile_local:
        # Separable-extended geom, per-pair VPU math: read only the base
        # parameter rows; the sample operand must span to its LAST (tile)
        # row, so the monomial prefix saving does not apply here.
        def _pref(want, full):
            blk = _round_up(want, 8)
            return blk if blk < full else full
        NPARAM = _pref(1 + n_params(D, C),
                       1 + n_params(D, C) + sep_rows(D))
        SROWS = mono_rows(D) + 1
    else:
        NPARAM = 1 + n_params(D, C)
        SROWS = 1 + D
    tri = tri_size(D)
    cap = aux.shape[0]
    EB = Ep // block_e

    compressed = _use_compressed(cap, span)
    if compressed:
        operands = (aux, base_c, starts)
        if span > 1:
            operands = operands + (nblk,)

        def col_map_m(m):
            def col_map(w, a, b, s, *l):
                r = a[w] >> 2
                return (0, jnp.minimum(b[r] + (w - s[r]) * span + m, EB - 1))
            return col_map

        def row_map(w, a, b, s, *l):
            return (0, a[w] >> 2)
    else:
        operands = (aux, col)
        if span > 1:
            operands = operands + (lcnt,)

        def col_map_m(m):
            def col_map(w, a, c, *l):
                return (0, jnp.minimum(c[w] + m, EB - 1))
            return col_map

        def row_map(w, a, c, *l):
            return (0, a[w] >> 2)

    nsp = len(operands)

    fold_specs, fold_ops = [], []
    if folded is not None:
        fold_specs = [pl.BlockSpec((fold.shape[0], block_e), col_map_m(m))
                      for m in range(span)]
        fold_ops = [fold] * span

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(cap,),
        in_specs=(
            [pl.BlockSpec((NPARAM, block_e), col_map_m(m))
             for m in range(span)]
            + fold_specs
            + [pl.BlockSpec((SROWS, block_n), row_map)]
        ),
        out_specs=pl.BlockSpec((K * C, block_n), row_map),
    )

    return pl.pallas_call(
        functools.partial(_wl_forward_kernel, orders, period, D, C,
                          separable, tile_local, span, compressed, nsp,
                          folded, n_mono, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K * C, Np), jnp.float32),
        interpret=_interpret(),
    )(*operands, *([geom] * span), *fold_ops, s_sorted)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


# Above this size the beta-expanded cotangent (R, Np) is not materialized
# (config-5-scale shards); the backward falls back to the classic
# per-component dvalues dots.
CT_BETA_MAX_BYTES = 2_500_000_000


def fold_row_selectors(fold_meta, C: int):
    """(g-row index, monomial-row index) per folded row (k, i, c) - the
    gather indices of the beta-expanded cotangent build."""
    gsel, msel = [], []
    for k, mrows in enumerate(fold_meta):
        for m in mrows:
            for c in range(C):
                gsel.append(k * C + c)
                msel.append(m)
    return gsel, msel


def ct_beta_rows(fold_meta, C: int, g, mono, pad_mult: int = 8):
    """Beta-expanded lane-major cotangent (R_pad, Np) for the folded
    dvalues dot: row (k, i, c) = g[k*C + c] * raw-monomial row m(k, i) of
    ``mono``.  Built as one row gather + one fused multiply (a per-slab
    concatenate measured 17 ms/step at the 1M-sample operating point)."""
    gsel, msel = fold_row_selectors(fold_meta, C)
    R = len(gsel)
    Rp = _round_up(R, pad_mult)
    gsel = jnp.asarray(gsel + [0] * (Rp - R), jnp.int32)
    msel = jnp.asarray(msel + [0] * (Rp - R), jnp.int32)
    pad = (jnp.arange(Rp) < R).astype(jnp.float32)
    return g[gsel] * mono[msel] * pad[:, None]


def ct_beta_rows_t(fold_meta, C: int, g_t, mono_t, pad_mult: int = 128):
    """The transposed twin (Np, R_pad) for the folded-VJP S0/W dots, built
    directly from the row-major cotangent/monomials (g_t (Np, K*C),
    mono_t (Np, M)) - no big transpose."""
    gsel, msel = fold_row_selectors(fold_meta, C)
    R = len(gsel)
    Rp = _round_up(R, pad_mult)
    gsel = jnp.asarray(gsel + [0] * (Rp - R), jnp.int32)
    msel = jnp.asarray(msel + [0] * (Rp - R), jnp.int32)
    pad = (jnp.arange(Rp) < R).astype(jnp.float32)
    return g_t[:, gsel] * mono_t[:, msel] * pad[None, :]


def _wl_backward_kernel(orders, period, D, C, separable, moments, span,
                        compressed, n_prefetch, folded, n_mono,
                        folded_dvals, folded_vjp, h_matmul, precision,
                        *refs):
    aux_ref = refs[0]
    rest = refs[n_prefetch:]
    geom_ref = rest[0]
    if folded_vjp:
        # No h chains -> the cotangent arrives only beta-expanded, in BOTH
        # layouts: cb (R8, BN) feeds the Zd/dvalues dot, cbT (BN, R8) the
        # S0/W dots in standard lane-contraction orientation (sublane-
        # contracted dot0s pay Mosaic relayouts - round-2 finding).
        # fold/foldw carry the per-entry S0/W coefficient rows.
        fold_ref = rest[1]
        foldw_ref = rest[2]
        samples_refs = rest[3:3 + span]
        ct_t_refs = rest[3 + span:3 + 2 * span]
        ct_refs = rest[3 + 2 * span:3 + 3 * span]   # cbT blocks
        dent_ref = rest[3 + 3 * span]
    else:
        fold_ref = foldw_ref = None
        samples_refs = rest[1:1 + span]
        ct_refs = rest[1 + span:1 + 2 * span]
        ct_t_refs = rest[1 + 2 * span:1 + 3 * span]
        dent_ref = rest[1 + 3 * span]
    w = pl.program_id(0)
    tri = tri_size(D)
    a_w = aux_ref[w]

    @pl.when((a_w & 2) != 0)
    def _init():
        dent_ref[...] = jnp.zeros_like(dent_ref)

    def _compute_one_fvjp(samples_ref, cb_ref, cbt_ref):
        # Fully-folded backward: the cotangent arrives ONLY as the
        # beta-expanded rows cb (R8, BN); S0 and the W_l accumulators of
        # the fused VJP come off the MXU as sublane-contracted dots against
        # the per-entry coefficient rows (fold = forward's lhs reused for
        # S0 - it IS sum_k h_k q_k transposed; foldw = w_coeff_polys rows),
        # eliminating the per-pair h chains and the S0/W VPU accumulation.
        # The hl (laplacian) and Y (third) dcon corrections are per-ENTRY
        # combinations of the Zd rows (the same dot that serves dvalues).
        from ..ops.formulas import (ORDER_DEGREE, comp_flat_index,
                                    monomials_upto, sym_indices)
        from ..config import tri_index

        con = [geom_ref[1 + D + t, :][None, :] for t in range(tri)]
        Xs = [
            geom_ref[1 + d, :][None, :] - samples_ref[1 + d, :][:, None]
            for d in range(D)
        ]
        G, a = formulas.power_terms(Xs, con)
        G = G * (
            samples_ref[n_mono, :][:, None] == geom_ref[0, :][None, :]
        ).astype(jnp.float32)
        cb = cb_ref[...]                           # (R8, BN)
        R8 = cb.shape[0]
        Zd = jnp.dot(cb, G, preferred_element_type=jnp.float32,
                     precision=precision)          # (R8, BP)
        cbt = cbt_ref[...]                         # (BN, R8)
        S0 = jnp.dot(cbt, fold_ref[...],
                     preferred_element_type=jnp.float32,
                     precision=precision)          # (BN, BP)
        Ws = [
            jnp.dot(cbt, foldw_ref[l * R8:(l + 1) * R8, :],
                    preferred_element_type=jnp.float32,
                    precision=precision)
            for l in range(D)
        ]
        # dvalues from Zd + the alpha rows (same recombination as the
        # folded_dvals path).
        a0 = 1 + D + tri + C
        dvals = None
        off = 0
        arow = 0
        for mrows in folded:
            for _m in mrows:
                t = Zd[off:off + C, :] * geom_ref[a0 + arow, :][None, :]
                dvals = t if dvals is None else dvals + t
                off += C
                arow += 1
        # Per-pair VJP combine (vjp_params_fused's closed form with S0/W
        # precomputed): dmu_d = G ((C W)_d - a_d S0); z = W - X S0/2;
        # dcon_uv = G (X_v z_u + X_u z_v).
        Cc = lambda i, j: con[tri_index(D, i, j)]
        half = 0.5 * S0
        dmu = []
        for d in range(D):
            md = None
            for l in range(D):
                t = Cc(d, l) * Ws[l]
                md = t if md is None else md + t
            dmu.append(G * (md - a[d] * S0))
        z = [Ws[l] - Xs[l] * half for l in range(D)]
        dcon = []
        for u in range(D):
            for v in range(u, D):
                if u == v:
                    dcon.append(G * (Xs[u] * z[u]))
                else:
                    dcon.append(G * (Xs[v] * z[u] + Xs[u] * z[v]))
        rows = (
            [jnp.sum(m, axis=0, keepdims=True) for m in dmu]
            + [jnp.sum(ctn, axis=0, keepdims=True) for ctn in dcon]
        )
        # hl / Y corrections on the reduced dcon rows, from Zd per entry:
        #   sum_n G * hl_t     = sum_c V_c * Zd[(lap_t, const, c)]
        #   sum_n G * Y_t term = sum_c V_c * (b_w Zd[(k3, const, c)]
        #                                     - sum_l C_wl Zd[(k3, e_l, c)])
        table = fold_row_table(folded, C)
        cflat = comp_flat_index(orders, D)
        deg = max(ORDER_DEGREE[o] for o in orders)
        basis = {e: i for i, e in enumerate(monomials_upto(D, deg))}
        zero_e = tuple(0 for _ in range(D))
        unit = lambda d: tuple(1 if m == d else 0 for m in range(D))
        vrow = lambda c: geom_ref[1 + D + tri + c, :][None, :]
        zrow = lambda k, m: Zd[table[(k, basis[m])], :][None, :]

        def vz(k, m):
            acc = None
            for c in range(C):
                t = vrow(c) * Zd[table[(k, basis[m])] + c, :][None, :]
                acc = t if acc is None else acc + t
            return acc

        if "laplacian" in orders:
            for (u, v) in sym_indices("laplacian", D):
                t = tri_index(D, u, v)
                k = cflat[("laplacian", (u, v))]
                rows[D + t] = rows[D + t] - vz(k, zero_e)
        if "third" in orders:
            # b_w = (C mu)_w per entry, from the tile-local mean rows.
            b = []
            for w_ in range(D):
                acc = None
                for l in range(D):
                    t = Cc(w_, l) * geom_ref[1 + l, :][None, :]
                    acc = t if acc is None else acc + t
                b.append(acc)
            for (i, j, k_) in sym_indices("third", D):
                k3 = cflat[("third", (i, j, k_))]
                for (u, v, w_) in ((i, j, k_), (i, k_, j), (j, k_, i)):
                    t = tri_index(D, u, v)
                    term = b[w_] * vz(k3, zero_e)
                    for l in range(D):
                        term = term - Cc(w_, l) * vz(k3, unit(l))
                    rows[D + t] = rows[D + t] + term
        dent_ref[...] += jnp.concatenate(rows + [dvals], axis=0)

    def _compute_one(samples_ref, ct_ref, ct_t_ref):
        con = [geom_ref[1 + D + t, :][None, :] for t in range(tri)]
        if folded is not None or separable or moments:
            # X from the monomial x_l rows and the tile-local mean rows
            # (X = mu_l - x_l == mu' - x for every same-tile pair).
            # power/a stay on the VPU here: the (BN, BP) orientation would
            # need transposed-lhs MXU dots, measured +14 ms/step at the D=3
            # operating point (the forward's (BP, BN) orientation wins -4).
            Xs = [
                geom_ref[1 + d, :][None, :] - samples_ref[1 + d, :][:, None]
                for d in range(D)
            ]
            G, a = formulas.power_terms(Xs, con)
        else:
            Xs = [
                formulas.wrap(
                    geom_ref[1 + d, :][None, :]
                    - samples_ref[d, :][:, None],
                    period,
                )
                for d in range(D)
            ]
            G, a = formulas.power_terms(Xs, con)
        # Geom tile row is row 0; the sample operand's tile row rides LAST.
        srow_t = (n_mono if folded is not None
                  else mono_rows(D) if (separable or moments) else D)
        G = G * (
            samples_ref[srow_t, :][:, None] == geom_ref[0, :][None, :]
        ).astype(jnp.float32)
        values_t = geom_ref[1 + D + tri:1 + D + tri + C, :]  # (C, BP)

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
                # h[n,p] = sum_c g[n,c] * values[c,p]  (backward.cu:122).
                # C explicit broadcast FMAs on the VPU: exact fp32, and
                # faster than a depth-C MXU dot (whose HIGHEST-precision
                # lowering pays 6 passes of pipeline latency on a thin
                # contraction).
                if "h" in _ABLATE:
                    all_hs.append(G)
                elif h_matmul:
                    # h = g @ values on the MXU: a thin depth-C dot per
                    # component.  Standalone this loses to C broadcast
                    # FMAs, but the pair kernels OVERLAP MXU and VPU and
                    # the backward is VPU-bound (round-5 ablation: the
                    # dvalue dots measure 0 ms inside the full kernel), so
                    # moving the h chains (9.1 ms/step of binding VPU at
                    # the D=2 operating point) onto the MXU hides them.
                    all_hs.append(jnp.dot(
                        g_nc, values_t,
                        preferred_element_type=jnp.float32,
                        precision=precision))
                else:
                    h = None
                    for cc in range(C):
                        t = (g_nc[:, cc][:, None]
                             * values_t[cc, :][None, :])
                        h = t if h is None else h + t
                    all_hs.append(h)
                if folded_dvals or "dvals" in _ABLATE:
                    continue
                # dL/dvalues[c,p] += sum_n g[c,n] * W_k[n,p]
                g_t = ct_t_ref[(k0 + k) * C:(k0 + k + 1) * C, :]  # (C, BN)
                w_k = G if isinstance(polys[k], float) else G * polys[k]
                dv = jnp.dot(g_t, w_k,
                             preferred_element_type=jnp.float32,
                             precision=precision)
                dvals = dv if dvals is None else dvals + dv
            k0 += nk
        if folded_dvals and "dvals" not in _ABLATE:
            # Folded dvalues: ct_t_ref carries the beta-expanded cotangent
            # rows (R, BN) (built outside: g[(k,c)] * monomial_m), so the K
            # per-component dots collapse into ONE (R, BN) @ (BN, BP) dot
            # against G, recombined with the per-entry alpha rows (geom
            # rows after the values block - formulas.component_coeff_polys).
            Zd = jnp.dot(ct_t_ref[...], G,
                         preferred_element_type=jnp.float32,
                         precision=precision)          # (R, BP)
            a0 = 1 + D + tri + C
            off = 0
            arow = 0
            for mrows in folded:
                for _m in mrows:
                    t = (Zd[off:off + C, :]
                         * geom_ref[a0 + arow, :][None, :])
                    dvals = t if dvals is None else dvals + t
                    off += C
                    arow += 1
        if dvals is None:
            dvals = jnp.zeros((C, G.shape[1]), jnp.float32)
        if moments:
            rows = _moment_rows(
                orders, D, samples_ref, con, G, a, all_hs,
                lap_polys, third_polys,
            ) + [dvals]
        else:
            # Collapsed closed form across ALL fused orders - one shared VJP
            # instead of per-component loops (formulas.vjp_params_fused).
            if "vjp" in _ABLATE:
                dmu_acc = [G for _ in range(D)]
                dcon_acc = [G for _ in range(tri)]
            else:
                dmu_acc, dcon_acc = formulas.vjp_params_fused(
                    orders, Xs, con, G, a, all_hs, lap_polys, third_polys
                )
            rows = (
                [jnp.sum(m, axis=0, keepdims=True) for m in dmu_acc]
                + [jnp.sum(ctn, axis=0, keepdims=True) for ctn in dcon_acc]
                + [dvals]
            )
        dent_ref[...] += jnp.concatenate(rows, axis=0)  # (NPARAM, BP)

    def _dispatch(m):
        if folded_vjp:
            _compute_one_fvjp(samples_refs[m], ct_t_refs[m], ct_refs[m])
        else:
            _compute_one(samples_refs[m], ct_refs[m], ct_t_refs[m])

    if span == 1:
        @pl.when((a_w & 1) != 0)
        def _compute():
            _dispatch(0)
    else:
        if compressed:
            r = a_w >> 2
            lc = jnp.clip(refs[3][r] - (w - refs[2][r]) * span, 0, span)
        else:
            lc = refs[2][w]
        for m in range(span):
            @pl.when(m < lc)
            def _compute_m(m=m):
                _dispatch(m)


def moment_layout(orders, D: int):
    """Static layout of the moment-form backward's output rows.

    Returns (has_w, has_hl, has_y, n_rows): the kernel emits
      [M_S0 (1+D+tri rows)] +
      [M_W_l (1+D rows) per l]        (if any of deriv/laplacian/third) +
      [M_hl_t (1 row) per t]          (if laplacian) +
      [M_Y_t (1 row) per t]           (if third)
    and moment_combine folds them with the per-entry geometry into the
    (D + tri) parameter-gradient rows OUTSIDE the kernel - once per entry
    instead of once per work item."""
    tri = tri_size(D)
    has_w = any(o in ("derivative", "laplacian", "third") for o in orders)
    has_hl = "laplacian" in orders
    has_y = "third" in orders
    n = (1 + D + tri) + (D * (1 + D) if has_w else 0) \
        + (tri if has_hl else 0) + (tri if has_y else 0)
    return has_w, has_hl, has_y, n


def _moment_rows(orders, D, mono_ref, con, G, a, hs, lap_polys, third_polys):
    """In-kernel half of the moment-form backward: per-pair weights
    GS0 = G S0, GW_l = G W_l, G hl_t, G Y_t (formulas.fused_pair_accumulators
    - functions of (con, a, h) only), contracted against the sample monomial
    basis on the MXU.  Everything per-ENTRY (the polynomial combination into
    dmu/dcon) happens outside in moment_combine: (1, BP)-row arithmetic in
    the kernel costs a full vreg op per work item and measured +2 ms/step at
    the D=2 operating point."""
    tri = tri_size(D)
    has_w, has_hl, has_y, _ = moment_layout(orders, D)

    S0, w, hl, Y = formulas.fused_pair_accumulators(
        orders, con, a, hs, lap_polys, third_polys)

    MP = 1 + D

    def mom(V, rows):
        # (rows, BN) @ (BN, BP) with fp32 accumulate (monomial rows sit at
        # their aligned offsets; the tile row rides last).
        return jnp.dot(mono_ref[0:rows, :], V,
                       preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    def zrow(n, like):
        return jnp.zeros((n, like.shape[1]), jnp.float32)

    rows = [mom(G * S0, MP + tri)]
    if has_w:
        for l in range(D):
            rows.append(zrow(MP, G) if w[l] is None else mom(G * w[l], MP))
    if has_hl:
        for t in range(tri):
            rows.append(zrow(1, G) if hl[t] is None
                        else mom(G * hl[t], 1))
    if has_y:
        for t in range(tri):
            rows.append(zrow(1, G) if Y[t] is None else mom(G * Y[t], 1))
    return rows


def moment_combine(orders, D: int, C: int, dent, geom):
    """Outside half of the moment-form backward: fold the kernel's moment
    rows (dent[:n_rows]) with the per-entry tile-local geometry into the
    packed (D + tri + C, Ep) parameter-gradient rows.

    Derivation (see _moment_rows and formulas.vjp_params_fused):
      dmu_d  = sum_l C(d,l) (Wsum_l + Sx_l) - b_d S1
      dcon_t = expanded moments of G (X_v z_u + X_u z_v) - M[G hl_t]
               + M[G Y_t]
    with X_l = mu_l - xl_l, z = W - X/2 S0, S* = moments of G S0, and the
    monomial q rows unweighted (-2 diag / -1 offdiag) to raw second moments.
    One fused elementwise pass over Ep - negligible next to the kernel.
    """
    from ..config import tri_index

    tri = tri_size(D)
    has_w, has_hl, has_y, n_rows = moment_layout(orders, D)
    MP = 1 + D
    # geom row 0 is the tile row (prepare_entries).
    mu = [geom[1 + d] for d in range(D)]               # tile-local (Ep,)
    Cc = lambda i, j: geom[1 + D + tri_index(D, i, j)]

    r = 0
    M_S0 = dent[r:r + MP + tri]
    r += MP + tri
    S1 = M_S0[0]
    Sx = [M_S0[1 + d] for d in range(D)]
    Sq = [None] * tri
    for u in range(D):
        for v in range(u, D):
            t = tri_index(D, u, v)
            Sq[t] = (-2.0 if u == v else -1.0) * M_S0[MP + t]
    Wsum = [None] * D
    Wx = [[None] * D for _ in range(D)]
    if has_w:
        for l in range(D):
            Wsum[l] = dent[r]
            for d in range(D):
                Wx[l][d] = dent[r + 1 + d]
            r += MP
    Mhl = [None] * tri
    if has_hl:
        for t in range(tri):
            Mhl[t] = dent[r]
            r += 1
    MY = [None] * tri
    if has_y:
        for t in range(tri):
            MY[t] = dent[r]
            r += 1
    dvals = dent[n_rows:]

    dmu = []
    for d in range(D):
        md = 0.0
        b_d = 0.0
        for l in range(D):
            term = Sx[l] if Wsum[l] is None else Wsum[l] + Sx[l]
            md = md + Cc(d, l) * term
            b_d = b_d + Cc(d, l) * mu[l]
        dmu.append(md - b_d * S1)

    dcon = []
    for u in range(D):
        for v in range(u, D):
            t = tri_index(D, u, v)
            if u == v:
                term = -0.5 * (mu[u] * mu[u] * S1 + Sq[t]) + mu[u] * Sx[u]
                if Wsum[u] is not None:
                    term = term + mu[u] * Wsum[u] - Wx[u][u]
            else:
                term = (mu[v] * Sx[u] + mu[u] * Sx[v]
                        - mu[u] * mu[v] * S1 - Sq[t])
                if Wsum[u] is not None:
                    term = term + mu[v] * Wsum[u] - Wx[u][v]
                if Wsum[v] is not None:
                    term = term + mu[u] * Wsum[v] - Wx[v][u]
            if Mhl[t] is not None:
                term = term - Mhl[t]
            if MY[t] is not None:
                term = term + MY[t]
            dcon.append(term)
    return jnp.concatenate(
        [jnp.stack(dmu + dcon, axis=0), dvals], axis=0)


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
    separable: bool = False,
    moments: bool = False,
    span: int = 1,
    folded=None,
    n_mono: int = 0,
    folded_dvals: bool = False,
    folded_vjp: bool = False,
    h_matmul: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Packed per-entry gradients (D+tri+C, Ep): means rows, conic rows,
    value rows.  The caller segment-sums by gaussian id (deterministic
    replacement for backward.cu's atomicAdd scatter); any work-list overflow
    means invalid results (callers check the diagnostics).

    ``span`` packs that many consecutive sample blocks per work item (the
    work list must be built with the same span); ``wl`` carries the per-row
    nblk vector as its 6th element (compressed live-count derivation)."""
    aux, col, base_c, starts, lcnt, nblk = wl
    gid, ent_tile, geom, Ep = ent[:4]
    fold = ent[4] if len(ent) > 4 else None
    foldw = ent[5] if len(ent) > 5 else None
    s_sorted, s_tile, Np = smp
    K = total_unique(orders, D)
    NPARAM = n_params(D, C)
    # Moment mode widens the output to the raw moment rows + dvals; the
    # caller folds them per entry via moment_combine.
    NOUT = (moment_layout(orders, D)[3] + C) if moments else NPARAM
    # The backward only reads the base parameter rows of the separable-
    # extended geom and the [tile, 1, x_l] head of the monomial matrix; a
    # block row-prefix smaller than the operand saves the unused rows' HBM
    # reads.  TPU blocks must have row counts divisible by 8 or equal to the
    # full dimension, so round the prefix up (and fall back to the full
    # rows).  All operands carry the f32 tile row at row 0.
    def _prefix(want, full):
        blk = _round_up(want, 8)
        return blk if blk < full else full

    sep_prep = separable or moments
    if folded is not None:
        # Folded mode reads the raw monomial sample operand (tile row
        # LAST); the geom alpha tail is only read by the folded dvalues
        # recombination - with classic dvalues (folded_dvals=False) the
        # block prefix stops after the value rows.
        GROWS = (geom.shape[0] if folded_dvals
                 else _prefix(1 + NPARAM, geom.shape[0]))
        SROWS = n_mono + 1
    else:
        GROWS = (_prefix(1 + NPARAM, 1 + NPARAM + sep_rows(D)) if sep_prep
                 else 1 + NPARAM)
        # The sample operand's tile row rides LAST (monomial rows keep
        # their aligned offsets), so SROWS spans the full operand in
        # sep/moment modes.
        SROWS = (mono_rows(D) + 1 if sep_prep else 1 + D)
    tri = tri_size(D)
    cap = aux.shape[0]
    NB = Np // block_n

    compressed = _use_compressed(cap, span)
    if compressed:
        operands = (aux, base_c, starts)
        if span > 1:
            operands = operands + (nblk,)

        def _col(m):
            def colf(w, a, b, s, *l):
                r = a[w] >> 2
                return jnp.minimum(b[r] + (w - s[r]) * span + m, NB - 1)
            return colf

        def col_map0_m(m):
            c = _col(m)
            return lambda w, *sc: (0, c(w, *sc))

        def col_map_r_m(m):
            c = _col(m)
            return lambda w, *sc: (c(w, *sc), 0)

        def row_map(w, a, b, s, *l):
            return (0, a[w] >> 2)
    else:
        operands = (aux, col)
        if span > 1:
            operands = operands + (lcnt,)

        def col_map0_m(m):
            return lambda w, a, c, *l: (0, jnp.minimum(c[w] + m, NB - 1))

        def col_map_r_m(m):
            return lambda w, a, c, *l: (jnp.minimum(c[w] + m, NB - 1), 0)

        def row_map(w, a, c, *l):
            return (0, a[w] >> 2)

    nsp = len(operands)

    if folded_vjp:
        # ``ct`` carries the TRANSPOSED beta-expanded cotangent (Np, R8)
        # in this mode (see _compute_one_fvjp).
        in_specs = (
            [pl.BlockSpec((GROWS, block_e), row_map),
             pl.BlockSpec((fold.shape[0], block_e), row_map),
             pl.BlockSpec((foldw.shape[0], block_e), row_map)]
            + [pl.BlockSpec((SROWS, block_n), col_map0_m(m))
               for m in range(span)]
            + [pl.BlockSpec((ct_t.shape[0], block_n), col_map0_m(m))
               for m in range(span)]
            + [pl.BlockSpec((block_n, ct_t.shape[0]), col_map_r_m(m))
               for m in range(span)]
        )
        args = (geom, fold, foldw, *([s_sorted] * span),
                *([ct_t] * span), *([ct] * span))
    else:
        in_specs = (
            [pl.BlockSpec((GROWS, block_e), row_map)]
            + [pl.BlockSpec((SROWS, block_n), col_map0_m(m))
               for m in range(span)]
            + [pl.BlockSpec((block_n, K * C), col_map_r_m(m))
               for m in range(span)]
            + [pl.BlockSpec((ct_t.shape[0], block_n), col_map0_m(m))
               for m in range(span)]
        )
        args = (geom, *([s_sorted] * span), *([ct] * span),
                *([ct_t] * span))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(cap,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((NOUT, block_e), row_map),
    )

    return pl.pallas_call(
        functools.partial(_wl_backward_kernel, orders, period, D, C,
                          separable, moments, span, compressed, nsp,
                          folded, n_mono, folded_dvals, folded_vjp,
                          h_matmul, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NOUT, Ep), jnp.float32),
        interpret=_interpret(),
    )(*operands, *args)
