"""Chunk-packed tile-binned sampling (the high-density sibling of
ops/sampling.sample_binned).

Same semantics as the tiled path - a pair counts iff the Gaussian's
3-sigma rect covers the sample's tile (forward.cu:104-144 pairing) - but
both sides of the pair sweep are padded per tile (binning/chunked.py) so
every work item is a same-tile (sample-chunk x entry-chunk) pair.  The
range-overlap work list of sample_tiled_multi pays cross-tile slack
whenever per-tile occupancy is small compared to the block size; chunk
packing removes it, which unlocks FINE tiles: shrinking the tile cuts the
same-tile candidate count toward the true 3-sigma neighborhood (the
candidate-pair total scales like (2r + tile)^D), where the range list's
density would collapse.  This is what takes D=3 - whose footprint/tile
geometry forces low occupancy - from its round-1 cliff to parity.

The Pallas kernels are kernels/tiled.py VERBATIM: chunked.work_list emits
the same (aux = row*4 + first*2 + compute, col) encoding; only the operand
layouts (chunk-padded instead of contiguous) and the capacity planning
differ.  Gradients flow to (means, values, conics) only - the reference's
autograd contract (__init__.py:113-126) - via the same custom-vjp +
deterministic by-gaussian segment-sum structure.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SamplerConfig, n_components, out_shape, tri_size
from . import formulas

# Work lists above kernels/tiled.COMPRESS_ABOVE automatically use the
# compressed per-row (base, start) encoding (binning/chunked.row_sweeps), so
# config-5-scale shards (16M samples) fit scalar SMEM like the tiled path.


class ChunkPlan(NamedTuple):
    """Static capacities for the chunked sampling path (hashable: usable as
    a jit static argument).  Measured exactly by plan_chunked from one eager
    geometry build; in-graph overflow counters guard drift."""

    rect: int      # per-axis candidate-tile cap R for duplicate_entries
    entries: int   # compact sorted-entry capacity
    e_chunks: int  # entry chunks of block_e
    s_chunks: int  # sample chunks of block_n
    work_fwd: int  # sample-chunk-major work items
    work_bwd: int  # entry-chunk-major work items


class ChunkedSamples(NamedTuple):
    """Chunk-padded sample side - parameter-independent, built once per
    sample set (the analogue of binning.grid.SampleBinning)."""

    s_coords: jnp.ndarray  # (D+1, Nsp) padded sorted coords + f32 tile row
    s_tile: jnp.ndarray    # (1, Nsp) int32, 2**30+1 on pad slots
    pos: jnp.ndarray       # (N,) padded slot of each original sample
    cm: jnp.ndarray        # (T,) sample chunks per tile
    cbase: jnp.ndarray     # (T,) first sample chunk of each tile
    ctile: jnp.ndarray     # (s_chunks,) tile of each sample chunk, T unused
    mono: Optional[jnp.ndarray]  # (mono_rows(D), Nsp) separable monomial
                                 # matrix; None on wrapped configs
    overflow: jnp.ndarray  # () int32 chunk-capacity overflow


def _kernel_modes(cfg: SamplerConfig):
    """(separable, moments, folded) resolved from the config flags for the
    chunked path (auto defaults: separable/moments OFF under pinned dot
    precision, folded-values ON where the wrap-free certificate holds; a
    forced separable/moment mode takes priority, fast-math disables the
    folded auto)."""
    wrap_free = cfg.unwrapped_kernels or cfg.period is None
    # Auto defaults mirror ops/sampling.sample_tiled_multi: OFF under
    # pinned (fp32-class) dot precision, but under the documented fast-math
    # mode the one-pass dots restore the bf16-era winners (separable MXU
    # pair math + moment backward at wrap-free D >= 3).
    fast_auto = bool(cfg.fast_math_dots) and cfg.D >= 3 and wrap_free
    separable = (bool(cfg.separable_kernels) and wrap_free
                 if cfg.separable_kernels is not None else fast_auto)
    moments = (bool(cfg.moment_backward) and wrap_free
               if cfg.moment_backward is not None else fast_auto)
    # Default OFF (round-5 on-chip finding: VPU/MXU overlap hides the
    # folded dot savings while the coefficient builds add glue; see
    # ops/sampling.sample_tiled_multi).
    folded = bool(cfg.folded_values) and wrap_free and not (
        separable or moments)
    return separable, moments, folded


def plan_chunked(cfg: SamplerConfig, means, covariances, samples,
                 *, block_n: Optional[int] = None,
                 block_e: Optional[int] = None,
                 headroom: float = 1.0):
    """Host-side capacity plan: exact chunk/work capacities measured from
    one eager geometry build (the chunked-path analogue of
    utils.native.plan_capacities).

    ``headroom > 1`` scales every capacity for training drift (parameters
    move, collocation points resample).  Chunks beyond the used total are
    never written by any work item, so the UNSORTED output path is
    headroom-safe; ``padded_outputs`` consumers must either use exact
    capacities or mask with a validity vector (pad-chunk columns are
    uninitialized HBM).  Work items beyond the used total are no-compute.
    Overflow diagnostics still flag any drift past the scaled capacities."""
    import numpy as np

    from ..binning import chunked
    from ..binning import grid as binning
    from ..oracle.dense import radii as compute_radii
    from ..oracle.dense import radii_axis

    import dataclasses

    P, D = means.shape
    cfg = cfg.with_dims(D)
    bn = block_n or cfg.block_n
    be = block_e or cfg.block_p
    rad = (radii_axis if cfg.axis_radii else compute_radii)(
        covariances, D, cfg.radius_sigma, cfg.eig_floor)
    # Compact-support certificate for the wrap-free kernels (identical to
    # utils.native.plan_capacities): with every footprint satisfying
    # max_radius + tile < period/2, per-entry period-shifted means make the
    # raw offset the minimum-image displacement for every paired sample,
    # unlocking the separable MXU forward (D>=3) and the moment-form
    # backward for the chunk-packed path.
    if cfg.period is not None and not cfg.unwrapped_kernels:
        rmax = float(jax.device_get(jnp.max(rad)))
        if rmax + cfg.tile_size < cfg.period / 2.0:
            cfg = dataclasses.replace(cfg, unwrapped_kernels=True)
    lo, hi = binning.gaussian_rects(cfg, means, rad)
    R = max(int(jax.device_get(jnp.max(hi - lo))), 1)
    plan_conics = (binning.conics_from_cov(jnp.asarray(covariances), D)
                   if cfg.ellip_cull and D >= 2 else None)
    ent = binning.duplicate_entries(cfg, means, rad, R, P * R ** D,
                                    conics=plan_conics)
    T = binning.num_tiles(cfg, D)
    n_entries = int(jax.device_get(jnp.sum(ent[1] < T)))
    sb = binning.bin_samples(cfg, samples)
    em = np.asarray(jax.device_get(chunked.chunk_counts(ent[2], be)))
    sm = np.asarray(jax.device_get(chunked.chunk_counts(sb.s_start, bn)))
    work_fwd = int((sm * np.maximum(em, 1)).sum() * headroom)
    work_bwd = int((em * np.maximum(sm, 1)).sum() * headroom)
    return cfg, ChunkPlan(
        rect=R,
        entries=max(-(-int(n_entries * headroom) // 128) * 128, 128),
        e_chunks=max(int(em.sum() * headroom), 1),
        s_chunks=max(int(sm.sum() * headroom), 1),
        work_fwd=max(work_fwd, 1),
        work_bwd=max(work_bwd, 1),
    )


@functools.partial(jax.jit, static_argnums=(0, 2, 3),
                   static_argnames=("plan", "block_n", "folded_deg"))
def chunk_samples(cfg: SamplerConfig, samples, plan: ChunkPlan,
                  block_n: int, sample_binning=None,
                  folded_deg: int = 3) -> ChunkedSamples:
    """Build the chunk-padded sample side (once per sample set)."""
    from ..binning import chunked
    from ..binning import grid as binning

    N, D = samples.shape
    cfg = cfg.with_dims(D)
    sb = sample_binning if sample_binning is not None else binning.bin_samples(
        cfg, samples)
    csrc, cvalid, stile, ctile, cbase, cm, s_of = chunked.chunk_layout(
        sb.s_start, block_n, plan.s_chunks)
    Nsp = plan.s_chunks * block_n
    coords = sb.s_sorted.T[csrc].T                       # (D, Nsp)
    s_tile = jnp.where(cvalid, stile, jnp.int32(2**30 + 1))[None, :]
    cid = jnp.where(cvalid, sb.s_perm[csrc], N)
    pos = jnp.zeros((N + 1,), jnp.int32).at[cid].set(
        jnp.arange(Nsp, dtype=jnp.int32), mode="drop"
    )[:N]
    from ..kernels import tiled as ktiled

    # The monomial matrix feeds the folded/separable/moment kernels (any
    # wrap-free config - the same predicate sample_chunked_multi uses); the
    # wrapped case doesn't compute or store it.  The folded-values kernels
    # use the RAW monomial basis (built to ``folded_deg``; degree 3 covers
    # every order - sample_chunked_multi slices the prefix it needs);
    # forced separable/moment modes use the weighted basis.
    sep, mom, folded = _kernel_modes(cfg)
    prep_sep = cfg.unwrapped_kernels or cfg.period is None
    # The f32 tile row rides LAST in both sample operands (the pair mask
    # rides the parameter DMA; monomial/coord rows keep their aligned
    # offsets - kernels/tiled.prepare_samples).
    tile_f = ktiled.sample_tile_row(s_tile)
    if folded and prep_sep:
        mono = jnp.concatenate(
            [ktiled.sample_monomials_raw(cfg, coords, s_tile, D,
                                         folded_deg), tile_f], axis=0)
    elif prep_sep:
        mono = jnp.concatenate(
            [ktiled.sample_monomials(cfg, coords, s_tile, D), tile_f],
            axis=0)
    else:
        mono = None
    return ChunkedSamples(
        s_coords=jnp.concatenate([coords, tile_f], axis=0),
        s_tile=s_tile, pos=pos, cm=cm, cbase=cbase,
        ctile=ctile,
        mono=mono,
        overflow=s_of,
    )


def sample_chunked_multi(
    orders: Tuple[str, ...],
    cfg: SamplerConfig,
    means, values, conics, radii,
    cs: ChunkedSamples,
    plan: ChunkPlan,
    *,
    block_n: int, block_e: int,
    unique_outputs: bool = False,
    padded_outputs: bool = False,
):
    """Fused multi-order evaluation over the chunk-packed binning.

    Returns (outputs tuple, diagnostics dict).  With ``padded_outputs``
    each order comes back in the kernels' raw lane-major layout
    ((n_unique, C, Nsp) canonical components, chunk-padded tile-sorted
    columns, pad columns zero); otherwise outputs are un-sorted to sample
    order via one row gather.  All overflow diagnostics must be zero for
    exact results."""
    from ..binning import chunked
    from ..binning import grid as binning
    from ..kernels import tiled as ktiled

    P, D = means.shape
    C = values.shape[1]
    tri = tri_size(D)
    cfg = cfg.with_dims(D)
    N = cs.pos.shape[0]
    Nsp = cs.s_coords.shape[1]
    Ep = plan.e_chunks * block_e
    # Binning structure is non-differentiable; sever tangents before the
    # custom_vjp closure below captures radii (see sample_tiled_multi).
    radii = jax.lax.stop_gradient(radii)

    (gid, tile, start, rect_of, ent_of) = binning.duplicate_entries(
        cfg, means, radii, plan.rect, min(P * plan.rect ** D, plan.entries),
        conics=(jax.lax.stop_gradient(conics)
                if cfg.ellip_cull and D >= 2 else None),
    )
    esrc, evalid, etile, echunk_tile, ebase, em, e_of = chunked.chunk_layout(
        start, block_e, plan.e_chunks)
    gid_pad = jnp.where(evalid, gid[esrc], jnp.int32(P))
    tile_pad = jnp.where(evalid, etile, jnp.int32(2**30))[None, :]

    from ..kernels import tiled as _kt

    span_f, span_b = cfg.work_span_fwd, cfg.work_span_bwd
    cap_f = _kt.span_capacity(plan.work_fwd, plan.s_chunks, span_f)
    cap_b = _kt.span_capacity(plan.work_bwd, plan.e_chunks, span_b)
    aux_f, col_f, lcnt_f, wf_of = chunked.work_list(
        cs.cm, em, cs.cbase, ebase, cap_f, plan.e_chunks, span=span_f)
    aux_b, col_b, lcnt_b, wb_of = chunked.work_list(
        em, cs.cm, ebase, cs.cbase, cap_b, plan.s_chunks, span=span_b)
    # Per-row-chunk (base, start) scalars: the kernels switch to the
    # compressed (4 bytes/item) work-list form above COMPRESS_ABOVE, which
    # keeps config-5-scale shards (16M samples) inside scalar SMEM.
    fbase, fstarts, fncols = chunked.row_sweeps(
        cs.cm, em, cs.cbase, ebase, cs.ctile, plan.e_chunks, span=span_f)
    bbase, bstarts, bncols = chunked.row_sweeps(
        em, cs.cm, ebase, cs.cbase, echunk_tile, plan.s_chunks, span=span_b)
    wl_f = (aux_f, col_f, fbase, fstarts, lcnt_f, fncols)
    wl_b = (aux_b, col_b, bbase, bstarts, lcnt_b, bncols)

    # Entries are pre-shifted to their periodic image (prepare_entries
    # semantics), so the kernels run wrap-free when the config certifies
    # compact footprints; wrap-free D>=3 also enables the separable MXU
    # pair math (see ops/sampling.sample_tiled_multi).
    kernel_period = None if cfg.unwrapped_kernels else cfg.period
    separable, moments, folded = _kernel_modes(cfg)
    if cfg.moment_backward and kernel_period is not None:
        import warnings

        warnings.warn(
            "moment_backward=True requires wrap-free (tile-local) "
            "kernels but the config is periodic without the compact-"
            "support certificate (cfg.unwrapped_kernels); falling back "
            "to the per-pair backward", stacklevel=2)
    prep_sep = separable or moments
    folded_meta, n_mono = (formulas.folded_structure(orders, D)
                           if folded else (None, 0))
    prec = ktiled.dot_precision(cfg)

    def _prepare(m, v, c):
        params = jnp.concatenate([m, c, v], axis=1)      # (P, NPARAM)
        if cfg.period is not None:
            # Rect lo rides the same row gather; the periodic image index is
            # recomputed from (tile, lo) - see kernels/tiled.prepare_entries.
            # stop_gradient: the rect is binning structure, not differentiable.
            lo, _ = binning.gaussian_rects(
                cfg, jax.lax.stop_gradient(m), jax.lax.stop_gradient(radii))
            params = jnp.concatenate([params, lo.astype(params.dtype)], 1)
        params = jnp.concatenate(
            [params, jnp.zeros((1, params.shape[1]), params.dtype)], 0)
        ent = params[gid_pad]                            # (Ep, NPARAM[+D])
        if cfg.period is not None:
            npar = D + tri + C
            k = binning.image_shift(cfg, tile_pad, ent[:, npar:])
            ent = ent[:, :npar].at[:, :D].add(-cfg.period * k.astype(ent.dtype))
        if folded:
            geom, fold, foldw = ktiled.folded_geom(
                cfg, ent, tile_pad, D, C, orders, folded_meta,
                vjp=fold_vjp)
            return gid_pad, tile_pad, geom, Ep, fold, foldw
        if prep_sep:
            ent = ktiled.separable_extend(cfg, ent, tile_pad, D)
        # Row 0 is the f32 tile row: the pair mask rides the parameter DMA
        # (see kernels/tiled.prepare_entries).
        geom = jnp.concatenate(
            [ktiled.entry_tile_row(tile_pad), ent.T], axis=0)
        return gid_pad, tile_pad, geom, Ep, None

    mono = cs.mono
    if folded and mono is not None and mono.shape[0] != n_mono + 1:
        # chunk_samples builds the raw basis to its ``folded_deg`` (3 by
        # default); slice the prefix these orders need + the tile row.
        mono = jnp.concatenate([mono[:n_mono], mono[-1:]], axis=0)
    smp = (mono if (prep_sep or folded) else cs.s_coords, cs.s_tile, Nsp)
    fwd_tile_local = prep_sep and not separable

    # Folded dvalues: beta-expanded cotangent, size-gated (see
    # ops/sampling.sample_tiled_multi).
    R_fold = (C * sum(len(x) for x in folded_meta)) if folded else 0
    # Round-5 overlap finding: the classic per-component dvalue dots are
    # FULLY HIDDEN under the VPU-bound backward (0 ms in the on-chip
    # ablation), so the beta-expanded-cotangent forms are pure glue cost
    # by default; both stay available for A/B.
    fold_dv = folded and bool(cfg.folded_dvals) and (
        R_fold * Nsp * 4 <= ktiled.CT_BETA_MAX_BYTES)
    fold_vjp = bool(fold_dv) and bool(cfg.folded_vjp)

    @jax.custom_vjp
    def f(m, v, c):
        ent = _prepare(m, v, c)
        return ktiled.tiled_forward(
            orders, kernel_period, D, C, wl_f, ent, smp,
            block_n=block_n, block_e=block_e, separable=separable,
            tile_local=fwd_tile_local, span=span_f,
            folded=folded_meta, n_mono=n_mono, precision=prec,
        )                     # (K*C, Nsp); pad columns are zero

    def f_fwd(m, v, c):
        return f(m, v, c), _prepare(m, v, c)

    def f_bwd(ent, g):
        ct_t = (ktiled.ct_beta_rows(folded_meta, C, g, smp[0],
                                    pad_mult=128 if fold_vjp else 8)
                if fold_dv else g)
        ct = (ktiled.ct_beta_rows_t(folded_meta, C, g.T, smp[0].T)
              if fold_vjp else g.T)
        dent = ktiled.tiled_backward(
            orders, kernel_period, D, C, wl_b, ent, smp,
            ct, ct_t,
            block_n=block_n, block_e=block_e, separable=separable,
            moments=moments, span=span_b,
            folded=folded_meta, n_mono=n_mono, folded_dvals=fold_dv,
            folded_vjp=fold_vjp,
            h_matmul=bool(cfg.h_matmul),
            precision=prec,
        )
        if moments:
            dent = ktiled.moment_combine(orders, D, C, dent, ent[2])
        d = jax.ops.segment_sum(dent.T, ent[0], num_segments=P + 1)[:P]
        return d[:, :D], d[:, D + tri:], d[:, D:D + tri]

    f.defvjp(f_fwd, f_bwd)
    packed_t = f(means, values, conics)    # (K*C, Nsp)

    if not padded_outputs:
        out = packed_t.T[cs.pos]           # (N, K*C) in sample order

    # Mirror the kernels' unique (canonical i<=j<=k) components into the
    # full symmetric tensors OUTSIDE the custom_vjp (the transpose folds the
    # duplicated positions' cotangents into the unique slots - see
    # sample_tiled_multi).
    outs, k0 = [], 0
    for order in orders:
        nu = formulas.n_unique(order, D)
        if padded_outputs:
            outs.append(packed_t[k0 * C:(k0 + nu) * C, :].reshape(nu, C, -1))
            k0 += nu
            continue
        block = out[:, k0 * C:(k0 + nu) * C].reshape(N, nu, C)
        if unique_outputs:
            outs.append(block)
        else:
            fmap = formulas.full_to_unique(order, D)
            if len(fmap) != nu:
                block = block[:, jnp.asarray(fmap, jnp.int32), :]
            outs.append(block.reshape(out_shape(order, N, D, C)))
        k0 += nu

    diag = {
        "perm": None,
        "bin_overflow": rect_of,
        "entry_overflow": ent_of + e_of,
        "work_overflow_fwd": wf_of,
        "work_overflow_bwd": wb_of + cs.overflow,
    }
    return tuple(outs), diag


def sample_chunked(cfg, means, values, conics, covariances, samples,
                   plan: ChunkPlan, cs: ChunkedSamples,
                   orders: Tuple[str, ...],
                   *, unique_outputs: bool = False,
                   padded_outputs: bool = False):
    """Binned-evaluation entry point matching sample_binned's contract:
    (outputs dict, diagnostics dict), radii derived from covariances."""
    from ..oracle.dense import radii as compute_radii
    from ..oracle.dense import radii_axis

    D = means.shape[1]
    cfg = cfg.with_dims(D)
    rad = (radii_axis if cfg.axis_radii else compute_radii)(
        covariances, D, cfg.radius_sigma, cfg.eig_floor)
    outs, diag = sample_chunked_multi(
        tuple(orders), cfg, means, values, conics, rad, cs, plan,
        block_n=cfg.block_n, block_e=cfg.block_p,
        unique_outputs=unique_outputs, padded_outputs=padded_outputs,
    )
    return dict(zip(orders, outs)), diag
