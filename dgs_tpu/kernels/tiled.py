"""Pallas TPU kernels over the tile-binned acceleration structure.

The TPU analogue of the reference's per-tile render kernels
(forward.cu:88-166, backward.cu:27-106).  The CUDA design gives each spatial
tile a thread block that walks its dynamic [start,end) range of sorted
Gaussian IDs; here, a block of BS consecutive *tile-sorted* samples sweeps the
contiguous range of *tile-sorted* Gaussian entries covering its tiles.  Block
offsets are scalar-prefetched (PrefetchScalarGridSpec), and pair validity is
``entry_tile == sample_tile`` - the exact pairing the reference's binning
produces (a Gaussian meets a sample iff its 3-sigma rect covers the sample's
tile).

Backward writes gradients **per entry** (one slot per (gaussian, tile)
duplicate) and the caller segment-sums by gaussian id - a deterministic
replacement for the reference's atomicAdd scatter (backward.cu:121-152).

Layouts follow kernels/dense.py: pairwise (samples x entries) =
(sublanes x lanes); per-entry data transposed; per-component outputs and
cotangents as separate (N, C) arrays.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import n_components, tri_size
from ..binning.grid import BinningState
from ..ops import formulas
from .dense import (_backward_body, _forward_body, _interpret, _pad_axis,
                    _round_up, total_components)


def prepare_entries(state: BinningState, means, values, conics, block_e: int):
    """Entry-ordered parameter arrays, padded to a block multiple.

    Shared by forward and backward (ops/sampling.py computes it once per
    custom_vjp forward and stows it in the residuals) - the entry gathers are
    a visible slice of step time at 1M-sample scale.

    Sentinel entries (gid == P) hit an appended zero row; they are also
    tile-masked in-kernel, so both forward and backward contributions vanish.
    """
    P, D = means.shape
    C = values.shape[1]
    E = state.num_entries
    Ep = _round_up(E, block_e)

    gid = _pad_axis(state.ent_gid, 0, Ep)
    gid = jnp.where(jnp.arange(Ep) >= E, P, gid)
    tile = _pad_axis(state.ent_tile, 1, Ep)
    tile = jnp.where(jnp.arange(Ep)[None, :] >= E, jnp.int32(2**30), tile)

    means_p = jnp.concatenate([means, jnp.zeros((1, D), means.dtype)], 0)
    values_p = jnp.concatenate([values, jnp.zeros((1, C), values.dtype)], 0)
    conics_p = jnp.concatenate(
        [conics, jnp.zeros((1, conics.shape[1]), conics.dtype)], 0
    )

    ent_means = means_p[gid].T        # (D, Ep)
    ent_values = values_p[gid]        # (Ep, C)
    ent_conics = conics_p[gid].T      # (tri, Ep)
    return gid, tile, ent_means, ent_values, ent_conics, Ep


def prepare_samples(state: BinningState, samples, block_n: int):
    N, D = samples.shape
    Np = _round_up(N, block_n)
    s_sorted = samples[state.s_perm].T  # (D, N)
    s_sorted = _pad_axis(s_sorted, 1, Np)
    s_tile = _pad_axis(state.s_tile, 1, Np)
    s_tile = jnp.where(jnp.arange(Np)[None, :] >= N, jnp.int32(2**30 + 1), s_tile)
    return s_sorted, s_tile, Np


def _tile_mask(s_tile_ref, ent_tile_ref):
    return (
        s_tile_ref[0, :][:, None] == ent_tile_ref[0, :][None, :]
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _tiled_forward_kernel(orders, period, D, C,
                          base_ref, nblk_ref,
                          means_ref, conics_ref, values_ref, ent_tile_ref,
                          samples_ref, s_tile_ref, *out_refs):
    i, w = pl.program_id(0), pl.program_id(1)

    @pl.when(w == 0)
    def _init():
        for o in out_refs:
            o[...] = jnp.zeros_like(o)

    @pl.when(w < nblk_ref[i])
    def _compute():
        _forward_body(
            orders, period, D, C, means_ref, conics_ref, values_ref,
            samples_ref, out_refs,
            mask_fn=lambda: _tile_mask(s_tile_ref, ent_tile_ref),
        )


def tiled_forward(
    orders: Tuple[str, ...],
    period: Optional[float],
    means, values, conics, samples,
    state: BinningState,
    base: jnp.ndarray,     # (NB,) entry-block base per sample block
    nblk: jnp.ndarray,     # (NB,) entry-block sweep length per sample block
    work_blocks: int,      # static sweep cap (>= max(nblk) for exactness)
    *,
    block_n: int = 256,
    block_e: int = 512,
    sorted_outputs: bool = False,
    ent=None,
    smp=None,
) -> List[jnp.ndarray]:
    """Per-component (N, C) outputs.

    With ``sorted_outputs=False`` outputs are returned in the caller's sample
    order; with True they stay in tile-sorted order (row r = sample
    state.s_perm[r]), skipping the un-sort gather - use for permutation-
    invariant consumers (losses reduced over samples)."""
    N, D = samples.shape
    P, C = values.shape
    K = total_components(orders, D)
    tri = tri_size(D)

    gid, ent_tile, ent_means, ent_values, ent_conics, Ep = (
        ent if ent is not None
        else prepare_entries(state, means, values, conics, block_e)
    )
    s_sorted, s_tile, Np = (
        smp if smp is not None else prepare_samples(state, samples, block_n)
    )
    NB = Np // block_n
    EBmax = Ep // block_e
    base = jnp.clip(_pad_axis(base, 0, NB), 0, EBmax - 1)
    nblk = _pad_axis(nblk, 0, NB)

    # Clamp the sweep index at the block's last real entry block: iterations
    # beyond nblk (predicated off in-kernel) then re-address the same block,
    # which Pallas recognizes and skips the DMA for - large static work caps
    # cost only grid overhead, not bandwidth.
    def _e(i, w, base_ref, nblk_ref):
        w_eff = jnp.minimum(w, jnp.maximum(nblk_ref[i] - 1, 0))
        return jnp.minimum(base_ref[i] + w_eff, EBmax - 1)

    def eidx(i, w, base_ref, nblk_ref):
        return (0, _e(i, w, base_ref, nblk_ref))

    def eidx_rows(i, w, base_ref, nblk_ref):
        return (_e(i, w, base_ref, nblk_ref), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB, work_blocks),
        in_specs=[
            pl.BlockSpec((D, block_e), eidx),
            pl.BlockSpec((tri, block_e), eidx),
            pl.BlockSpec((block_e, C), eidx_rows),
            pl.BlockSpec((1, block_e), eidx),
            pl.BlockSpec((D, block_n), lambda i, w, b, n: (0, i)),
            pl.BlockSpec((1, block_n), lambda i, w, b, n: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((block_n, C), lambda i, w, b, n: (i, 0))
            for _ in range(K)
        ],
    )

    outs = pl.pallas_call(
        functools.partial(_tiled_forward_kernel, orders, period, D, C),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Np, C), jnp.float32) for _ in range(K)
        ],
        interpret=_interpret(),
    )(base, nblk, ent_means, ent_conics, ent_values, ent_tile, s_sorted, s_tile)

    if sorted_outputs:
        return [o[:N] for o in outs]
    # Un-sort back to caller order: sorted row r holds sample s_perm[r].
    # One concatenated gather for all K components (TPU gathers are per-row;
    # wider rows amortize the fixed cost K-fold).
    inv = jnp.zeros((N,), jnp.int32).at[state.s_perm].set(
        jnp.arange(N, dtype=jnp.int32)
    )
    packed = jnp.concatenate([o[:N] for o in outs], axis=1)[inv]
    return [packed[:, k * C : (k + 1) * C] for k in range(K)]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _tiled_backward_kernel(orders, period, D, C, K, base_ref, nblk_ref, *refs):
    (means_ref, conics_ref, values_t_ref, ent_tile_ref, samples_ref,
     s_tile_ref) = refs[:6]
    g_refs = refs[6 : 6 + K]
    dmeans_ref, dvalues_ref, dconics_ref = refs[6 + K :]
    j, w = pl.program_id(0), pl.program_id(1)

    @pl.when(w == 0)
    def _init():
        dmeans_ref[...] = jnp.zeros_like(dmeans_ref)
        dvalues_ref[...] = jnp.zeros_like(dvalues_ref)
        dconics_ref[...] = jnp.zeros_like(dconics_ref)

    @pl.when(w < nblk_ref[j])
    def _compute():
        _backward_body(
            orders, period, D, C, means_ref, conics_ref, values_t_ref,
            samples_ref, g_refs, dmeans_ref, dvalues_ref, dconics_ref,
            mask_fn=lambda: _tile_mask(s_tile_ref, ent_tile_ref),
        )


def tiled_backward(
    orders: Tuple[str, ...],
    period: Optional[float],
    means, values, conics, samples,
    gs: Sequence[jnp.ndarray],  # K x (N, C) cotangents, original order
    state: BinningState,
    base: jnp.ndarray,     # (EB,) sample-block base per entry block
    nblk: jnp.ndarray,     # (EB,) sample-block sweep length per entry block
    work_blocks: int,
    *,
    block_n: int = 128,
    block_e: int = 256,
    gs_sorted: bool = False,
    ent=None,
    smp=None,
):
    """Deterministic per-entry gradients + segment-sum by gaussian id.

    ``gs_sorted=True`` means the cotangents already arrive in tile-sorted
    sample order (the forward ran with sorted_outputs=True)."""
    N, D = samples.shape
    P, C = values.shape
    K = total_components(orders, D)
    tri = tri_size(D)

    gid, ent_tile, ent_means, ent_values, ent_conics, Ep = (
        ent if ent is not None
        else prepare_entries(state, means, values, conics, block_e)
    )
    ent_values_t = ent_values.T  # (C, Ep)
    s_sorted, s_tile, Np = (
        smp if smp is not None else prepare_samples(state, samples, block_n)
    )
    if gs_sorted:
        gs_s = [_pad_axis(g, 0, Np) for g in gs]
    else:
        # One concatenated permute-gather for all K cotangents.
        packed = jnp.concatenate(list(gs), axis=1)[state.s_perm]
        gs_s = [
            _pad_axis(packed[:, k * C : (k + 1) * C], 0, Np) for k in range(K)
        ]

    EB = Ep // block_e
    NBmax = Np // block_n
    base = jnp.clip(_pad_axis(base, 0, EB), 0, NBmax - 1)
    nblk = _pad_axis(nblk, 0, EB)

    # Same skip-DMA clamp as the forward sweep.
    def _s(j, w, base_ref, nblk_ref):
        w_eff = jnp.minimum(w, jnp.maximum(nblk_ref[j] - 1, 0))
        return jnp.minimum(base_ref[j] + w_eff, NBmax - 1)

    def sidx(j, w, base_ref, nblk_ref):
        return (0, _s(j, w, base_ref, nblk_ref))

    def sidx_rows(j, w, base_ref, nblk_ref):
        return (_s(j, w, base_ref, nblk_ref), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(EB, work_blocks),
        in_specs=[
            pl.BlockSpec((D, block_e), lambda j, w, b, n: (0, j)),
            pl.BlockSpec((tri, block_e), lambda j, w, b, n: (0, j)),
            pl.BlockSpec((C, block_e), lambda j, w, b, n: (0, j)),
            pl.BlockSpec((1, block_e), lambda j, w, b, n: (0, j)),
            pl.BlockSpec((D, block_n), sidx),
            pl.BlockSpec((1, block_n), sidx),
        ]
        + [pl.BlockSpec((block_n, C), sidx_rows) for _ in range(K)],
        out_specs=[
            pl.BlockSpec((D, block_e), lambda j, w, b, n: (0, j)),
            pl.BlockSpec((C, block_e), lambda j, w, b, n: (0, j)),
            pl.BlockSpec((tri, block_e), lambda j, w, b, n: (0, j)),
        ],
    )

    d_ent_means, d_ent_values_t, d_ent_conics = pl.pallas_call(
        functools.partial(_tiled_backward_kernel, orders, period, D, C, K),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((D, Ep), jnp.float32),
            jax.ShapeDtypeStruct((C, Ep), jnp.float32),
            jax.ShapeDtypeStruct((tri, Ep), jnp.float32),
        ],
        interpret=_interpret(),
    )(base, nblk, ent_means, ent_conics, ent_values_t, ent_tile, s_sorted,
      s_tile, *gs_s)

    # Deterministic scatter: segment-sum entry gradients by gaussian id
    # (replaces backward.cu's atomicAdd on dL_dmeans/values/conics).
    seg = functools.partial(
        jax.ops.segment_sum, segment_ids=gid, num_segments=P + 1
    )
    d_means = seg(d_ent_means.T)[:P]
    d_values = seg(d_ent_values_t.T)[:P]
    d_conics = seg(d_ent_conics.T)[:P]
    return d_means, d_values, d_conics
