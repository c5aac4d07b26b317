"""Pallas TPU kernels for the neighbor-aggregation subsystem.

TPU-native replacement for the CUDA aggregation kernels
(/root/reference/aggregate_neighbors.cu): findCollisions (18-55) +
preprocess (57-127) become a tile-binned pair sweep that computes the
per-center total density (``totals``); aggregateNeighbors (129-208) becomes
the center-chunk work-list kernel (``forward``); aggregateNeighborsBackward
(210-321) becomes two kernels - entry-chunk-major for the per-neighbor
gradients (features, keys) and center-chunk-major for the per-center /
global ones (queries, distance_transform, frequencies).  Per-entry gradient
rows are segment-summed by gaussian id outside (deterministic, unlike the
reference's atomicAdd storm); the LxL transform and its gradient are single
XLA matmuls outside (exact: the transform is linear and applied per center).

Nothing per-pair is materialized through HBM: offsets, densities, attention
weights and the sinusoidal codes are recomputed in VMEM in each direction
(the XLA stand-in materialized (P, NC, .) neighbor tables plus their
autodiff residuals - that traffic was the entire aggregation bottleneck).

All kernels share ONE pair-block orientation: centers ride the SUBLANES
(chunks of ``block_n``, default 16-32), entries ride the LANES (chunks of
``block_e`` = 128).  Both sides are padded per tile (binning/chunked.py) so
every work item is a same-tile (center-chunk x entry-chunk) pair - the
measured same-tile pair density is ~50-60% versus ~9% for range-overlap
block pairing at this workload's ~100 entries / ~30 centers per tile.  The
asymmetric chunk shape matches that occupancy ratio.  Because items are
same-tile by construction and pad slots gather the zero sentinel row
(radius 0), no per-pair tile comparison is needed - the alive-radius mask
alone is exact.

Semantics replicated exactly (same as ops/aggregation.py, which is pinned to
a numpy replica of the CUDA kernels in tests/test_aggregation.py):
  * collision iff |wrap(mu_j - mu_i)| <= 0.2 (r_i + r_j), both alive
    (aggregate_neighbors.cu:28-46, with the true minimum-image distance -
    the documented deviation of ops/aggregation.py);
  * density = exp(power) from the NEIGHBOR's conic on the unnormalized
    offset, zero when power > 0 (lines 107-120);
  * total-density normalization 1/(sum + 1e-6) (line 125) - a per-center
    scalar, carried in the center geometry for the forward and folded into
    the cotangent for the backward (every contribution of center i is linear
    in inv_total_i);
  * offsets normalized by 1/(0.333 r_i + 1e-6) before the sinusoidal code
    (lines 74-75); code layout dt[d*stride + 2e + {0,1}], biases at
    dt[E-1] / dt[2E-1] (lines 178-193).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import tri_size
from ..ops import formulas
from .dense import _interpret

# Center-geometry column layout: mean (D), then r_eff / inv_norm / inv_tot,
# then the K query columns (the scalar tail sits before the queries so the
# totals kernel - which runs before queries exist - shares the layout).
C_REFF, C_INVNORM, C_INVTOT = 0, 1, 2


def ctr_cols(D: int, K: int) -> int:
    return D + 3 + K


def ent_geo_rows(D: int) -> int:
    """Static per-entry geometry rows: shifted mean (D), conic (tri),
    r_eff (1)."""
    return D + tri_size(D) + 1


def _pair(D, period, ent_ref, ctr_ref):
    """Shared per-pair quantities: wrapped offsets X = mu_entry - mu_center
    and the density G zeroed outside the collision mask.  Centers ride the
    sublanes, entries the lanes: all pair arrays are (Bc, Be).  Work items
    pair same-tile chunks only, and pad slots carry the zero sentinel row
    (radius 0), so the alive-radius + distance mask is exact."""
    tri = tri_size(D)
    e = lambda row: ent_ref[row, :][None, :]       # (1, Be)
    c = lambda col: ctr_ref[:, col][:, None]       # (Bc, 1)
    Xs = [formulas.wrap(e(d) - c(d), period) for d in range(D)]
    con = [e(D + t) for t in range(tri)]
    G, _ = formulas.power_terms(Xs, con)
    r_j = e(D + tri)
    r_i = c(D + C_REFF)
    dist2 = sum(x * x for x in Xs)
    rr = r_i + r_j
    mask = (r_j >= 1e-6) & (r_i >= 1e-6) & (dist2 <= rr * rr)
    return Xs, jnp.where(mask, G, 0.0), e, c


def _sincode(D, nfreq, Xn, dtf_ref, E, want_terms: bool,
             ladder: bool = False):
    """Sinusoidal positional code (aggregate_neighbors.cu:178-193).

    Returns (emb, fac, terms); terms[(d, e)] = (s, c, i0) kept only when the
    backward needs them for the dt/frequency gradients.

    ``ladder`` is the caller's certification that the frequencies form the
    exact integer ladder frequencies[e] == (e+1) * frequencies[0] (the
    standard sinusoidal-embedding parameterization, and how
    models/dynamics.py initializes them).  Then only the BASE phase needs
    transcendentals: sin/cos of every higher rung follow from the
    angle-addition recurrence s_{e+1} = s_e c_1 + c_e s_1,
    c_{e+1} = c_e c_1 - s_e s_1 (4 FMAs) - the 2*nfreq*D per-pair sin/cos
    were measured at 8.1 of 26.7 ms per step at P=100k, and a generic fused
    sincos polynomial has no headroom (~30 VPU ops vs the builtins' ~29);
    exploiting the ladder structure is the only way to remove them.  The
    frequency GRADIENTS are per-rung partials either way (the chain to a
    shared base scalar composes outside by autodiff)."""
    stride = (E - 1) // D
    shape = Xn[0].shape
    emb = jnp.full(shape, dtf_ref[0, E - 1])
    fac = jnp.full(shape, dtf_ref[0, 2 * E - 1])
    terms = {}
    for d in range(D):
        s = cs = s1 = c1 = None
        for e in range(nfreq):
            if ladder and e > 0:
                s, cs = s * c1 + cs * s1, cs * c1 - s * s1
            else:
                phase = (dtf_ref[0, 2 * E + e] * jnp.pi) * Xn[d]
                s, cs = jnp.sin(phase), jnp.cos(phase)
                if ladder:
                    s1, c1 = s, cs
            i0 = d * stride + 2 * e
            emb = emb + s * dtf_ref[0, i0] + cs * dtf_ref[0, i0 + 1]
            fac = fac + s * dtf_ref[0, E + i0] + cs * dtf_ref[0, E + i0 + 1]
            if want_terms:
                terms[(d, e)] = (s, cs, i0)
    return emb, fac, terms


def _queries_w(D, L, K, ent_fk_ref, c):
    """w = <q_i, k_j> unrolled over the K (static, small) channels: K
    broadcast FMAs on the VPU beat a transposed-lhs MXU dot at K ~ 8
    (aggregate_neighbors.cu:173-176).  Queries start at center column
    D + 3."""
    w = None
    for k in range(K):
        t = ent_fk_ref[L + k, :][None, :] * c(D + 3 + k)
        w = t if w is None else w + t
    return w


def _dotg(a, b):
    """(Bc, X) @ (X, Be) MXU dot with fp32 accumulate."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot_nt(a, b):
    """Contract the LANE dims of both operands: (Bc, Be) x (X, Be) ->
    (Bc, X)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot_tn(a, b):
    """Contract the SUBLANE dims of both operands: (Bc, X) x (Bc, Be) ->
    (X, Be).  The implicit lhs transpose is a (Bc, X) tile shuffle - tiny at
    X = L; cheaper than carrying a second (X, Cp) cotangent layout whose
    (X, Bc) blocks the TPU lowering rejects (lane dim < 128)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# Totals (preprocess): per-center sum of neighbor densities
# ---------------------------------------------------------------------------


def _totals_kernel(D, period, *refs):
    aux_ref = refs[0]
    ent_ref, ctr_ref, out_ref = refs[2:]
    a_w = aux_ref[pl.program_id(0)]

    @pl.when((a_w & 2) != 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        _, G, _, _ = _pair(D, period, ent_ref, ctr_ref)
        out_ref[...] += jnp.sum(G, axis=1, keepdims=True)


def totals(D: int, period, wl, ent_geo, ctr_geo,
           *, block_n: int, block_e: int) -> jnp.ndarray:
    """(Cp, 1) per-center total density (aggregate_neighbors.cu:120-125).
    ``ctr_geo``'s inv_tot column is not read (it is what this computes)."""
    aux, col = wl
    Cp = ctr_geo.shape[0]

    def col_map(w, a, c):
        return (0, c[w])

    def row_map(w, a, c):
        return (a[w] >> 2, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(aux.shape[0],),
        in_specs=[
            pl.BlockSpec((ent_geo.shape[0], block_e), col_map),
            pl.BlockSpec((block_n, ctr_geo.shape[1]), row_map),
        ],
        out_specs=pl.BlockSpec((block_n, 1), row_map),
    )
    return pl.pallas_call(
        functools.partial(_totals_kernel, D, period),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Cp, 1), jnp.float32),
        interpret=_interpret(),
    )(aux, col, ent_geo, ctr_geo)


# ---------------------------------------------------------------------------
# Forward: raw pre-activation rows per center
# ---------------------------------------------------------------------------


def _forward_kernel(D, L, K, nfreq, E, period, ladder, with_totals, *refs):
    aux_ref = refs[0]
    if with_totals:
        ent_ref, ent_fk_ref, ctr_ref, dtf_ref, out_ref, tot_ref = refs[2:]
    else:
        ent_ref, ent_fk_ref, ctr_ref, dtf_ref, out_ref = refs[2:]
    a_w = aux_ref[pl.program_id(0)]

    @pl.when((a_w & 2) != 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        if with_totals:
            tot_ref[...] = jnp.zeros_like(tot_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        Xs, G, e, c = _pair(D, period, ent_ref, ctr_ref)
        w = _queries_w(D, L, K, ent_fk_ref, c)
        inv_norm = c(D + C_INVNORM)
        inv_tot = c(D + C_INVTOT)
        Xn = [x * inv_norm for x in Xs]
        emb, fac, _ = _sincode(D, nfreq, Xn, dtf_ref, E, False, ladder)
        if with_totals:
            # Fused-totals mode: the structure's inv_tot column is 1.0; the
            # caller scales the (linear-in-inv_tot) output rows outside
            # with the totals emitted here - removing the separate totals
            # pair sweep from every training step (the reference recomputes
            # total densities in every preprocess too,
            # aggregate_neighbors.cu:120-125).
            tot_ref[...] += jnp.sum(G, axis=1, keepdims=True)
        coeff = G * w * inv_tot                      # (Bc, Be)
        # pre[c, l] = sum_e (coeff * fac)[c, e] * feat[l, e] on the MXU,
        # plus the embedding's broadcast column (the same scalar feeds every
        # output channel - aggregate_neighbors.cu:198-205).  At tiny L the
        # MXU dot is replaced by L lane reductions: broadcast FMAs beat the
        # transposed dot there, and Mosaic rejects accumulating matmuls
        # with < 8 output lanes ("only constant accumulators supported").
        cfac = coeff * fac
        if L < 8:
            pre = jnp.concatenate(
                [jnp.sum(cfac * ent_fk_ref[l, :][None, :],
                         axis=1, keepdims=True) for l in range(L)],
                axis=1,
            )
        else:
            pre = _dot_nt(cfac, ent_fk_ref[:L, :])
        out_ref[...] += pre + jnp.sum(coeff * emb, axis=1, keepdims=True)


def forward(D: int, L: int, K: int, nfreq: int, period,
            wl, ent_geo, ent_fk, ctr_geo, dtf,
            *, block_n: int, block_e: int,
            ladder: bool = False, with_totals: bool = False):
    """(Cp, L) raw pre-activation (before the LxL transform - one XLA
    matmul outside, exact because the transform is linear).

    ``with_totals`` additionally returns the (Cp, 1) per-center total
    density from the SAME pair sweep (the structure's inv_tot column must
    then be 1.0; the caller applies the normalization outside - every
    center's row is linear in its inv_total)."""
    aux, col = wl
    Cp = ctr_geo.shape[0]
    E = (dtf.shape[1] - nfreq) // 2

    def col_map(w, a, c):
        return (0, c[w])

    def row_map(w, a, c):
        return (a[w] >> 2, 0)

    def rep_map(w, a, c):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(aux.shape[0],),
        in_specs=[
            pl.BlockSpec((ent_geo.shape[0], block_e), col_map),
            pl.BlockSpec((L + K, block_e), col_map),
            pl.BlockSpec((block_n, ctr_geo.shape[1]), row_map),
            pl.BlockSpec((1, dtf.shape[1]), rep_map),
        ],
        out_specs=(
            [pl.BlockSpec((block_n, L), row_map),
             pl.BlockSpec((block_n, 1), row_map)]
            if with_totals else pl.BlockSpec((block_n, L), row_map)
        ),
    )
    out_shape = (
        [jax.ShapeDtypeStruct((Cp, L), jnp.float32),
         jax.ShapeDtypeStruct((Cp, 1), jnp.float32)]
        if with_totals else jax.ShapeDtypeStruct((Cp, L), jnp.float32)
    )
    return pl.pallas_call(
        functools.partial(_forward_kernel, D, L, K, nfreq, E, period,
                          ladder, with_totals),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(aux, col, ent_geo, ent_fk, ctr_geo, dtf)


# ---------------------------------------------------------------------------
# Backward: ONE fused entry-chunk-major sweep for all parameter gradients
# ---------------------------------------------------------------------------


def _backward_kernel(D, L, K, nfreq, E, period, ladder, *refs):
    """Fused backward (aggregateNeighborsBackward,
    aggregate_neighbors.cu:210-321) in a single pair sweep: the per-entry
    gradient rows (features, keys) accumulate across the entry chunk's
    consecutive work items; the per-center gradients (queries) and global
    partial sums (distance_transform, frequencies) land in a per-ITEM slab
    that the caller segment-sums by center chunk (~5k rows - three orders
    of magnitude cheaper than a second pair sweep recomputing the offsets,
    densities, attention weights and sinusoidal codes)."""
    aux_ref = refs[0]
    (ent_ref, ent_fk_ref, ctr_ref, dtf_ref, gpre_ref, gsum_ref,
     dent_ref, slab_ref) = refs[2:]
    a_w = aux_ref[pl.program_id(0)]

    @pl.when((a_w & 2) != 0)
    def _init():
        dent_ref[...] = jnp.zeros_like(dent_ref)

    slab_ref[...] = jnp.zeros_like(slab_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        Xs, G, e, c = _pair(D, period, ent_ref, ctr_ref)
        w = _queries_w(D, L, K, ent_fk_ref, c)
        inv_norm = c(D + C_INVNORM)
        Xn = [x * inv_norm for x in Xs]
        emb, fac, terms = _sincode(D, nfreq, Xn, dtf_ref, E, True, ladder)
        gsum = gsum_ref[...]
        # The cotangent arrives pre-scaled by inv_tot_i (see module
        # docstring), so coeff here is G * w only.
        cf = G * w * fac                             # (Bc, Be)
        if L < 8:
            # Tiny L: L broadcast FMAs/reductions instead of depth-L MXU
            # dots (faster there, and Mosaic rejects the degenerate dots).
            dfeat = jnp.concatenate(
                [jnp.sum(gpre_ref[:, l][:, None] * cf,
                         axis=0, keepdims=True) for l in range(L)],
                axis=0,
            )                                        # (L, Be)
            gdotf = sum(
                gpre_ref[:, l][:, None] * ent_fk_ref[l, :][None, :]
                for l in range(L)
            )                                        # (Bc, Be)
        else:
            # dL/dfeat_j[l] = sum_i gpre[i, l] * cf[i, j]   (MXU; the tiny
            # (Bc, L) lhs transpose beats transposing a 128-lane operand)
            dfeat = _dot_tn(gpre_ref[...], cf)       # (L, Be)
            # gdotf[i, j] = sum_l gpre[i, l] * feat[l, j]
            gdotf = _dotg(gpre_ref[...], ent_fk_ref[:L, :])   # (Bc, Be)
        dw = G * (fac * gdotf + emb * gsum)
        # dL/dkey_j[k] = sum_i dw[i, j] * q_i[k]
        dkey_rows = [
            jnp.sum(c(D + 3 + k) * dw, axis=0, keepdims=True)
            for k in range(K)
        ]
        dent_ref[...] += jnp.concatenate([dfeat] + dkey_rows, axis=0)

        # Center-side columns: dq, then the per-pair cotangents of the
        # codes (aggregate_neighbors.cu:270-317), lane-reduced per center.
        cols = [
            jnp.sum(ent_fk_ref[L + k, :][None, :] * dw,
                    axis=1, keepdims=True)
            for k in range(K)
        ]
        cw = G * w
        cemb = cw * gsum                                  # (Bc, Be)
        cfac = cw * gdotf
        ddt = [None] * (2 * E)
        dfreq = [None] * nfreq
        for d in range(D):
            for ee in range(nfreq):
                s, cs, i0 = terms[(d, ee)]
                ddt[i0] = _racc(ddt[i0], cemb * s)
                ddt[i0 + 1] = _racc(ddt[i0 + 1], cemb * cs)
                ddt[E + i0] = _racc(ddt[E + i0], cfac * s)
                ddt[E + i0 + 1] = _racc(ddt[E + i0 + 1], cfac * cs)
                dphase = (cemb * (cs * dtf_ref[0, i0] - s * dtf_ref[0, i0 + 1])
                          + cfac * (cs * dtf_ref[0, E + i0]
                                    - s * dtf_ref[0, E + i0 + 1]))
                dfreq[ee] = _racc(dfreq[ee], dphase * (jnp.pi * Xn[d]))
        ddt[E - 1] = _racc(ddt[E - 1], cemb)
        ddt[2 * E - 1] = _racc(ddt[2 * E - 1], cfac)
        zero = jnp.zeros_like(cols[0])
        for t in ddt + dfreq:
            cols.append(zero if t is None else
                        jnp.sum(t, axis=1, keepdims=True))
        slab_ref[...] = jnp.concatenate(cols, axis=1)


def _racc(acc, x):
    return x if acc is None else acc + x


def backward(D: int, L: int, K: int, nfreq: int, period,
             wl, ent_geo, ent_fk, ctr_geo, dtf, gpre, gsum,
             *, block_n: int, block_e: int, ladder: bool = False):
    """One fused backward sweep over the entry-chunk-major work list.

    Returns (dent, slab):
      dent (L + K, Ep)   per-entry gradient rows (dfeatures, dkeys); the
        caller gather-compacts to the sorted entry list and segment-sums by
        gaussian id.
      slab (W * block_n, K + 2E + nfreq)   per-work-item center gradient
        columns (dqueries, then d(distance_transform) / d(frequencies)
        partial sums); the caller segment-sums by the item's center chunk
        (wl col) and reduces the code columns over centers.
    ``gpre``/(Cp, L) is the transform-chained cotangent, ALREADY scaled by
    inv_total per center; ``gsum`` is its (Cp, 1) channel sum."""
    aux, col = wl
    Ep = ent_geo.shape[1]
    E = (dtf.shape[1] - nfreq) // 2
    W = aux.shape[0]
    S = K + 2 * E + nfreq

    def row_map(w, a, c):
        return (0, a[w] >> 2)

    def col_map(w, a, c):
        return (c[w], 0)

    def item_map(w, a, c):
        return (w, 0)

    def rep_map(w, a, c):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((ent_geo.shape[0], block_e), row_map),
            pl.BlockSpec((L + K, block_e), row_map),
            pl.BlockSpec((block_n, ctr_geo.shape[1]), col_map),
            pl.BlockSpec((1, dtf.shape[1]), rep_map),
            pl.BlockSpec((block_n, L), col_map),
            pl.BlockSpec((block_n, 1), col_map),
        ],
        out_specs=[
            pl.BlockSpec((L + K, block_e), row_map),
            pl.BlockSpec((block_n, S), item_map),
        ],
    )
    return pl.pallas_call(
        functools.partial(_backward_kernel, D, L, K, nfreq, E, period,
                          ladder),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L + K, Ep), jnp.float32),
            jax.ShapeDtypeStruct((W * block_n, S), jnp.float32),
        ],
        interpret=_interpret(),
    )(aux, col, ent_geo, ent_fk, ctr_geo, dtf, gpre, gsum)
