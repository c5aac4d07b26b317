"""Pallas TPU kernels for the neighbor-aggregation subsystem.

TPU-native replacement for the CUDA aggregation kernels
(/root/reference/aggregate_neighbors.cu): findCollisions (18-55) +
preprocess (57-127) become a tile-binned pair sweep that computes the
per-center total density (``totals``); aggregateNeighbors (129-208) becomes
a center-major work-list kernel (``forward``); aggregateNeighborsBackward
(210-321) becomes two kernels - entry-major for the per-neighbor gradients
(features, keys) and center-major for the per-center / global ones (queries,
distance_transform, frequencies).  Per-entry gradient rows are segment-summed
by gaussian id outside (deterministic, unlike the reference's atomicAdd
storm); the LxL transform and its gradient are single XLA matmuls outside
(exact: the transform is linear and applied per center).

Nothing per-pair is materialized through HBM: offsets, densities, attention
weights and the sinusoidal codes are recomputed in VMEM in each direction
(the XLA stand-in materialized (P, NC, .) neighbor tables plus their autodiff
residuals - that traffic was the entire aggregation bottleneck).

Orientation mirrors kernels/tiled.py: the output's axis rides the lanes
(center-major kernels emit (rows, Np); the entry-major kernel emits
(rows, Ep)), all geometry is packed lane-major, and the work-list grid runs
one step per real (row-block, col-block) pair.

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

# Packed per-center geometry rows: mean (D), then r_eff / inv_norm /
# inv_tot, then the K query rows (the scalar tail sits before the queries so
# the totals kernel - which runs before queries exist - shares the layout).
R_REFF, R_INVNORM, R_INVTOT = 0, 1, 2


def ctr_rows(D: int, K: int) -> int:
    return D + 3 + K


def ent_geo_rows(D: int) -> int:
    """Static per-entry geometry rows: shifted mean (D), conic (tri),
    r_eff (1)."""
    return D + tri_size(D) + 1


def _pair(D, period, ent_ref, ctr_ref, ent_tile_ref, ctr_tile_ref,
          orient: str):
    """Shared per-pair quantities: wrapped offsets X = mu_entry - mu_center
    and the density G zeroed outside the collision mask.

    orient="pn": entries ride the sublanes -> (BP, BN) arrays;
    orient="np": entries ride the lanes    -> (BN, BP) arrays.
    """
    tri = tri_size(D)
    if orient == "pn":
        e = lambda row: ent_ref[row, :][:, None]
        c = lambda row: ctr_ref[row, :][None, :]
        e_t = ent_tile_ref[0, :][:, None]
        c_t = ctr_tile_ref[0, :][None, :]
    else:
        e = lambda row: ent_ref[row, :][None, :]
        c = lambda row: ctr_ref[row, :][:, None]
        e_t = ent_tile_ref[0, :][None, :]
        c_t = ctr_tile_ref[0, :][:, None]
    Xs = [formulas.wrap(e(d) - c(d), period) for d in range(D)]
    con = [e(D + t) for t in range(tri)]
    G, _ = formulas.power_terms(Xs, con)
    r_j = e(D + tri)
    r_i = c(D + R_REFF)
    dist2 = sum(x * x for x in Xs)
    rr = r_i + r_j
    mask = (
        (e_t == c_t) & (r_j >= 1e-6) & (r_i >= 1e-6) & (dist2 <= rr * rr)
    )
    return Xs, jnp.where(mask, G, 0.0), e, c


def _sincode(D, nfreq, Xn, dtf_ref, E, want_terms: bool):
    """Sinusoidal positional code (aggregate_neighbors.cu:178-193).

    Returns (emb, fac, terms); terms[(d, e)] = (s, c, i0) kept only when the
    backward needs them for the dt/frequency gradients."""
    stride = (E - 1) // D
    shape = Xn[0].shape
    emb = jnp.full(shape, dtf_ref[0, E - 1])
    fac = jnp.full(shape, dtf_ref[0, 2 * E - 1])
    terms = {}
    for d in range(D):
        for e in range(nfreq):
            phase = (dtf_ref[0, 2 * E + e] * jnp.pi) * Xn[d]
            s, cs = jnp.sin(phase), jnp.cos(phase)
            i0 = d * stride + 2 * e
            emb = emb + s * dtf_ref[0, i0] + cs * dtf_ref[0, i0 + 1]
            fac = fac + s * dtf_ref[0, E + i0] + cs * dtf_ref[0, E + i0 + 1]
            if want_terms:
                terms[(d, e)] = (s, cs, i0)
    return emb, fac, terms


def _maps(block_rows, block_cols):
    def col_map(w, a, c):
        return (0, c[w])

    def row_map(w, a, c):
        return (0, a[w] >> 2)

    def row_map_r(w, a, c):
        return (a[w] >> 2, 0)

    def rep_map(w, a, c):
        return (0, 0)

    return col_map, row_map, row_map_r, rep_map


# ---------------------------------------------------------------------------
# Totals (preprocess): per-center sum of neighbor densities
# ---------------------------------------------------------------------------


def _totals_kernel(D, period, *refs):
    aux_ref = refs[0]
    ent_ref, ent_tile_ref, ctr_ref, ctr_tile_ref, out_ref = refs[2:]
    a_w = aux_ref[pl.program_id(0)]

    @pl.when((a_w & 2) != 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        _, G, _, _ = _pair(D, period, ent_ref, ctr_ref, ent_tile_ref,
                           ctr_tile_ref, "pn")
        out_ref[...] += jnp.sum(G, axis=0, keepdims=True)


def totals(D: int, period, wl, ent_geo, ent_tile, ctr_geo, ctr_tile,
           *, block_n: int, block_e: int) -> jnp.ndarray:
    """(1, Np) per-center total density (aggregate_neighbors.cu:120-125).
    ``ctr_geo``'s inv_tot row is not read (it is what this computes)."""
    aux, col = wl
    Np = ctr_geo.shape[1]
    col_map, row_map, _, _ = _maps(block_e, block_n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(aux.shape[0],),
        in_specs=[
            pl.BlockSpec((ent_geo.shape[0], block_e), col_map),
            pl.BlockSpec((1, block_e), col_map),
            pl.BlockSpec((ctr_geo.shape[0], block_n), row_map),
            pl.BlockSpec((1, block_n), row_map),
        ],
        out_specs=pl.BlockSpec((1, block_n), row_map),
    )
    return pl.pallas_call(
        functools.partial(_totals_kernel, D, period),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, Np), jnp.float32),
        interpret=_interpret(),
    )(aux, col, ent_geo, ent_tile, ctr_geo, ctr_tile)


# ---------------------------------------------------------------------------
# Forward: raw pre-activation rows per center
# ---------------------------------------------------------------------------


def _forward_kernel(D, L, K, nfreq, E, period, *refs):
    aux_ref = refs[0]
    (ent_ref, ent_tile_ref, ent_fk_ref, ctr_ref, ctr_tile_ref,
     dtf_ref, out_ref) = refs[2:]
    a_w = aux_ref[pl.program_id(0)]

    @pl.when((a_w & 2) != 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        Xs, G, e, c = _pair(D, period, ent_ref, ctr_ref, ent_tile_ref,
                            ctr_tile_ref, "pn")
        fk = lambda row: ent_fk_ref[row, :][:, None]
        w = None
        for k in range(K):
            t = fk(L + k) * c(D + 3 + k)
            w = t if w is None else w + t
        inv_norm = c(D + R_INVNORM)
        inv_tot = c(D + R_INVTOT)
        Xn = [x * inv_norm for x in Xs]
        emb, fac, _ = _sincode(D, nfreq, Xn, dtf_ref, E, False)
        coeff = G * w * inv_tot                      # (BP, BN)
        # pre rows: features (L, BP) @ (coeff * fac) (BP, BN) on the MXU,
        # plus the embedding's broadcast row (the same scalar feeds every
        # output channel - aggregate_neighbors.cu:198-205).
        pre = jnp.dot(ent_fk_ref[:L, :], coeff * fac,
                      preferred_element_type=jnp.float32)
        out_ref[...] += pre + jnp.sum(coeff * emb, axis=0, keepdims=True)


def forward(D: int, L: int, K: int, nfreq: int, period,
            wl, ent_geo, ent_tile, ent_fk, ctr_geo, ctr_tile, dtf,
            *, block_n: int, block_e: int) -> jnp.ndarray:
    """(L, Np) raw pre-activation (before the LxL transform - one XLA
    matmul outside, exact because the transform is linear)."""
    aux, col = wl
    Np = ctr_geo.shape[1]
    E = (dtf.shape[1] - nfreq) // 2
    col_map, row_map, _, rep_map = _maps(block_e, block_n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(aux.shape[0],),
        in_specs=[
            pl.BlockSpec((ent_geo.shape[0], block_e), col_map),
            pl.BlockSpec((1, block_e), col_map),
            pl.BlockSpec((L + K, block_e), col_map),
            pl.BlockSpec((ctr_geo.shape[0], block_n), row_map),
            pl.BlockSpec((1, block_n), row_map),
            pl.BlockSpec((1, dtf.shape[1]), rep_map),
        ],
        out_specs=pl.BlockSpec((L, block_n), row_map),
    )
    return pl.pallas_call(
        functools.partial(_forward_kernel, D, L, K, nfreq, E, period),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, Np), jnp.float32),
        interpret=_interpret(),
    )(aux, col, ent_geo, ent_tile, ent_fk, ctr_geo, ctr_tile, dtf)


# ---------------------------------------------------------------------------
# Backward, entry-major: dL/dfeatures, dL/dkeys rows per entry
# ---------------------------------------------------------------------------


def _bwd_entries_kernel(D, L, K, nfreq, E, period, *refs):
    aux_ref = refs[0]
    (ent_ref, ent_tile_ref, ent_fk_ref, ctr_ref, ctr_tile_ref,
     dtf_ref, gpre_r_ref, gpre_ref, gsum_ref, dent_ref) = refs[2:]
    a_w = aux_ref[pl.program_id(0)]

    @pl.when((a_w & 2) != 0)
    def _init():
        dent_ref[...] = jnp.zeros_like(dent_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        # (BN centers, BP entries): outputs ride the entry lanes.
        Xs, G, e, c = _pair(D, period, ent_ref, ctr_ref, ent_tile_ref,
                            ctr_tile_ref, "np")
        # w = <q_i, k_j> unrolled over the K (static, small) channels: K
        # broadcast FMAs on the VPU beat a transposed-lhs MXU dot at K ~ 8
        # (aggregate_neighbors.cu:173-176).
        w = None
        for k in range(K):
            t = ent_fk_ref[L + k, :][None, :] * ctr_ref[D + 3 + k, :][:, None]
            w = t if w is None else w + t
        inv_norm = ctr_ref[D + R_INVNORM, :][:, None]       # (BN, 1)
        Xn = [x * inv_norm for x in Xs]
        emb, fac, _ = _sincode(D, nfreq, Xn, dtf_ref, E, False)
        # The cotangent arrives pre-scaled by inv_tot_i (see module
        # docstring), so coeff here is G * w only.
        cf = G * w * fac                                     # (BN, BP)
        # dL/dfeat_j[l] = sum_i cf * gpre[l, i]   (MXU)
        dfeat = jnp.dot(gpre_ref[...], cf,
                        preferred_element_type=jnp.float32)  # (L, BP)
        # gdotf[n, p] = sum_l gpre[n, l] * feat[l, p]
        gdotf = jnp.dot(gpre_r_ref[...], ent_fk_ref[:L, :],
                        preferred_element_type=jnp.float32)  # (BN, BP)
        dw = G * (fac * gdotf + emb * gsum_ref[0, :][:, None])
        # dL/dkey_j[k] = sum_i dw * q_i[k]
        dkey_rows = []
        for k in range(K):
            dkey_rows.append(jnp.sum(
                ctr_ref[D + 3 + k, :][:, None] * dw, axis=0, keepdims=True))
        dent_ref[...] += jnp.concatenate([dfeat] + dkey_rows, axis=0)


def bwd_entries(D: int, L: int, K: int, nfreq: int, period,
                wl, ent_geo, ent_tile, ent_fk, ctr_geo, ctr_tile, dtf,
                gpre_rows, gpre, gsum,
                *, block_n: int, block_e: int) -> jnp.ndarray:
    """(L + K, Ep) per-entry gradient rows: dfeatures rows then dkeys rows.
    The caller segment-sums by gaussian id.  ``gpre_rows``/(Np, L) and
    ``gpre``/(L, Np) are the transform-chained cotangent in both
    orientations, ALREADY scaled by inv_total per center; ``gsum`` is its
    (1, Np) channel sum."""
    aux, col = wl
    Ep = ent_geo.shape[1]
    E = (dtf.shape[1] - nfreq) // 2
    col_map, row_map, _, rep_map = _maps(block_e, block_n)

    def col_map_r(w, a, c):
        return (c[w], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(aux.shape[0],),
        in_specs=[
            pl.BlockSpec((ent_geo.shape[0], block_e), row_map),
            pl.BlockSpec((1, block_e), row_map),
            pl.BlockSpec((L + K, block_e), row_map),
            pl.BlockSpec((ctr_geo.shape[0], block_n), col_map),
            pl.BlockSpec((1, block_n), col_map),
            pl.BlockSpec((1, dtf.shape[1]), rep_map),
            pl.BlockSpec((block_n, L), col_map_r),
            pl.BlockSpec((L, block_n), col_map),
            pl.BlockSpec((1, block_n), col_map),
        ],
        out_specs=pl.BlockSpec((L + K, block_e), row_map),
    )
    return pl.pallas_call(
        functools.partial(_bwd_entries_kernel, D, L, K, nfreq, E, period),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L + K, Ep), jnp.float32),
        interpret=_interpret(),
    )(aux, col, ent_geo, ent_tile, ent_fk, ctr_geo, ctr_tile, dtf,
      gpre_rows, gpre, gsum)


# ---------------------------------------------------------------------------
# Backward, center-major: dL/dqueries + dt/frequency gradient rows
# ---------------------------------------------------------------------------


def _bwd_centers_kernel(D, L, K, nfreq, E, period, *refs):
    aux_ref = refs[0]
    (ent_ref, ent_tile_ref, ent_fk_ref, ent_f_rows_ref, ctr_ref,
     ctr_tile_ref, dtf_ref, gpre_ref, gsum_ref, out_ref) = refs[2:]
    a_w = aux_ref[pl.program_id(0)]

    @pl.when((a_w & 2) != 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        # (BP entries, BN centers): outputs ride the center lanes.
        Xs, G, e, c = _pair(D, period, ent_ref, ctr_ref, ent_tile_ref,
                            ctr_tile_ref, "pn")
        fk = lambda row: ent_fk_ref[row, :][:, None]
        w = None
        for k in range(K):
            t = fk(L + k) * c(D + 3 + k)
            w = t if w is None else w + t
        inv_norm = c(D + R_INVNORM)
        Xn = [x * inv_norm for x in Xs]
        emb, fac, terms = _sincode(D, nfreq, Xn, dtf_ref, E, True)
        # gdotf[p, n] = sum_l feat[l, p] * gpre[l, n]   (MXU, row-major lhs)
        gdotf = jnp.dot(ent_f_rows_ref[...], gpre_ref[...],
                        preferred_element_type=jnp.float32)  # (BP, BN)
        gsum = gsum_ref[0, :][None, :]
        dw = G * (fac * gdotf + emb * gsum)
        # dL/dq_i[k] = sum_j dw * key_j[k]
        rows = [
            jnp.sum(fk(L + k) * dw, axis=0, keepdims=True) for k in range(K)
        ]
        # dt / frequency gradients (aggregate_neighbors.cu:270-317): the
        # pair cotangents on the embedding / factor codes.
        cw = G * w
        cemb = cw * gsum                                     # (BP, BN)
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
        zero = jnp.zeros_like(rows[0])
        for t in ddt + dfreq:
            rows.append(zero if t is None else
                        jnp.sum(t, axis=0, keepdims=True))
        out_ref[...] += jnp.concatenate(rows, axis=0)


def _racc(acc, x):
    return x if acc is None else acc + x


def bwd_centers(D: int, L: int, K: int, nfreq: int, period,
                wl, ent_geo, ent_tile, ent_fk, ent_f_rows, ctr_geo, ctr_tile,
                dtf, gpre, gsum,
                *, block_n: int, block_e: int) -> jnp.ndarray:
    """(K + 2E + nfreq, Np) per-center gradient rows: dqueries rows, then
    per-center partial sums of d(distance_transform) and d(frequencies)
    (reduce over Np outside).  Cotangent inputs pre-scaled by inv_total."""
    aux, col = wl
    Np = ctr_geo.shape[1]
    E = (dtf.shape[1] - nfreq) // 2
    col_map, row_map, _, rep_map = _maps(block_e, block_n)

    def col_map_r(w, a, c):
        return (c[w], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(aux.shape[0],),
        in_specs=[
            pl.BlockSpec((ent_geo.shape[0], block_e), col_map),
            pl.BlockSpec((1, block_e), col_map),
            pl.BlockSpec((L + K, block_e), col_map),
            pl.BlockSpec((block_e, L), col_map_r),
            pl.BlockSpec((ctr_geo.shape[0], block_n), row_map),
            pl.BlockSpec((1, block_n), row_map),
            pl.BlockSpec((1, dtf.shape[1]), rep_map),
            pl.BlockSpec((L, block_n), row_map),
            pl.BlockSpec((1, block_n), row_map),
        ],
        out_specs=pl.BlockSpec((K + 2 * E + nfreq, block_n), row_map),
    )
    return pl.pallas_call(
        functools.partial(_bwd_centers_kernel, D, L, K, nfreq, E, period),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K + 2 * E + nfreq, Np), jnp.float32),
        interpret=_interpret(),
    )(aux, col, ent_geo, ent_tile, ent_fk, ent_f_rows, ctr_geo, ctr_tile,
      dtf, gpre, gsum)
