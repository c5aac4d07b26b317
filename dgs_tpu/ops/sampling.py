"""Differentiable sampling ops with hand-derived custom VJPs.

This is the TPU-native equivalent of the reference's autograd layer + CUDA
backward kernels (__init__.py:128-162 + backward.cu): each op is a
``jax.custom_vjp`` whose backward produces (dL/dmeans, dL/dvalues,
dL/dconics) exactly as the reference's hand-written kernels do
(sample_points.cu:165-167), and zero for the sample positions (the reference
returns no sample gradient, __init__.py:113-126).

Two execution paths share this interface:
  * ``method="dense"``  - blocked XLA evaluation of all pairs (this module).
  * ``method="tiled"``  - tile-binned Pallas path (kernels/ + binning/).

The fused multi-order op evaluates several derivative orders in one pairwise
pass - the reference must launch 4 separate kernels over the same binning
(sampler_impl.cu:333-364 called once per op); fusing is a TPU-side win.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import n_components, out_shape, tri_size
from . import formulas

ALL_ORDERS = ("value", "derivative", "laplacian", "third")


def _pairwise_context(means, conics, samples, period):
    """Shared per-pair quantities: X (wrapped), conic entries, G, a."""
    N, D = samples.shape
    X = formulas.wrap(means[None, :, :] - samples[:, None, :], period)
    Xs = [X[..., d] for d in range(D)]
    con = [conics[None, :, t] for t in range(tri_size(D))]
    G, a = formulas.power_terms(Xs, con)
    return Xs, con, G, a


def _forward_impl(orders, period, means, values, conics, samples):
    N, D = samples.shape
    P, C = values.shape
    Xs, con, G, a = _pairwise_context(means, conics, samples, period)
    outs = []
    for order in orders:
        comps = formulas.components(order, Xs, con, G, a)
        W = jnp.stack(comps, axis=1)  # (N, k, P)
        out = jnp.einsum("nkp,pc->nkc", W, values,
                         precision=jax.lax.Precision.HIGH)
        outs.append(out.reshape(out_shape(order, N, D, C)))
    return tuple(outs)


def _backward_impl(orders, period, means, values, conics, samples, gs):
    """Closed-form VJP shared by all orders; mirrors backward.cu:108-416."""
    N, D = samples.shape
    P, C = values.shape
    Xs, con, G, a = _pairwise_context(means, conics, samples, period)

    d_means = jnp.zeros((P, D), means.dtype)
    d_values = jnp.zeros((P, C), values.dtype)
    d_conics = jnp.zeros((P, tri_size(D)), conics.dtype)

    for order, g in zip(orders, gs):
        k = n_components(order, D)
        g = g.reshape(N, k, C)
        comps = formulas.components(order, Xs, con, G, a)
        W = jnp.stack(comps, axis=1)  # (N, k, P)
        # dL/dvalues[p,c] = sum_{n,comp} W[n,comp,p] * g[n,comp,c]
        d_values = d_values + jnp.einsum("nkp,nkc->pc", W, g,
                                         precision=jax.lax.Precision.HIGH)
        # h_comp[n,p] = sum_c values[p,c] * g[n,comp,c]   (backward.cu:122)
        H = jnp.einsum("pc,nkc->nkp", values, g,
                       precision=jax.lax.Precision.HIGH)
        hs = [H[:, i, :] for i in range(k)]
        dmu, dcon = formulas.vjp_params(order, Xs, con, G, a, hs)
        d_means = d_means + jnp.stack([m.sum(axis=0) for m in dmu], axis=-1)
        d_conics = d_conics + jnp.stack([c.sum(axis=0) for c in dcon], axis=-1)

    return d_means, d_values, d_conics


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def sample_dense_multi(orders: Tuple[str, ...], period: Optional[float],
                       means, values, conics, samples):
    """Fused multi-order dense evaluation; returns one output per order."""
    return _forward_impl(orders, period, means, values, conics, samples)


def _sample_dense_multi_fwd(orders, period, means, values, conics, samples):
    outs = _forward_impl(orders, period, means, values, conics, samples)
    return outs, (means, values, conics, samples)


def _sample_dense_multi_bwd(orders, period, res, gs):
    means, values, conics, samples = res
    d_means, d_values, d_conics = _backward_impl(
        orders, period, means, values, conics, samples, gs
    )
    return d_means, d_values, d_conics, jnp.zeros_like(samples)


sample_dense_multi.defvjp(_sample_dense_multi_fwd, _sample_dense_multi_bwd)


def sample_dense(order: str, means, values, conics, samples,
                 *, period: Optional[float] = 2.0):
    """Single-order dense evaluation (value/derivative/laplacian/third)."""
    (out,) = sample_dense_multi((order,), period, means, values, conics, samples)
    return out


def sample_dense_all(means, values, conics, samples, *, period=2.0,
                     orders: Sequence[str] = ALL_ORDERS):
    outs = sample_dense_multi(tuple(orders), period, means, values, conics, samples)
    return dict(zip(orders, outs))


# ---------------------------------------------------------------------------
# Pallas-kernel path (same interface, Pallas dense kernels underneath)
# ---------------------------------------------------------------------------


def _split_orders(orders, comp_list, N, D, C):
    """Assemble the kernels' per-component (N, C) arrays into per-order
    output tensors (value (N,C) ... third (N,D,D,D,C))."""
    outs = []
    k0 = 0
    for order in orders:
        k = n_components(order, D)
        stacked = jnp.stack(comp_list[k0 : k0 + k], axis=1)  # (N, k, C)
        outs.append(stacked.reshape(out_shape(order, N, D, C)))
        k0 += k
    return tuple(outs)


def _split_cotangents(orders, gs, N, D, C):
    """Per-order cotangent tensors -> flat list of per-component (N, C)."""
    parts = []
    for order, g in zip(orders, gs):
        k = n_components(order, D)
        g = g.reshape(N, k, C)
        parts.extend(g[:, i, :] for i in range(k))
    return parts


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def sample_pallas_multi(orders: Tuple[str, ...], period: Optional[float],
                        means, values, conics, samples):
    """Fused multi-order evaluation via the Pallas dense kernels."""
    from ..kernels import dense as kdense

    N, D = samples.shape
    C = values.shape[1]
    stacked = kdense.dense_forward(orders, period, means, values, conics, samples)
    return _split_orders(orders, stacked, N, D, C)


def _sample_pallas_multi_fwd(orders, period, means, values, conics, samples):
    outs = sample_pallas_multi(orders, period, means, values, conics, samples)
    return outs, (means, values, conics, samples)


def _sample_pallas_multi_bwd(orders, period, res, gs):
    from ..kernels import dense as kdense

    means, values, conics, samples = res
    N, D = samples.shape
    C = values.shape[1]
    g_list = _split_cotangents(orders, gs, N, D, C)
    d_means, d_values, d_conics = kdense.dense_backward(
        orders, period, means, values, conics, samples, g_list
    )
    return d_means, d_values, d_conics, jnp.zeros_like(samples)


sample_pallas_multi.defvjp(_sample_pallas_multi_fwd, _sample_pallas_multi_bwd)


# ---------------------------------------------------------------------------
# Tile-binned path (binning/ + kernels/tiled.py)
# ---------------------------------------------------------------------------


def sample_tiled_multi(orders: Tuple[str, ...], cfg,
                       means, values, conics, samples, state,
                       fwd_geom, bwd_geom,
                       fwd_work_items: int, bwd_work_items: int,
                       *, block_n: int = 512, block_e: int = 128,
                       bwd_block_n: int = 256, bwd_block_e: int = 128,
                       sorted_outputs: bool = False,
                       unique_outputs: bool = False,
                       padded_outputs: bool = False,
                       unwrapped: bool = False,
                       separable: Optional[bool] = None,
                       moments: Optional[bool] = None,
                       folded: Optional[bool] = None,
                       fwd_span: int = 1, bwd_span: int = 1):
    """Fused multi-order evaluation over a prebuilt BinningState.

    ``state``/geometry come from binning.grid (build + forward_geometry +
    backward_geometry).  ``fwd_work_items``/``bwd_work_items`` are the static
    work-list capacities (total real block pairs; exactness requires them to
    cover ``work_total`` of the padded geometry - checked by sample_binned's
    diagnostics or the facade's eager sizing).  Gradients flow to (means,
    values, conics) only - the reference's autograd contract
    (__init__.py:113-126).

    With ``padded_outputs`` (requires sorted_outputs) each order comes back
    in the kernels' raw lane-major layout: (n_unique, C, Np) canonical
    components with block-padded, tile-sorted sample columns (pad columns
    are zero).  Reduction-style losses consume it zero-copy and the backward
    skips every pad / slice / transpose over the packed cotangent.
    """
    from ..kernels import tiled as ktiled
    from ..kernels.dense import _pad_axis, _round_up

    N, D = samples.shape
    P, C = values.shape
    tri = tri_size(D)
    period = cfg.period
    if padded_outputs and not sorted_outputs:
        raise ValueError("padded_outputs requires sorted_outputs")
    # The binning structure (incl. radii, consumed by prepare_entries for the
    # periodic image recompute) is non-differentiable; sever its tangents
    # BEFORE the custom_vjp below closes over it, or an outer linearization's
    # tracers leak into the closure.
    state = jax.tree.map(jax.lax.stop_gradient, state)

    # The separable kernels (power and a = CX on the MXU in tile-local
    # coordinates) require wrap-free pair math: unwrapped periodic configs
    # (planner-certified) or open domains.  They pay doubled geom rows and
    # leading-axis-contracted dots, which only beats the per-pair VPU chains
    # once those chains are long: measured -4.2 ms/step at D=3 but
    # +1.6 ms/step at D=2, so the default enables them for D >= 3 only.
    kernel_period = None if unwrapped else period
    if separable is None:
        separable = cfg.separable_kernels
    if separable is None:
        # Auto default OFF since kernel dot precision was pinned to
        # HIGHEST (round 4): the separable MXU form won under
        # default-precision (one-pass bf16) dots, but at 6-pass fp32-class
        # precision the exact per-pair VPU chains are faster (D=3 chunked
        # 255.6 vs 235.5 ms/step measured on-chip).  Under the documented
        # fast-math mode the dots are one-pass again, so the bf16-era
        # winner (separable MXU pair math at D >= 3) comes back on.
        separable = (bool(cfg.fast_math_dots) and D >= 3
                     and kernel_period is None)
    else:
        separable = separable and kernel_period is None
    separable = separable and kernel_period is None
    # Moment-form backward (kernels/tiled.moment_combine): per-entry
    # parameter gradients as MXU contractions against the sample monomial
    # basis instead of per-pair VJP chains + sublane tree-reductions.
    # Requires tile-local (wrap-free) coordinates.  On-chip A/B at the 100k
    # x 1M operating point (round 3): D=3 chunked 192.5 -> 179.8 ms/step,
    # but D=2 tiled REGRESSES 33.3 -> 36.4 ms (the D=2 per-pair VJP tail is
    # too short to pay for the doubled output rows + weight multiplies), so
    # the auto default enables it for D >= 3 only.
    if moments is None:
        # Auto default OFF under pinned dot precision (see separable note):
        # the moment-form contractions pay 6-pass dots; the per-pair VJP is
        # exact VPU math (D=3 chunked 255.6 -> 235.5 ms/step).  Fast-math
        # restores the bf16-era auto (moment backward for wrap-free D >= 3).
        moments = (bool(cfg.fast_math_dots) and D >= 3
                   and kernel_period is None)
    else:
        if moments and kernel_period is not None:
            import warnings

            warnings.warn(
                "moment_backward=True requires wrap-free (tile-local) "
                "kernels but the config is periodic without the compact-"
                "support certificate (cfg.unwrapped_kernels); falling back "
                "to the per-pair backward", stacklevel=2)
        moments = moments and kernel_period is None
    prep_sep = separable or moments

    # Folded-values kernels (kernels/tiled.folded_geom): ONE G contraction
    # per pair block instead of K per-component value dots, per-pair
    # polynomial materialization eliminated.  Requires the wrap-free
    # certificate.  Default OFF: measured on-chip (round 5) the pair
    # kernels OVERLAP VPU and MXU and the backward is VPU-bound, so the
    # folded dot savings are largely hidden while the per-entry
    # coefficient-array builds add real glue (D=2 46.8 vs 47.0 ms - a
    # wash; D=3 248 vs 233 - a regression).  Kept as a tested A/B mode.
    if folded is None:
        folded = cfg.folded_values
    folded = bool(folded) and kernel_period is None and not prep_sep
    folded_meta, n_mono = (formulas.folded_structure(orders, D)
                           if folded else (None, 0))
    prec = ktiled.dot_precision(cfg)

    # Shared preparation: entry/sample padding aligned to both kernels' block
    # sizes so one gather serves forward and backward; sample sorting (and
    # the separable monomial matrix) is parameter-independent and hoisted
    # entirely.
    align_e = max(block_e, bwd_block_e)
    align_n = max(block_n, bwd_block_n)
    s_sorted, s_tile, Np, mono = ktiled.prepare_samples(
        state, samples, align_n, cfg=cfg, separable=prep_sep,
        folded_deg=(max(formulas.ORDER_DEGREE[o] for o in orders)
                    if folded else None))
    smp = (mono if (prep_sep or folded) else s_sorted, s_tile, Np)
    fwd_tile_local = prep_sep and not separable
    Ep = _round_up(state.num_entries, align_e)

    NB_f, EB_f = Np // block_n, Ep // block_e
    EB_b, NB_b = Ep // bwd_block_e, Np // bwd_block_n

    fb, fn = fwd_geom
    bb, bn = bwd_geom
    fb = jnp.clip(_pad_axis(fb, 0, NB_f), 0, EB_f - 1)
    fn = _pad_axis(fn, 0, NB_f)
    bb = jnp.clip(_pad_axis(bb, 0, EB_b), 0, NB_b - 1)
    bn = _pad_axis(bn, 0, EB_b)
    wl_f = ktiled.work_list(fb, fn, EB_f, fwd_work_items, span=fwd_span)[:5] \
        + (fn,)
    wl_b = ktiled.work_list(bb, bn, NB_b, bwd_work_items, span=bwd_span)[:5] \
        + (bn,)

    if not sorted_outputs:
        inv = jnp.zeros((N,), jnp.int32).at[state.s_perm].set(
            jnp.arange(N, dtype=jnp.int32)
        )

    # NOTE on overflow: when the static work capacities are too small
    # (diagnostics work_overflow_* > 0), sample/entry blocks whose first work
    # item did not fit are never zero-initialized and their outputs/gradients
    # are garbage.  Callers must treat any overflow as "results invalid"
    # (sample_binned reports it; the facade raises under debug=True) - so no
    # masking is spent on the exact-capacity fast path here.

    # The custom_vjp works entirely in the kernels' lane-major (K*C, Np)
    # layout (see kernels/tiled.py: a row-major (N, K*C) array lane-pads 24
    # columns to 128 in HBM).  All slicing / un-sorting / transposing to the
    # public shapes happens OUTSIDE, so f_bwd always receives the cotangent
    # already lane-major.
    # With per-entry period-shifted means (prepare_entries) the kernels can
    # drop the per-pair torus wrap when footprints are compact
    # (cfg.unwrapped_kernels; exactness certified by the capacity planner),
    # and then also run the separable MXU pair math (see above).

    # Folded dvalues: beta-expanded cotangent rows, size-gated (the (R, Np)
    # array is one elementwise pass; huge shards fall back to the classic
    # per-component dots).
    R_fold = (C * sum(len(m) for m in folded_meta)) if folded else 0
    # Round-5 overlap finding: the classic per-component dvalue dots are
    # FULLY HIDDEN under the VPU-bound backward (0 ms in the on-chip
    # ablation), so the beta-expanded-cotangent forms are pure glue cost
    # by default; both stay available for A/B.
    fold_dv = folded and bool(cfg.folded_dvals) and (
        R_fold * Np * 4 <= ktiled.CT_BETA_MAX_BYTES)
    # Fully-folded backward: gated by the foldw arrays' size (D extra
    # R8-row per-entry operands; the D=3 flagship's 3x292 rows exceed the
    # per-item DMA budget - force with cfg.folded_vjp=True to A/B).
    fold_vjp = bool(fold_dv) and bool(cfg.folded_vjp)

    def _prep(m, v, c):
        return ktiled.prepare_entries(
            state, m, v, c, align_e, cfg=cfg, separable=prep_sep,
            folded=(orders if folded else None), fold_meta=folded_meta,
            folded_vjp=fold_vjp)

    @jax.custom_vjp
    def f(m, v, c):
        ent = _prep(m, v, c)
        return ktiled.tiled_forward(
            orders, kernel_period, D, C, wl_f, ent, smp,
            block_n=block_n, block_e=block_e, separable=separable,
            tile_local=fwd_tile_local, span=fwd_span,
            folded=folded_meta, n_mono=n_mono, precision=prec,
        )                     # (K*C, Np); columns >= N are zero

    def f_fwd(m, v, c):
        return f(m, v, c), _prep(m, v, c)

    def f_bwd(ent, g):
        # g arrives lane-major (K*C, Np); the backward's h matmuls also want
        # the (Np, K*C) orientation (in-kernel transposed-lhs dots measure
        # slower than one outside transpose).
        ct_t = (ktiled.ct_beta_rows(folded_meta, C, g, smp[0],
                                    pad_mult=128 if fold_vjp else 8)
                if fold_dv else g)
        ct = (ktiled.ct_beta_rows_t(folded_meta, C, g.T, smp[0].T)
              if fold_vjp else g.T)
        dent = ktiled.tiled_backward(
            orders, kernel_period, D, C, wl_b, ent, smp,
            ct, ct_t,
            block_n=bwd_block_n, block_e=bwd_block_e, separable=separable,
            moments=moments, span=bwd_span,
            folded=folded_meta, n_mono=n_mono, folded_dvals=fold_dv,
            folded_vjp=fold_vjp,
            h_matmul=bool(cfg.h_matmul),
            precision=prec,
        )
        if moments:
            # Fold the raw moment rows with the per-entry geometry - once
            # per entry, outside the kernel (kernels/tiled.moment_combine).
            dent = ktiled.moment_combine(orders, D, C, dent, ent[2])
        # Deterministic segment-sum of entry gradients by gaussian id
        # (replaces backward.cu's atomicAdd scatter).  TPU row scatters and
        # row gathers both run ~12-14 ns/row, so the (Ep,) scatter-add beats
        # any (P*R^D,) inverse-permutation gather here.
        d = jax.ops.segment_sum(dent.T, ent[0], num_segments=P + 1)[:P]
        return d[:, :D], d[:, D + tri:], d[:, D:D + tri]

    f.defvjp(f_fwd, f_bwd)
    packed_t = f(means, values, conics)    # (K*C, Np)

    if not padded_outputs:
        out = packed_t[:, :N].T            # (N, K*C)
        if not sorted_outputs:
            out = out[inv]

    # Mirror the kernels' unique (canonical i<=j<=k) components into the full
    # symmetric tensors.  This happens OUTSIDE the custom_vjp, so its
    # transpose folds the duplicated positions' cotangents into the unique
    # slots automatically (valid: every per-component VJP term is symmetric
    # in the component's indices - formulas.vjp_params_folded).
    outs, k0 = [], 0
    for order in orders:
        nu = formulas.n_unique(order, D)
        if padded_outputs:
            # Raw lane-major (nu, C, Np) canonical components - the
            # zero-copy layout for reduction-style losses (pad columns are
            # zero).
            outs.append(packed_t[k0 * C:(k0 + nu) * C, :].reshape(nu, C, -1))
            k0 += nu
            continue
        block = out[:, k0 * C:(k0 + nu) * C].reshape(N, nu, C)
        if unique_outputs:
            # Skip the mirror: (N, n_unique, C) canonical components
            # (formulas.sym_indices order; sym_multiplicity gives the fold
            # weights).  The expansion gather costs ~N rows - symmetry-aware
            # consumers (traces, quadratic losses) don't need it.
            outs.append(block)
        else:
            fmap = formulas.full_to_unique(order, D)
            if len(fmap) != nu:
                block = block[:, jnp.asarray(fmap, jnp.int32), :]
            outs.append(block.reshape(out_shape(order, N, D, C)))
        k0 += nu
    return tuple(outs)


def sample_binned(cfg, means, values, conics, covariances, samples,
                  orders: Tuple[str, ...] = ALL_ORDERS,
                  sorted_outputs: bool = False,
                  unique_outputs: bool = False,
                  padded_outputs: bool = False,
                  sample_binning=None,
                  gaussian_binning=None):
    """Fully jit-compatible binned evaluation: builds the acceleration
    structure in-trace with the static work caps from ``cfg`` and returns
    (outputs dict, diagnostics dict).

    diagnostics["bin_overflow"] counts Gaussians whose footprint exceeded
    max_tiles_per_gaussian; diagnostics["work_overflow_fwd"/"_bwd"] flag
    sample/entry blocks whose sweep exceeded the static work caps.  All three
    must be zero for exact results (check them - this replaces the reference's
    silent reliance on dynamically sized buffers).

    ``sample_binning`` (binning.grid.bin_samples product) skips the
    parameter-independent sample sort when the query points are reused
    across steps.
    """
    from ..binning import grid as binning
    from ..kernels import tiled as ktiled
    from ..kernels.dense import _round_up

    N = samples.shape[0]
    state = binning.build(cfg, means, covariances, samples,
                          sample_binning=sample_binning,
                          gaussian_binning=gaussian_binning)
    bn, be = cfg.block_n, cfg.block_p
    bbn, bbe = cfg.bwd_blocks
    fwd_geom = binning.forward_geometry(state, bn, be)
    bwd_geom = binning.backward_geometry(state, bbe, bbn)

    # Static work-list capacities: explicit totals from the capacity planner
    # when set (cfg.work_items_*; exact, plus slack for the pad blocks the
    # planner cannot see), else the per-block cap fallback.
    align_n, align_e = max(bn, bbn), max(be, bbe)
    NB_f = _round_up(N, align_n) // bn
    EB_b = _round_up(state.num_entries, align_e) // bbe
    slack_f = NB_f - fwd_geom[0].shape[0]
    slack_b = EB_b - bwd_geom[0].shape[0]
    span_f, span_b = cfg.work_span_fwd, cfg.work_span_bwd
    # Span-packed items: derive a safe capacity from the span=1 planner
    # totals (sum(ceil(n/span)) <= (total + (span-1)*rows) / span).
    cap_f = (ktiled.span_capacity(cfg.work_items_fwd, NB_f, span_f) + slack_f
             if cfg.work_items_fwd else NB_f * cfg.work_blocks_fwd)
    cap_b = (ktiled.span_capacity(cfg.work_items_bwd, EB_b, span_b) + slack_b
             if cfg.work_items_bwd else EB_b * cfg.work_blocks_bwd)

    outs = sample_tiled_multi(
        tuple(orders), cfg, means, values, conics, samples, state,
        fwd_geom, bwd_geom, cap_f, cap_b,
        block_n=bn, block_e=be, bwd_block_n=bbn, bwd_block_e=bbe,
        sorted_outputs=sorted_outputs, unique_outputs=unique_outputs,
        padded_outputs=padded_outputs, unwrapped=cfg.unwrapped_kernels,
        moments=cfg.moment_backward, fwd_span=span_f, bwd_span=span_b,
    )
    diag = {
        # With sorted_outputs, output row r corresponds to samples[perm[r]].
        "perm": state.s_perm if sorted_outputs else None,
        "bin_overflow": state.overflow,
        "entry_overflow": state.entry_overflow,
        "work_overflow_fwd": jnp.maximum(
            ktiled.work_total(fwd_geom[1], span_f) + slack_f - cap_f, 0
        ),
        "work_overflow_bwd": jnp.maximum(
            ktiled.work_total(bwd_geom[1], span_b) + slack_b - cap_b, 0
        ),
    }
    return dict(zip(orders, outs)), diag


def sample(order: str, means, values, conics, samples, *,
           period: Optional[float] = 2.0, method: str = "pallas"):
    """Public single-order entry point.

    method: "pallas" (blocked Pallas kernels) or "dense" (pure-XLA reference
    path).  Both produce identical values and gradients.
    """
    fn = sample_pallas_multi if method == "pallas" else sample_dense_multi
    (out,) = fn((order,), period, means, values, conics, samples)
    return out


def sample_all(means, values, conics, samples, *, period=2.0,
               orders: Sequence[str] = ALL_ORDERS, method: str = "pallas"):
    """Fused multi-order evaluation - one pairwise pass for all orders."""
    fn = sample_pallas_multi if method == "pallas" else sample_dense_multi
    outs = fn(tuple(orders), period, means, values, conics, samples)
    return dict(zip(orders, outs))
