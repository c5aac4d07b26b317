"""Pallas TPU kernels: blocked dense pairwise evaluation (fwd + bwd).

TPU-native replacement for the reference's render kernels
(forward.cu:88-345, backward.cu:26-501).  Instead of one CUDA block per
spatial tile with a dynamic Gaussian work list, the pair space (N samples x P
Gaussians) is blocked into a static (BN x BP) Pallas grid:

  * forward:  grid (n_blocks, p_blocks); the P axis is the reduction - each
    output block of samples accumulates over Gaussian blocks.
  * backward: grid (p_blocks, n_blocks); the N axis is the reduction - each
    Gaussian-gradient block accumulates over sample blocks.  This replaces the
    CUDA atomicAdd scatter (backward.cu:121-152) with a *deterministic*
    block-level reduction.

Layout rules (keep the vector unit busy, avoid relayouts):
  * all pairwise arrays are (BN, BP): samples on sublanes, Gaussians on lanes;
  * per-Gaussian data is transposed (D/tri/C leading): row reads/writes are
    lane vectors;
  * per-sample cotangents arrive as K separate (N, C) arrays: column reads
    are sublane vectors that broadcast along lanes;
  * every evaluation component gets its own (N, C) output array - full-block
    writes, no packed trailing dims.

The per-pair math comes from ops/formulas.py - the same closed forms the
oracle validates against autodiff.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..config import n_components, tri_size
from ..ops import formulas


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_axis(x, axis, size):
    if x.shape[axis] == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, pads)


def total_components(orders: Tuple[str, ...], D: int) -> int:
    return sum(n_components(o, D) for o in orders)


def _pair_block(means_ref, conics_ref, samples_ref, period, D):
    """Compute wrapped X, conic entries, G, a for one (BN, BP) pair block."""
    tri = tri_size(D)
    Xs = []
    for d in range(D):
        mu_d = means_ref[d, :][None, :]  # (1, BP)
        x_d = samples_ref[d, :][:, None]  # (BN, 1)
        Xs.append(formulas.wrap(mu_d - x_d, period))
    con = [conics_ref[t, :][None, :] for t in range(tri)]
    G, a = formulas.power_terms(Xs, con)
    return Xs, con, G, a


def _forward_body(orders, period, D, C,
                  means_ref, conics_ref, values_ref, samples_ref, out_refs,
                  mask_fn=None):
    """Shared forward block body: accumulate every component's (BN, C)."""
    Xs, con, G, a = _pair_block(means_ref, conics_ref, samples_ref, period, D)
    if mask_fn is not None:
        G = G * mask_fn()
    values = values_ref[...]  # (BP, C)
    k0 = 0
    for order in orders:
        comps = formulas.components(order, Xs, con, G, a)
        for k, w in enumerate(comps):
            # (BN, BP) @ (BP, C) on the MXU; fp32 accumulation (config.h:20).
            out_refs[k0 + k][...] += jnp.dot(
                w, values, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST
            )
        k0 += len(comps)


def _backward_body(orders, period, D, C,
                   means_ref, conics_ref, values_t_ref, samples_ref, g_refs,
                   dmeans_ref, dvalues_ref, dconics_ref, mask_fn=None):
    """Shared backward block body.

    values_t_ref: (C, BP) transposed values; g_refs: K x (BN, C) cotangents;
    dvalues_ref: (C, BP).  All accumulations land as lane vectors.
    """
    Xs, con, G, a = _pair_block(means_ref, conics_ref, samples_ref, period, D)
    if mask_fn is not None:
        G = G * mask_fn()
    tri = tri_size(D)

    k0 = 0
    for order in orders:
        nk = n_components(order, D)
        comps = formulas.components(order, Xs, con, G, a)
        # h_k[n,p] = sum_c values[p,c] * g[n,k,c]   (backward.cu:122)
        hs = []
        for k in range(nk):
            g_k = g_refs[k0 + k][...]  # (BN, C)
            h = None
            for c in range(C):
                g_nc = g_k[:, c][:, None]                # (BN, 1) sublanes
                v_c = values_t_ref[c, :][None, :]        # (1, BP) lanes
                # dL/dvalues[p,c] += sum_n W_k[n,p] * g[n,k,c]
                dvalues_ref[c, :] += jnp.sum(comps[k] * g_nc, axis=0)
                h = g_nc * v_c if h is None else h + g_nc * v_c
            hs.append(h)
        dmu, dcon = formulas.vjp_params(order, Xs, con, G, a, hs)
        for d in range(D):
            dmeans_ref[d, :] += jnp.sum(dmu[d], axis=0)
        for t in range(tri):
            dconics_ref[t, :] += jnp.sum(dcon[t], axis=0)
        k0 += nk


# ---------------------------------------------------------------------------
# Dense forward
# ---------------------------------------------------------------------------


def _forward_kernel(orders, period, D, C, means_ref, conics_ref, values_ref,
                    samples_ref, *out_refs):
    p_idx = pl.program_id(1)

    @pl.when(p_idx == 0)
    def _init():
        for o in out_refs:
            o[...] = jnp.zeros_like(o)

    _forward_body(orders, period, D, C, means_ref, conics_ref, values_ref,
                  samples_ref, out_refs)


def dense_forward(
    orders: Tuple[str, ...],
    period: Optional[float],
    means: jnp.ndarray,   # (P, D)
    values: jnp.ndarray,  # (P, C)
    conics: jnp.ndarray,  # (P, tri)
    samples: jnp.ndarray, # (N, D)
    *,
    block_n: int = 256,
    block_p: int = 512,
) -> List[jnp.ndarray]:
    """Returns one (N, C) array per evaluation component (K total).

    The public ops layer stacks/reshapes them into the per-order outputs.
    """
    N, D = samples.shape
    P, C = values.shape
    K = total_components(orders, D)

    Np = _round_up(max(N, 8), block_n)
    Pp = _round_up(max(P, 128), block_p)

    means_t = _pad_axis(means.T, 1, Pp)          # (D, Pp)
    conics_t = _pad_axis(conics.T, 1, Pp)        # (tri, Pp)
    values_p = _pad_axis(values, 0, Pp)          # (Pp, C) zero pad => no contrib
    samples_t = _pad_axis(samples.T, 1, Np)      # (D, Np)

    grid = (Np // block_n, Pp // block_p)
    tri = tri_size(D)

    outs = pl.pallas_call(
        functools.partial(_forward_kernel, orders, period, D, C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, block_p), lambda n, p: (0, p)),
            pl.BlockSpec((tri, block_p), lambda n, p: (0, p)),
            pl.BlockSpec((block_p, C), lambda n, p: (p, 0)),
            pl.BlockSpec((D, block_n), lambda n, p: (0, n)),
        ],
        out_specs=[
            pl.BlockSpec((block_n, C), lambda n, p: (n, 0)) for _ in range(K)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, C), jnp.float32) for _ in range(K)
        ],
        interpret=_interpret(),
    )(means_t, conics_t, values_p, samples_t)
    return [o[:N] for o in outs]


# ---------------------------------------------------------------------------
# Dense backward
# ---------------------------------------------------------------------------


def _backward_kernel(orders, period, D, C, K, *refs):
    means_ref, conics_ref, values_t_ref, samples_ref = refs[:4]
    g_refs = refs[4 : 4 + K]
    dmeans_ref, dvalues_ref, dconics_ref = refs[4 + K :]
    n_idx = pl.program_id(1)

    @pl.when(n_idx == 0)
    def _init():
        dmeans_ref[...] = jnp.zeros_like(dmeans_ref)
        dvalues_ref[...] = jnp.zeros_like(dvalues_ref)
        dconics_ref[...] = jnp.zeros_like(dconics_ref)

    _backward_body(orders, period, D, C, means_ref, conics_ref, values_t_ref,
                   samples_ref, g_refs, dmeans_ref, dvalues_ref, dconics_ref)


def dense_backward(
    orders: Tuple[str, ...],
    period: Optional[float],
    means, values, conics, samples,
    gs: Sequence[jnp.ndarray],  # K x (N, C) per-component cotangents
    *,
    block_n: int = 128,
    block_p: int = 256,
):
    """Deterministic blocked reduction backward; returns (dmeans, dvalues,
    dconics) exactly as the reference kernels produce them
    (sample_points.cu:165-167)."""
    N, D = samples.shape
    P, C = values.shape
    K = total_components(orders, D)
    tri = tri_size(D)

    Np = _round_up(max(N, 8), block_n)
    Pp = _round_up(max(P, 128), block_p)

    means_t = _pad_axis(means.T, 1, Pp)
    conics_t = _pad_axis(conics.T, 1, Pp)
    values_t = _pad_axis(values.T, 1, Pp)        # (C, Pp)
    samples_t = _pad_axis(samples.T, 1, Np)
    gs_p = [_pad_axis(g, 0, Np) for g in gs]     # zero cotangents => no contrib

    grid = (Pp // block_p, Np // block_n)

    dmeans_t, dvalues_t, dconics_t = pl.pallas_call(
        functools.partial(_backward_kernel, orders, period, D, C, K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, block_p), lambda p, n: (0, p)),
            pl.BlockSpec((tri, block_p), lambda p, n: (0, p)),
            pl.BlockSpec((C, block_p), lambda p, n: (0, p)),
            pl.BlockSpec((D, block_n), lambda p, n: (0, n)),
        ]
        + [pl.BlockSpec((block_n, C), lambda p, n: (n, 0)) for _ in range(K)],
        out_specs=[
            pl.BlockSpec((D, block_p), lambda p, n: (0, p)),
            pl.BlockSpec((C, block_p), lambda p, n: (0, p)),
            pl.BlockSpec((tri, block_p), lambda p, n: (0, p)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, Pp), jnp.float32),
            jax.ShapeDtypeStruct((C, Pp), jnp.float32),
            jax.ShapeDtypeStruct((tri, Pp), jnp.float32),
        ],
        interpret=_interpret(),
    )(means_t, conics_t, values_t, samples_t, *gs_p)

    return dmeans_t[:, :P].T, dvalues_t[:, :P].T, dconics_t[:, :P].T
