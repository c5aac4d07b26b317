"""Neighbor aggregation: attention-style message passing over the Gaussian
cloud (the PIGS dynamics network).

TPU-native rebuild of aggregate_neighbors.cu:

  findCollisions (O(P^2) brute force into a PxP bool matrix,
  aggregate_neighbors.cu:18-55)            -> blocked vectorized collision
                                              search compacted into a
                                              capacity-padded neighbor table
  preprocess CSR {indices,dists,densities} -> same quantities, padded (P, NC)
  aggregateNeighbors fwd (129-208)         -> dense masked einsum pipeline
  aggregateNeighborsBackward (210-321)     -> JAX autodiff of the jnp forward
                                              (mathematically the same 6
                                              hand-derived gradients, without
                                              the atomicAdd scatter)

Semantics replicated exactly:
  * bounding radii shrunk by 0.2 for collision tests
    (aggregate_neighbors.cu:28, 38), self-pairs included (line 36 is
    commented out in the reference);
  * neighbor offsets normalized by 1/(0.333 * radius + 1e-6) (lines 74-75);
  * densities use the *neighbor's* conic on the unnormalized offset, pairs
    with positive quadratic form dropped (lines 107-120);
  * inv_total_density = 1/(sum + 1e-6) (line 125);
  * sinusoidal embedding layout: distance_transform has 2E entries; per dim d
    and frequency e, dt[d*(E-1)/D + 2e + {0,1}] weight sin/cos for the
    "embedding", dt[E + ...] for the "factor", biases at dt[E-1], dt[2E-1]
    (lines 178-193).

One deliberate fix: the reference's torus collision distance
``dx = min(dx, abs(2 - fmod(abs(dx), 2)))`` (line 46) fails to wrap negative
offsets; we use the true minimum-image distance.  (Documented deviation - it
only widens the neighbor candidate set the reference intended.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import SamplerConfig, tri_size
from . import formulas


class Neighbors(NamedTuple):
    """Capacity-padded neighbor table (the reference's CSR arrays
    indices/ranges/dists/densities/inv_total_densities,
    aggregate_neighbors.cu:347-350, with padding instead of ragged ranges)."""

    indices: jnp.ndarray             # (P, NC) int32, -1 = invalid slot
    dists: jnp.ndarray               # (P, NC, D) normalized wrapped offsets
    densities: jnp.ndarray           # (P, NC)
    inv_total_densities: jnp.ndarray # (P,)
    overflow: jnp.ndarray            # () int32: collisions beyond capacity


def _collision_counts(cfg, means, radii):
    P, D = means.shape
    r = radii * 0.2
    alive = r >= 1e-6

    def row_counts(i):
        dx = formulas.wrap(means[None, :, :] - means[i][None, None, :], cfg.period)
        dist2 = jnp.sum(dx[0] ** 2, axis=-1)
        rad = r[i] + r
        hit = alive[i] & alive & (dist2 <= rad * rad)
        return jnp.sum(hit)

    return jax.lax.map(row_counts, jnp.arange(P))


def suggest_capacity(cfg: SamplerConfig, means, radii) -> int:
    """Host-side max collision count (for choosing the static capacity)."""
    return int(jax.device_get(_collision_counts(cfg, means, radii).max()))


@functools.partial(jax.jit, static_argnums=(0, 4))
def preprocess(
    cfg: SamplerConfig,
    means: jnp.ndarray,   # (P, D)
    conics: jnp.ndarray,  # (P, tri)
    radii: jnp.ndarray,   # (P,)
    neighbor_capacity: Optional[int] = None,
) -> Neighbors:
    """Build the neighbor table (reference preprocess_aggregate,
    aggregate_neighbors.cu:323-367)."""
    P, D = means.shape
    NC = neighbor_capacity or min(P, 64)
    r = radii * 0.2
    alive = r >= 1e-6
    inv_norm = 1.0 / (radii * 0.333 + 1e-6)  # (P,)

    ids = jnp.arange(P, dtype=jnp.int32)

    def row(i):
        dx = formulas.wrap(means - means[i][None, :], cfg.period)  # (P, D)
        dist2 = jnp.sum(dx**2, axis=-1)
        rad = r[i] + r
        hit = alive[i] & alive & (dist2 <= rad * rad)
        # Compact ascending-index neighbor list into NC slots (the reference
        # iterates j ascending, aggregate_neighbors.cu:85).
        key = jnp.where(hit, ids, P)
        order = jnp.argsort(key)[:NC]
        idx = key[order]  # ascending valid ids then P-sentinels
        valid = idx < P
        idx_c = jnp.minimum(idx, P - 1)
        X = formulas.wrap(means[idx_c] - means[i][None, :], cfg.period)  # (NC,D)
        # Density from the *neighbor's* conic on the unnormalized offset
        # (aggregate_neighbors.cu:107-120).
        con_j = conics[idx_c]  # (NC, tri)
        Xs = [X[:, d] for d in range(D)]
        cons = [con_j[:, t] for t in range(tri_size(D))]
        G, _ = formulas.power_terms(Xs, cons)
        dens = jnp.where(valid, G, 0.0)
        pos_power = valid & (G == 0.0)  # power > 0 culled inside power_terms
        out_idx = jnp.where(valid & ~pos_power, idx, -1).astype(jnp.int32)
        total = jnp.sum(dens)
        return out_idx, X * inv_norm[i], dens, 1.0 / (total + 1e-6), jnp.sum(hit)

    idxs, dists, dens, inv_tot, counts = jax.lax.map(row, ids)
    overflow = jnp.sum(counts > NC).astype(jnp.int32)
    return Neighbors(idxs, dists, dens, inv_tot, overflow)


def aggregate(
    features: jnp.ndarray,            # (P, L)
    transform: jnp.ndarray,           # (L, L)
    queries: jnp.ndarray,             # (P, K)
    keys: jnp.ndarray,                # (P, K)
    frequencies: jnp.ndarray,         # (nfreq,) or longer
    distance_transform: jnp.ndarray,  # (2E,)
    nbr: Neighbors,
) -> jnp.ndarray:
    """Forward aggregation (aggregateNeighbors, aggregate_neighbors.cu:129-208).

    Differentiable in (features, transform, queries, keys, frequencies,
    distance_transform) - JAX autodiff produces the same six gradients as the
    hand-written backward kernel (aggregate_neighbors.cu:210-321).
    """
    P, L = features.shape
    D = nbr.dists.shape[-1]
    E = distance_transform.shape[0] // 2
    nfreq = (E - 1) // D // 2
    stride = (E - 1) // D

    idx = jnp.maximum(nbr.indices, 0)
    valid = (nbr.indices >= 0).astype(features.dtype)  # (P, NC)

    # Attention weight w_ij = <query_i, key_j>  (lines 173-176).
    w = jnp.einsum("pk,pnk->pn", queries, keys[idx])

    # Sinusoidal positional code of the normalized offset (lines 178-193).
    X = nbr.dists  # (P, NC, D)
    freq = frequencies[:nfreq]
    phase = freq[None, None, None, :] * jnp.pi * X[..., None]  # (P,NC,D,nfreq)
    s, c = jnp.sin(phase), jnp.cos(phase)
    dt = distance_transform
    d_idx = jnp.arange(D)[:, None] * stride  # (D, 1)
    e_idx = jnp.arange(nfreq)[None, :] * 2   # (1, nfreq)
    emb_s = dt[d_idx + e_idx]                # (D, nfreq)
    emb_c = dt[d_idx + e_idx + 1]
    fac_s = dt[E + d_idx + e_idx]
    fac_c = dt[E + d_idx + e_idx + 1]
    embedding = (
        jnp.einsum("pnde,de->pn", s, emb_s)
        + jnp.einsum("pnde,de->pn", c, emb_c)
        + dt[E - 1]
    )
    factor = (
        jnp.einsum("pnde,de->pn", s, fac_s)
        + jnp.einsum("pnde,de->pn", c, fac_c)
        + dt[2 * E - 1]
    )

    # Density-normalized attention (lines 198-206).
    coeff = nbr.inv_total_densities[:, None] * nbr.densities * w * valid
    pre = jnp.einsum("pn,pnl->pl", coeff * factor, features[idx]) + (
        (coeff * embedding).sum(axis=1, keepdims=True)
    )
    return jnp.einsum("pj,jk->pk", pre, transform)
