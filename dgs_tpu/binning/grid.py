"""Static-shape world-space tile binning (the TPU acceleration structure).

TPU-native replacement for the CUDA reference's sort-based binning pipeline
(sampler_impl.cu:216-330):

  reference                                this module
  -----------------------------------     -----------------------------------
  preprocessCUDA radius+tiles_touched  ->  vectorized radii + rect math
  cub InclusiveSum + cudaMemcpy sync   ->  static entry capacity P * R^D
  duplicateWithKeys (torus wrap)       ->  enumerate R^D candidate tiles/gaussian
  cub RadixSort on [tile|id] keys      ->  jnp.argsort on tile keys
  identifyTileRanges -> uint2 ranges   ->  searchsorted tile starts
  sampleWithKeys + sort + ranges       ->  argsort samples by tile

Everything is shape-static and jit-compatible: the data-dependent
``num_rendered`` host sync (sampler_impl.cu:256-257) is replaced by a static
per-Gaussian duplicate capacity ``R = max_tiles_per_gaussian`` per axis, with
an overflow counter for footprints that exceed it (never silently dropped
without a report).

The kernels (kernels/tiled.py) consume the *sorted flat lists* directly: for
a block of consecutive sorted samples, all relevant Gaussian entries form a
contiguous range of the sorted entry list (both are sorted by tile id), so
block offsets are scalar-prefetched and pair validity is just
``entry_tile == sample_tile`` - the TPU analogue of the per-tile ranges.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import SamplerConfig, tri_index
from ..oracle.dense import radii as compute_radii


class BinningState(NamedTuple):
    """Acceleration structure shared by all four sampling ops (the analogue
    of the reference's binning_buffer/sample_binning_buffer/ranges state,
    __init__.py:224-233)."""

    # Sorted Gaussian duplicates ("entries"), one per (gaussian, covered tile):
    ent_gid: jnp.ndarray      # (E,) int32 gaussian id, P = sentinel pad
    ent_tile: jnp.ndarray     # (1, E) int32 flat tile id, T = sentinel pad
    ent_start: jnp.ndarray    # (T+2,) int32 entry range starts per tile
    # (The per-entry periodic-image shift is NOT stored: it is recomputed
    #  from (ent_tile, rect lo) by kernels/tiled.prepare_entries - carrying
    #  it through the entry sort as a payload costs a third sorted array.)
    # Sorted samples:
    s_perm: jnp.ndarray       # (N,) int32 sample id by sorted position
    s_tile: jnp.ndarray       # (1, N) int32 tile of sorted sample, T+1 = pad
    s_start: jnp.ndarray      # (T+2,) int32 sample range starts per tile
    s_sorted: jnp.ndarray     # (D, N) sample coords by sorted position
    #   (carried as sort payload - re-gathering 1M rows by s_perm costs more
    #    than moving the coordinates through the sort)
    # Per-Gaussian culling radius (exposed like reference radii,
    # sample_points.cu:54: zero radius = culled).  (P,) scalar box, or
    # (P, D) per-axis AABB under cfg.axis_radii.
    radii: jnp.ndarray        # (P,) or (P, D) float32
    # Diagnostics (0 = binning exact): Gaussians whose footprint exceeds the
    # per-axis duplicate cap R, and valid entries dropped by the compacted
    # entry capacity.
    overflow: jnp.ndarray        # () int32 rect overflow count
    entry_overflow: jnp.ndarray  # () int32 dropped entries

    @property
    def num_entries(self) -> int:
        return self.ent_gid.shape[0]


def _grid_info(cfg: SamplerConfig, D: int):
    grid = cfg.with_dims(D).grid_shape()
    T = 1
    strides = []
    for g in reversed(grid):
        strides.append(T)
        T *= g
    strides = tuple(reversed(strides))
    return grid, strides, T


def num_tiles(cfg: SamplerConfig, D: int) -> int:
    return _grid_info(cfg, D)[2]


def sample_tiles(cfg: SamplerConfig, samples: jnp.ndarray) -> jnp.ndarray:
    """Flat tile id of each sample (clamped into the grid).

    Mirrors sampleWithKeys (sampler_impl.cu:155-189) except the reference's
    off-by-one ``min(grid[i], ...)`` (which can index one past the grid) is
    fixed to ``grid[i]-1``.
    """
    N, D = samples.shape
    grid, strides, T = _grid_info(cfg, D)
    lower = jnp.asarray(cfg.with_dims(D).lower, samples.dtype)
    t = jnp.floor((samples - lower) / cfg.tile_size).astype(jnp.int32)
    t = jnp.clip(t, 0, jnp.asarray(grid, jnp.int32) - 1)
    return (t * jnp.asarray(strides, jnp.int32)).sum(axis=1)


def gaussian_rects(cfg: SamplerConfig, means: jnp.ndarray, radii: jnp.ndarray):
    """Per-Gaussian covered tile ranges [rect_min, rect_max) per axis.

    Mirrors getRect (auxiliary.h:21-31): torus mode leaves indices unwrapped
    (they wrap modulo the grid at emission, sampler_impl.cu:89-116); open mode
    clamps to [0, grid].  Zero radius -> empty rect (culled Gaussian,
    forward.cu:41-42, duplicateWithKeys radii>0 check sampler_impl.cu:69).

    ``radii`` may be scalar per Gaussian (P,) - the reference's isotropic
    sqrt(lambda_max) box - or per-axis (P, D) (cfg.axis_radii: the tight
    AABB of the same sigma ellipsoid, oracle.dense.radii_axis).
    """
    P, D = means.shape
    cfg = cfg.with_dims(D)
    grid, _, _ = _grid_info(cfg, D)
    lower = jnp.asarray(cfg.lower, means.dtype)
    g = jnp.asarray(grid, jnp.int32)
    r = radii if radii.ndim == 2 else radii[:, None]
    lo = jnp.floor((means - lower - r) / cfg.tile_size).astype(jnp.int32)
    hi = jnp.ceil((means - lower + r) / cfg.tile_size).astype(jnp.int32)
    if cfg.period is None:
        lo = jnp.clip(lo, 0, g)
        hi = jnp.clip(hi, 0, g)
    # Footprints spanning the whole grid collapse to exactly one full cover
    # (prevents duplicate emission, sampler_impl.cu:83-86, 100-107).
    full = (hi - lo) >= g
    lo = jnp.where(full, 0, lo)
    hi = jnp.where(full, g, hi)
    empty = jnp.any(r <= 0.0, axis=-1, keepdims=True)
    hi = jnp.where(empty, lo, hi)
    return lo, hi


ELLIP_CULL_SWEEPS = 4     # coordinate-descent sweeps for ellip_keep
# (4 sweeps match the fully-converged entry set to 0.002% on strongly
#  anisotropic D=3 clouds - measured in-round; fewer sweeps only ever
#  cull a few extra boundary-grazing tiles, never keep wrong ones)
ELLIP_CULL_TOL = 1e-3     # keep tiles within (1 + tol) of the sigma level


def conics_from_cov(covariances: jnp.ndarray, D: int) -> jnp.ndarray:
    """Packed-tri inverse of packed-tri covariances (closed form, D <= 3).

    Rows with non-positive determinant come back as zeros - callers treat
    them as "no conic" (those Gaussians are det-culled by ``radii`` anyway).
    Used only by the binning-time ellipsoid cull; the evaluation conics are
    a model parameter (the reference also takes conics as an input,
    sample_points.cu:167)."""
    c = covariances
    if D == 1:
        det = c[:, 0]
        inv = jnp.where(det > 0.0, 1.0 / jnp.maximum(det, 1e-30), 0.0)
        return inv[:, None]
    if D == 2:
        det = c[:, 0] * c[:, 2] - c[:, 1] ** 2
        inv = jnp.where(det > 0.0, 1.0 / jnp.maximum(det, 1e-30), 0.0)
        return jnp.stack([c[:, 2], -c[:, 1], c[:, 0]], axis=1) * inv[:, None]
    a00, a01, a02, a11, a12, a22 = (c[:, t] for t in range(6))
    q00 = a11 * a22 - a12 * a12
    q01 = a02 * a12 - a01 * a22
    q02 = a01 * a12 - a02 * a11
    q11 = a00 * a22 - a02 * a02
    q12 = a01 * a02 - a00 * a12
    q22 = a00 * a11 - a01 * a01
    det = a00 * q00 + a01 * q01 + a02 * q02
    inv = jnp.where(det > 0.0, 1.0 / jnp.maximum(det, 1e-30), 0.0)
    return jnp.stack([q00, q01, q02, q11, q12, q22], axis=1) * inv[:, None]


def ellip_keep(cfg: SamplerConfig, means: jnp.ndarray, conics: jnp.ndarray,
               cand: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
    """(P, dup) keep mask: does the radius_sigma ellipsoid intersect each
    candidate tile box?

    ``cand`` holds UNWRAPPED per-axis tile indices (the rect enumeration's
    lo + offs, before the periodic modulo), so the box sits at the
    geometrically-near image of the tile.  The test minimizes the convex
    quadratic y^T Q y over the centered tile box with ELLIP_CULL_SWEEPS
    rounds of clamped cyclic coordinate descent from the Euclidean
    projection of the mean; a tile is kept iff the found minimum is within
    (1 + ELLIP_CULL_TOL) of radius_sigma^2.  The minimum found is an upper
    bound of the true minimum, so an unconverged solve can only mis-cull
    tiles the ellipsoid BARELY grazes (contributions at the exp(-sigma^2/2)
    tail the box footprint itself truncates); ill-conditioned rows
    (zero-conic sentinel from conics_from_cov) and ``skip`` rows (full
    covers) are always kept."""
    P, D = means.shape
    lower = jnp.asarray(cfg.lower, means.dtype)
    blo = (lower[None, None, :] + cand.astype(means.dtype) * cfg.tile_size
           - means[:, None, :])                       # (P, dup, D)
    bhi = blo + cfg.tile_size
    Q = [[conics[:, tri_index(D, i, j)][:, None] for j in range(D)]
         for i in range(D)]
    y = [jnp.clip(jnp.zeros(blo.shape[:2], means.dtype),
                  blo[..., d], bhi[..., d]) for d in range(D)]
    for _ in range(ELLIP_CULL_SWEEPS):
        for d in range(D):
            num = sum(Q[d][e] * y[e] for e in range(D) if e != d)
            y[d] = jnp.clip(-num / jnp.maximum(Q[d][d], 1e-30),
                            blo[..., d], bhi[..., d])
    f = sum(Q[d][d] * y[d] * y[d] for d in range(D))
    for d in range(D):
        for e in range(d + 1, D):
            f = f + 2.0 * Q[d][e] * y[d] * y[e]
    level = cfg.radius_sigma * cfg.radius_sigma * (1.0 + ELLIP_CULL_TOL)
    degenerate = jnp.all(conics == 0.0, axis=1)[:, None]
    return (f <= level) | degenerate | skip


def duplicate_entries(cfg: SamplerConfig, means: jnp.ndarray,
                      radii: jnp.ndarray, R: int, E_cap: int,
                      conics: Optional[jnp.ndarray] = None):
    """Tile-sorted (gaussian, tile) duplicate entries for arbitrary radii.

    The TPU replacement for duplicateWithKeys + radix sort + ranges
    (sampler_impl.cu:54-129, 279-292): enumerate the R^D candidate tiles per
    Gaussian, torus-wrap tile indices, pair-sort by tile with the id as
    payload, truncate to the static capacity.

    Returns (ent_gid (E,), ent_tile (E,), ent_start (T+2,), rect_overflow,
    entry_overflow).  Shared by the sampling binning (3-sigma radii) and the
    aggregation neighbor search (shrunk + inflated collision radii).
    """
    P, D = means.shape
    grid, strides, T = _grid_info(cfg, D)
    dup = R**D

    lo, hi = gaussian_rects(cfg, means, radii)
    extent = hi - lo  # (P, D)
    overflow = jnp.sum(
        jnp.maximum(jnp.prod(jnp.minimum(extent, R), axis=1), 0)
        != jnp.maximum(jnp.prod(extent, axis=1), 0)
    ).astype(jnp.int32)

    offs = jnp.stack(
        jnp.meshgrid(*[jnp.arange(R, dtype=jnp.int32)] * D, indexing="ij"),
        axis=-1,
    ).reshape(dup, D)  # (dup, D)
    cand = lo[:, None, :] + offs[None, :, :]  # (P, dup, D)
    valid = jnp.all(cand < hi[:, None, :], axis=-1)
    g = jnp.asarray(grid, jnp.int32)
    if conics is not None and D >= 2:
        # Exact ellipsoid-vs-tile cull (cfg.ellip_cull): run on the
        # UNWRAPPED candidate indices (the geometrically-near image).
        # Full-cover footprints skip the test (their collapsed rect no
        # longer encodes per-tile geometry).
        skip = jnp.any((hi - lo) >= g[None, :], axis=1)[:, None]
        valid = valid & ellip_keep(cfg, means, conics, cand, skip)
    if cfg.period is not None:
        # Wrap the candidate tile to its periodic image.  Which image it is
        # (k_d = floor(cand_d / g_d)) is NOT carried through the sort: it is
        # unique given (wrapped tile, rect lo) because rect extents never
        # exceed the grid (full covers collapse above), so prepare_entries
        # recomputes it - one sorted array instead of two payload arrays.
        cand = cand - jnp.floor_divide(cand, g) * g
    else:
        valid = valid & jnp.all(cand < g, axis=-1) & jnp.all(cand >= 0, axis=-1)
    tile = (cand * jnp.asarray(strides, jnp.int32)).sum(-1)  # (P, dup)
    tile = jnp.where(valid, tile, T)  # sentinel tile sorts last

    # Pack (tile, gid) into one key: the single-array sort moves half the
    # payload of a (key, payload) pair sort, and the packed order
    # (tile-major, gid-minor) equals the previous stable-by-tile order
    # exactly (generation is gid-ascending).  gid rides the low bits; the
    # sentinel (T, P) packs to the maximum key and sorts last.
    gid_bits = int(P).bit_length()
    tile_bits = int(T).bit_length()
    gid_flat = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, dup)
    )
    gid_flat = jnp.where(tile == T, P, gid_flat)
    if gid_bits + tile_bits <= 31:
        key = ((tile << gid_bits) | gid_flat).reshape(P * dup)
        key = jax.lax.sort(key)
        ent_tile = key >> gid_bits
        ent_gid = key & ((1 << gid_bits) - 1)
    else:
        ent_tile, ent_gid = jax.lax.sort(
            (tile.reshape(P * dup), gid_flat.reshape(P * dup)),
            num_keys=1, is_stable=True,
        )

    # Compact: sentinels sorted last, so truncating to the static entry
    # capacity drops only unused slots (or, if the footprints are unusually
    # dense, real entries - counted below, never silent).
    entry_overflow = jnp.zeros((), jnp.int32)
    if E_cap < P * dup:
        n_valid = jnp.sum(ent_tile < T)
        entry_overflow = jnp.maximum(n_valid - E_cap, 0).astype(jnp.int32)
        ent_tile = ent_tile[:E_cap]
        ent_gid = ent_gid[:E_cap]

    ent_start = jnp.searchsorted(
        ent_tile, jnp.arange(T + 2, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return ent_gid, ent_tile, ent_start, overflow, entry_overflow


def image_shift(cfg: SamplerConfig, ent_tile, ent_lo):
    """Periodic image index k (E, D) of each entry: the unique k with
    lo_d <= t_d + k_d * g_d < hi_d given the wrapped tile and the rect lo
    (see duplicate_entries).  ent_lo may be float (gathered alongside the
    entry parameters); sentinel rows produce garbage k - callers mask them.
    """
    D = ent_lo.shape[1]
    grid, strides, _ = _grid_info(cfg, D)
    t = ent_tile.reshape(-1)
    ks = []
    for d in range(D):
        g = grid[d]
        td = ((t // strides[d]) % g).astype(jnp.float32)
        ks.append(-jnp.floor((td - ent_lo[:, d].astype(jnp.float32)) / g))
    return jnp.stack(ks, axis=1)


def tile_centers(cfg: SamplerConfig, tile_flat, D: int):
    """World-space tile centers (..., D) for flat tile ids.

    Sentinel / pad ids decode through the modulus into in-grid values, so
    downstream tile-local coordinates stay small and finite (those rows are
    tile-masked in-kernel anyway).  Entry side and sample side decode the
    SAME flat id with the same formula, so same-tile pairs see bitwise-equal
    centers - the separable kernels' X = mu_l - x_l is exactly mu' - x.
    """
    grid, strides, _ = _grid_info(cfg, D)
    cs = []
    for d in range(D):
        td = (tile_flat // strides[d]) % grid[d]
        cs.append(cfg.lower[d] + (td.astype(jnp.float32) + 0.5) * cfg.tile_size)
    return jnp.stack(cs, axis=-1)


def entry_capacity(cfg: SamplerConfig, P: int, R: int) -> int:
    """Static compacted entry capacity (see duplicate_entries)."""
    return min(
        max(int(-(-cfg.entry_capacity_factor * P // 128)) * 128, 4096),
        P * R ** cfg.D,
    )


class SampleBinning(NamedTuple):
    """The sample-side half of the acceleration structure.

    Depends only on (cfg, samples) - NOT on the Gaussian parameters - so a
    training loop whose query points are fixed builds it once and reuses it
    across steps while the Gaussian side re-bins every step (the reference
    re-sorts samples in every preprocess, sampler_impl.cu:294-327; splitting
    is free perf on TPU where the step is one compiled program)."""

    s_perm: jnp.ndarray       # (N,) int32 sample id by sorted position
    s_tile: jnp.ndarray       # (1, N) int32 tile of sorted sample, T+1 = pad
    s_start: jnp.ndarray      # (T+2,) int32 sample range starts per tile
    s_sorted: jnp.ndarray     # (D, N) sample coords by sorted position


def bin_samples(cfg: SamplerConfig, samples: jnp.ndarray) -> SampleBinning:
    """Sort samples by tile (sampleWithKeys + sort + ranges,
    sampler_impl.cu:294-327)."""
    N, D = samples.shape
    cfg = cfg.with_dims(D)
    T = _grid_info(cfg, D)[2]
    s_tile_raw = sample_tiles(cfg, samples)
    sorted_ops = jax.lax.sort(
        (s_tile_raw, jnp.arange(N, dtype=jnp.int32))
        + tuple(samples[:, d] for d in range(D)),
        num_keys=1, is_stable=True,
    )
    s_tile, s_perm = sorted_ops[0], sorted_ops[1]
    s_sorted = jnp.stack(sorted_ops[2:], axis=0)  # (D, N)
    s_start = jnp.searchsorted(
        s_tile, jnp.arange(T + 2, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return SampleBinning(
        s_perm=s_perm, s_tile=s_tile[None, :], s_start=s_start,
        s_sorted=s_sorted,
    )


def build(
    cfg: SamplerConfig,
    means: jnp.ndarray,       # (P, D)
    covariances: jnp.ndarray, # (P, tri)
    samples: jnp.ndarray,     # (N, D)
    sample_binning: Optional[SampleBinning] = None,
    gaussian_binning: Optional[BinningState] = None,
) -> BinningState:
    """Build the acceleration structure (reference preprocess, ext.cpp:20).

    Pass a prebuilt ``sample_binning`` (from bin_samples) to skip the
    parameter-independent sample sort when the query points are unchanged.
    Pass a prebuilt ``gaussian_binning`` (a BinningState from an earlier
    build with the SAME cfg/means/covariances) to skip the Gaussian-side
    duplicate/sort when the cloud geometry is fixed and only the query
    points change (the dynamics-training shape: values evolve, means do
    not - the mirror image of the reference's per-step re-preprocess,
    sampler_impl.cu:216-330, legal here because the entry list depends
    only on geometry)."""
    P, D = means.shape
    cfg = cfg.with_dims(D)
    R = cfg.max_tiles_per_gaussian

    if gaussian_binning is not None:
        sb = (sample_binning if sample_binning is not None
              else bin_samples(cfg, samples))
        return gaussian_binning._replace(
            s_perm=sb.s_perm, s_tile=sb.s_tile, s_start=sb.s_start,
            s_sorted=sb.s_sorted,
        )

    if cfg.axis_radii:
        from ..oracle.dense import radii_axis

        rad = radii_axis(covariances, D, cfg.radius_sigma, cfg.eig_floor)
    else:
        rad = compute_radii(covariances, D, cfg.radius_sigma, cfg.eig_floor)
    cull_conics = (conics_from_cov(covariances, D)
                   if cfg.ellip_cull and D >= 2 else None)
    (ent_gid, ent_tile, ent_start, overflow,
     entry_overflow) = duplicate_entries(
        cfg, means, rad, R, entry_capacity(cfg, P, R), conics=cull_conics
    )

    sb = sample_binning if sample_binning is not None else bin_samples(
        cfg, samples
    )

    return BinningState(
        ent_gid=ent_gid,
        ent_tile=ent_tile[None, :],
        ent_start=ent_start,
        s_perm=sb.s_perm,
        s_tile=sb.s_tile,
        s_start=sb.s_start,
        s_sorted=sb.s_sorted,
        radii=rad,
        overflow=overflow,
        entry_overflow=entry_overflow,
    )


# Jitted alias for eager/facade use.  ``build`` itself stays un-jitted so it
# can be traced inside shard_map / outer jits without nesting issues.
build_jit = jax.jit(build, static_argnums=(0,))


def pair_mask_dense(cfg: SamplerConfig, state: BinningState,
                    samples: jnp.ndarray, P: int) -> jnp.ndarray:
    """Dense (N, P) inclusion mask implied by the binning - a pair counts iff
    the Gaussian's rect covers the sample's tile (renderCUDA pairing,
    forward.cu:104-144).  Used by tests to compare the tiled kernels against
    the oracle with *exactly* matching semantics."""
    N = samples.shape[0]
    s_t = sample_tiles(cfg, samples)  # (N,)
    E = state.num_entries
    # mask[n, p] = any entry with gid p and tile == s_t[n]
    ent_tile = state.ent_tile[0]
    ent_gid = state.ent_gid
    hits = ent_tile[None, :] == s_t[:, None]  # (N, E)
    onehot = jax.nn.one_hot(ent_gid, P + 1, dtype=jnp.float32)[:, :P]  # (E, P)
    return (hits.astype(jnp.float32) @ onehot) > 0.0


def _range_geometry(row_tiles, row_block, col_starts, col_block, n_rows):
    """Block-granular [base, base+nblocks) sweep ranges.

    For each block of ``row_block`` consecutive tile-sorted rows, the relevant
    columns (also tile-sorted) form the contiguous range
    [col_starts[first_tile], col_starts[last_tile + 1]) - the TPU analogue of
    the reference's per-tile uint2 ranges (identifyTileRanges,
    sampler_impl.cu:134-151).  Sentinel rows (culled duplicates, tile >= T)
    are excluded via a per-block valid-tile min/max, so a block that straddles
    the sentinel tail does not blow its sweep up to the whole column list.
    """
    RB = -(-n_rows // row_block)
    T = col_starts.shape[0] - 2  # valid tiles are < T
    pad = RB * row_block - n_rows
    tiles = jnp.pad(row_tiles, (0, pad), constant_values=T).reshape(
        RB, row_block
    )
    valid = tiles < T
    first = jnp.min(jnp.where(valid, tiles, T), axis=1)
    last = jnp.max(jnp.where(valid, tiles, -1), axis=1)
    lo = col_starts[first]  # first == T (empty block) -> col_starts[T]
    hi = jnp.where(last >= 0, col_starts[jnp.maximum(last, 0) + 1], lo)
    base = lo // col_block
    nblocks = jnp.where(hi > lo, -(-(hi - base * col_block) // col_block), 0)
    return base.astype(jnp.int32), nblocks.astype(jnp.int32)


def forward_geometry(state: BinningState, block_n: int, block_e: int):
    """(base, nblocks) over entry blocks for each sorted-sample block."""
    return _range_geometry(
        state.s_tile[0], block_n, state.ent_start, block_e,
        state.s_tile.shape[1],
    )


def backward_geometry(state: BinningState, block_e: int, block_n: int):
    """(base, nblocks) over sorted-sample blocks for each entry block."""
    return _range_geometry(
        state.ent_tile[0], block_e, state.s_start, block_n,
        state.ent_tile.shape[1],
    )
