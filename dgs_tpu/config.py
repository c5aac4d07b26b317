"""Runtime configuration for the TPU Gaussian sampling engine.

The CUDA reference hard-codes its configuration at compile time
(/root/reference/cuda_sampler/config.h:18-20: ``BLOCK_SIZE 0.51f``, ``#define
TORUS``, ``typedef float FLOAT``).  Here everything is a runtime dataclass that
is hashable so it can be passed as a static argument to ``jax.jit`` /
``jax.custom_vjp``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Packed upper-triangular size for a symmetric DxD matrix
# (reference stores covariances/conics this way: sample_points.cu:167).
def tri_size(D: int) -> int:
    return D * (D + 1) // 2


def tri_index(D: int, i: int, j: int) -> int:
    """Index into the packed upper-triangular representation.

    Row-major upper triangle: D=2 -> [(0,0), (0,1), (1,1)] matching the
    reference layout con[0]=c_xx, con[1]=c_xy, con[2]=c_yy
    (forward.cu:177: power = -0.5*(c0*x^2 + c2*y^2) - c1*x*y).
    """
    u, v = (i, j) if i <= j else (j, i)
    return u * D - u * (u - 1) // 2 + (v - u)


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static configuration for the sampling engine.

    Attributes:
      period: Domain period per-axis for the periodic (torus) domain, or
        ``None`` for an open domain.  The reference uses a compile-time torus
        of period 2 on [-1, 1]^D (config.h:19, auxiliary.h:23-25).
      lower: Lower corner of the tile grid (world units). The reference derives
        this from sample bounds at runtime, which forces a host sync
        (sample_points.cu:70-74); we make it static for XLA.
      tile_size: World-space tile edge (reference BLOCK_SIZE 0.51, config.h:18).
      radius_sigma: Gaussian footprint cutoff in standard deviations
        (reference: 3 sigma, forward.cu:52-61).
      max_tiles_per_gaussian: Static cap on the per-Gaussian tile footprint per
        axis (replaces the reference's dynamic ``num_rendered``,
        sampler_impl.cu:256-257, with a static capacity).

    Evaluation dtype is fp32 throughout, matching the reference
    (config.h:20); overflow in any static capacity is counted and reported,
    never silently wrong.
    """

    period: Optional[float] = 2.0
    lower: Tuple[float, ...] = (-1.0, -1.0)
    # Upper corner for OPEN (non-periodic) domains; ignored when period is
    # set (the reference is torus-only, config.h:19 - open domains are an
    # extension).
    upper_bounds: Optional[Tuple[float, ...]] = None
    tile_size: float = 0.51
    radius_sigma: float = 3.0
    # Numerical floor inside the eigenvalue solve for the footprint radius.
    # The reference hard-codes 1e-6 (forward.cu:59), which inflates the radius
    # of very small Gaussians to ~3*sqrt(1e-3); lower it for small-sigma
    # workloads.
    eig_floor: float = 1e-6
    max_tiles_per_gaussian: int = 4
    # Static capacity of the compacted duplicate-entry list, as a multiple of
    # P.  Enumeration capacity is P * R^D; after the tile sort, sentinel
    # (unused) slots are compacted away down to ceil(factor * P) entries so
    # sparse footprints don't pay for the worst case.  Valid entries beyond
    # the capacity are counted in the overflow diagnostic.
    entry_capacity_factor: float = 4.0
    # Evaluate pairs from per-entry period-shifted means with NO per-pair
    # torus wrap.  Exact iff every footprint is compact:
    # max_radius + tile_size < period / 2 per axis (the planner certifies
    # this - utils.native.plan_capacities["safe_unwrapped"]).  The binning
    # always carries the image shifts; this flag only switches the kernels.
    unwrapped_kernels: bool = False
    # Moment-form backward (kernels/tiled.moment_combine): per-entry
    # parameter gradients as MXU contractions against the sample monomial
    # basis.  None = per-D auto inside the sampling ops (requires wrap-free
    # pair math either way); True/False force it where legal.
    moment_backward: Optional[bool] = None
    # Separable MXU pair math (power and a = CX as tile-local contractions):
    # None = per-D auto (on for wrap-free D >= 3).  The tradeoff moved when
    # kernel dot precision was pinned (bf16x3+): the per-pair VPU chains are
    # exact fp32 and pay no multi-pass matmul cost, so forcing False can win
    # where the MXU form did under default-precision dots.
    separable_kernels: Optional[bool] = None
    # Folded-values pair kernels (kernels/tiled.folded_geom + the folded
    # forward/backward branches): expand every component polynomial over
    # the raw sample-monomial basis with per-entry coefficients
    # (formulas.component_coeff_polys), so the K per-component value dots
    # collapse into ONE G contraction per pair block and the per-pair
    # polynomial materialization disappears.  Requires wrap-free
    # (tile-local) pair math - the same compact-support certificate as
    # unwrapped_kernels.  Default OFF: the pair kernels overlap VPU and
    # MXU and the backward is VPU-bound, so the folded dot savings are
    # largely hidden while the per-entry coefficient builds add glue
    # (measured round 5: D=2 a wash, D=3 a regression).  A tested A/B
    # mode; mutually exclusive with separable_kernels / moment_backward.
    folded_values: Optional[bool] = None
    # Folded dvalues in the backward (the beta-expanded-cotangent dot):
    # None = size-gated auto (kernels/tiled.CT_BETA_MAX_BYTES); False
    # forces the classic per-component dvalue dots under a folded forward.
    folded_dvals: Optional[bool] = None
    # Fully-folded backward (the folded-VJP kernel): S0 and the W
    # accumulators of the fused VJP come off the MXU as ct_beta dots
    # against per-entry coefficient rows (formulas.w_coeff_polys),
    # eliminating the per-pair h chains and the S0/W VPU accumulation.
    # Requires the beta-expanded cotangent (folded_dvals); None = auto by
    # the foldw size gate in the sampling ops.
    folded_vjp: Optional[bool] = None
    # h = g @ values as in-kernel MXU dots instead of C broadcast FMAs in
    # the classic backward.  Measured LOSS on-chip (47.0 -> 58.6 ms at the
    # D=2 operating point): unlike the terminal dvalue dots (which hide
    # fully under the VPU-bound pair math), the h dots feed the VJP chain
    # directly, so the multi-pass MXU latency serializes with the VPU.
    # Kept as an A/B flag; default off.
    h_matmul: Optional[bool] = None
    # Documented fast-math knob: run every kernel MXU dot at DEFAULT
    # precision (ONE bf16 pass) instead of the fp32-class HIGHEST pinned in
    # round 4.  ~0.4% relative noise in every kernel dot: outputs do NOT
    # meet the fp32-allclose gate, so this is opt-in only and the on-chip
    # smoke suite refuses it unless explicitly requested.  Also disables
    # the folded-values auto default (whose monomial expansion needs
    # fp32-class dot accuracy).
    fast_math_dots: bool = False
    # Per-axis footprint radii (oracle.dense.radii_axis): bin each Gaussian
    # by the TIGHT axis-aligned bounding box of its radius_sigma-sigma
    # ellipsoid instead of the reference's looser isotropic
    # sqrt(lambda_max) box (forward.cu:52-61).  Same support, fewer
    # duplicates/pairs on anisotropic fields (measured -23% pairs / -27%
    # entries at the D=3 operating point).  Off by default for exact
    # reference rect semantics.
    axis_radii: bool = False
    # Exact ellipsoid-vs-tile culling (binning/grid.ellip_keep): drop every
    # candidate tile whose box the radius_sigma-sigma ellipsoid does not
    # intersect.  Any (per-axis or isotropic) bounding BOX keeps corner
    # tiles the ellipsoid never touches (ellipse/box area pi/4 at D=2,
    # ellipsoid/box volume pi/6 at D=3); a short coordinate-descent solve of
    # min_{x in tile} (x-mu)^T conic (x-mu) culls them exactly.  Same
    # support as the box footprint (a strict subset of its tiles), so this
    # composes with axis_radii.  Off by default for reference rect-semantics
    # parity (like axis_radii); D=1 and full-cover footprints are unchanged.
    ellip_cull: bool = False

    # Pallas block sizes (tunable; defaults from the on-chip sweep at the
    # 100k-Gaussian / 1M-sample operating point, tools/sweep_blocks.py).
    # block_n = samples (the kernels' LANE axis), block_p = entries
    # (sublanes).  Unset backward blocks fall back to half the forward sizes
    # (min 8 sublanes / 128 lanes).
    block_n: int = 512
    block_p: int = 128
    block_n_bwd: Optional[int] = 256
    block_p_bwd: Optional[int] = 128
    # Static work-list capacity for the tiled kernels when binning is built
    # inside a jitted step (the eager facade auto-sizes instead).  The kernels
    # run one grid step per real (sample-block, entry-block) pair; exactness
    # requires the capacity to cover the total pair count (the overflow
    # diagnostic reports violations).  ``work_items_*`` set the total
    # directly (use utils.native.plan_capacities for exact values); when
    # None, the fallback is ``work_blocks_*`` items per row block.
    work_items_fwd: Optional[int] = None
    work_items_bwd: Optional[int] = None
    work_blocks_fwd: int = 8
    work_blocks_bwd: int = 16
    # Column blocks packed into one work item (kernels/tiled.work_list
    # ``span``): fewer grid steps amortize the fixed ~200 ns/item overhead
    # (tools/bench_item_overhead.py) over span column sub-blocks; DMA count
    # is unchanged.  Applies to both the tiled and chunked sampling paths.
    work_span_fwd: int = 1
    work_span_bwd: int = 1

    def __post_init__(self):
        # Periodic domains require the tile grid to cover the period
        # EXACTLY.  With grid*tile > period, the overhang band
        # [period, grid*tile) is phantom space: the unwrapped floor/ceil
        # index math of the rect enumeration and the modulo-grid wrap
        # disagree there, and entries whose footprint crosses the seam
        # silently miss the wrapped tile (dropped pairs in a
        # grid*tile - period wide band).  Snap the tile size to
        # period / grid with grid = ceil(period/tile - 1e-9): existing
        # grids keep their size (exact divisors like 0.25 don't bump up a
        # tile), the tile only shrinks to fit.
        if self.period is not None:
            import math

            grid = max(1, math.ceil(self.period / self.tile_size - 1e-9))
            object.__setattr__(self, "tile_size", self.period / grid)

    @property
    def bwd_blocks(self):
        """(block_n_bwd, block_p_bwd) with the half-size defaults."""
        bn = self.block_n_bwd or max(self.block_n // 2, 8)
        be = self.block_p_bwd or max(self.block_p // 2, 128)
        return bn, be

    @property
    def D(self) -> int:
        return len(self.lower)

    def grid_shape(self) -> Tuple[int, ...]:
        """Static tile-grid shape.

        Mirrors the reference grid computation
        ``ceil((max - min + 1e-6) / BLOCK_SIZE)`` (sample_points.cu:70-74) but
        over the configured domain instead of data-dependent sample bounds.
        """
        if self.period is not None:
            # tile_size is snapped to period/grid (__post_init__), so the
            # division is integral up to float rounding - round, don't ceil.
            return tuple(
                round(self.period / self.tile_size) for _ in range(self.D)
            )
        extent = [u - l for l, u in zip(self.lower, self.upper)]
        return tuple(int(-(-(e + 1e-6) // self.tile_size)) for e in extent)

    @property
    def upper(self) -> Tuple[float, ...]:
        if self.period is not None:
            return tuple(l + self.period for l in self.lower)
        if self.upper_bounds is not None:
            return self.upper_bounds
        raise ValueError(
            "open-domain config (period=None) requires upper_bounds"
        )

    def with_dims(self, D: int) -> "SamplerConfig":
        if self.D == D:
            return self
        up = (tuple(self.upper_bounds[0] for _ in range(D))
              if self.upper_bounds is not None else None)
        return dataclasses.replace(
            self, lower=tuple(self.lower[0] for _ in range(D)),
            upper_bounds=up,
        )


# The four evaluation orders exposed by the reference
# (ext.cpp:20-27: sample_gaussians / _derivative / _laplacian / _third_derivative).
ORDERS = ("value", "derivative", "laplacian", "third")


def n_components(order: str, D: int) -> int:
    return {"value": 1, "derivative": D, "laplacian": D * D, "third": D * D * D}[order]


def out_shape(order: str, N: int, D: int, C: int) -> Tuple[int, ...]:
    """Output shapes matching the reference allocations.

    value (N,C) / derivative (N,D,C) / laplacian==Hessian (N,D,D,C) /
    third (N,D,D,D,C)  (sample_points.cu:215, 240, 265, 290).
    """
    return {
        "value": (N, C),
        "derivative": (N, D, C),
        "laplacian": (N, D, D, C),
        "third": (N, D, D, D, C),
    }[order]
