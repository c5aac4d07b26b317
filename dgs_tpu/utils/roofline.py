"""Computed speed-of-light model for the sampling step (SURVEY.md §5:
"per-op roofline calc vs speed-of-light").

The step's irreducible work is the same-tile (entry, sample) pair sweep:
``pair_count`` computes the EXACT pair total sum_t E_t * S_t from the
binning structure, and ``step_roofline`` turns it into a per-unit
lower-bound time on the target chip:

  t_sol = max(VPU elementwise flops / VPU_PEAK,
              MXU MACs * 2 / MXU_PEAK_EFF,
              HBM bytes / HBM_BW)

The per-pair operation counts are hand-derived from ops/formulas.py /
kernels/tiled.py (commented per term below); the chip constants are a
documented MODEL of TPU v5e (env-overridable), not vendor-published
fp32-elementwise numbers - treat ``vs_speed_of_light`` as a principled
upper bound on remaining headroom, not an MFU measurement:

  * MXU_PEAK_EFF: 197e12 bf16 FLOP/s (public v5e peak) / 6 passes for the
    fp32-class HIGHEST lowering the kernels pin (BASELINE.md round-4
    precision finding).  DGS_ROOFLINE_MXU overrides.
  * VPU_PEAK: 8x128-lane vector unit, ~2 FMA issues/cycle at ~1.4 GHz
    ~= 5.7e12 fp32 FLOP/s.  DGS_ROOFLINE_VPU overrides.
  * HBM_BW: 819e9 B/s (public v5e).  DGS_ROOFLINE_BW overrides.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np

from ..config import tri_size
from ..ops import formulas

MXU_PEAK_EFF = float(os.environ.get("DGS_ROOFLINE_MXU", 197e12 / 6))
VPU_PEAK = float(os.environ.get("DGS_ROOFLINE_VPU", 5.7e12))
HBM_BW = float(os.environ.get("DGS_ROOFLINE_BW", 819e9))


def pair_count(ent_tile, num_tiles: int, s_tile) -> int:
    """Exact same-tile (entry, sample) pair total sum_t E_t * S_t (the
    reference's hot-loop work, forward.cu:104-144)."""
    ent_tile = np.asarray(ent_tile).reshape(-1)
    s_tile = np.asarray(s_tile).reshape(-1)
    e_t = np.bincount(ent_tile[ent_tile < num_tiles],
                      minlength=num_tiles)
    s_t = np.bincount(s_tile[s_tile < num_tiles], minlength=num_tiles)
    return int((e_t.astype(np.int64) * s_t.astype(np.int64)).sum())


def pair_flops(orders: Sequence[str], D: int, C: int,
               folded: bool = True) -> Tuple[float, float]:
    """(vpu_flops, mxu_macs) per pair, fwd + bwd, for the shipping kernel
    modes (folded-values by default).  Hand-derived counts:

    forward (folded): X (D sub), conic_apply (2 D^2 - D), power (2 D + 1),
      exp (~8), PSD+tile mask (~3)  -> VPU; one (R, BP)x(BP, BN) dot
      -> R MACs/pair with R = C * sum_k m_k (folded_structure).
    backward: the same pair context (as above), h chains (2 K C),
      vjp_params_fused ~ (S0: 2K) + (W: 2 K D eff ~ 2(K + D^2)) +
      (z/dmu/dcon: ~ 6 D + 5 tri) + poly recompute for lap/third
      (~3 tri + 7 tri3)  -> VPU; folded dvalues dot -> R MACs/pair.
    """
    tri = tri_size(D)
    K = sum(formulas.n_unique(o, D) for o in orders)
    meta, _ = formulas.folded_structure(tuple(orders), D)
    R = C * sum(len(m) for m in meta)
    ctx = D + (2 * D * D - D) + (2 * D + 1) + 8 + 3
    fwd_vpu = ctx
    fwd_macs = R if folded else K * C
    if not folded:
        # classic: per-component polynomial materialization + G multiply
        fwd_vpu += 3 * K
    n_lap = formulas.n_unique("laplacian", D) if "laplacian" in orders else 0
    n_3 = formulas.n_unique("third", D) if "third" in orders else 0
    bwd_vpu = (ctx + 2 * K * C
               + 2 * K + 2 * (K + D * D) + 6 * D + 5 * tri
               + 3 * n_lap + 7 * n_3)
    bwd_macs = R if folded else K * C
    return float(fwd_vpu + bwd_vpu), float(fwd_macs + bwd_macs)


def step_roofline(orders: Sequence[str], D: int, C: int, pairs: int,
                  N: int, E: int, folded: bool = True) -> dict:
    """Speed-of-light step-time model.  HBM bytes: the packed (K*C, Np)
    output + two cotangent layouts (write + read each), the per-entry
    operands once per block visit (approximated as 3x the entry rows), and
    the folded operands (fold read fwd, ct_beta write+read bwd)."""
    tri = tri_size(D)
    K = sum(formulas.n_unique(o, D) for o in orders)
    meta, n_mono = formulas.folded_structure(tuple(orders), D)
    R = C * sum(len(m) for m in meta)
    vpu, macs = pair_flops(orders, D, C, folded)
    vpu_t = pairs * vpu / VPU_PEAK
    mxu_t = pairs * macs * 2 / MXU_PEAK_EFF
    out_bytes = 3 * 2 * K * C * N * 4          # out + 2 ct layouts, w+r
    ent_bytes = 3 * (1 + D + tri + C + (2 + C) * sum(len(m) for m in meta)
                     if folded else 1 + D + tri + C) * E * 4
    fold_bytes = (2 * R * N * 4) if folded else 0
    bytes_total = out_bytes + ent_bytes + fold_bytes
    hbm_t = bytes_total / HBM_BW
    sol = max(vpu_t, mxu_t, hbm_t)
    return {
        "pairs": pairs,
        "flops_per_step": pairs * (vpu + 2 * macs),
        "sol_step_s": sol,
        "sol_vpu_s": vpu_t,
        "sol_mxu_s": mxu_t,
        "sol_hbm_s": hbm_t,
        "bound": ("vpu" if sol == vpu_t
                  else "mxu" if sol == mxu_t else "hbm"),
    }
