"""Headline benchmark: Gaussian point-samples/sec/chip, fused fwd+bwd.

BASELINE.json config 3: 100k Gaussians, 1M samples, fused value + derivative
+ Hessian forward/backward through the tiled Pallas path, including per-step
re-binning (the reference re-bins every step too - SURVEY.md 3.5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured throughput / the target recorded in BASELINE.md
(50M samples/s/chip - see "Targets" there; the reference publishes no numbers,
BASELINE.json "published": {}).

Env overrides: BENCH_P, BENCH_N, BENCH_STEPS, BENCH_METHOD, BENCH_TILE,
BENCH_ORDERS (comma list; "value,derivative,laplacian,third" is the
reference's full per-step workload, SURVEY.md 3.5).
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from dgs_tpu.config import SamplerConfig
from dgs_tpu.models.field import init_field
from dgs_tpu.models.pigs import field_outputs
from dgs_tpu.utils import native

TARGET_SAMPLES_PER_SEC = 50e6  # recorded target, see BASELINE.md

ORDERS = tuple(
    os.environ.get("BENCH_ORDERS", "value,derivative,laplacian").split(",")
)


def main():
    P = int(os.environ.get("BENCH_P", 100_000))
    N = int(os.environ.get("BENCH_N", 1_000_000))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    # Default tile tuned on-chip: 0.051 (= 0.51/10) minimizes pair work at
    # the 100k-Gaussian / sigma~0.0063 operating point (0.0637 and 0.0425 are
    # within ~2%; 0.51, the reference's world BLOCK_SIZE, is ~1.7x slower and
    # overflows the backward work cap).
    D = int(os.environ.get("BENCH_D", 2))
    # D=3's ~1500 entries/tile make the chunk-packed path (~80-90% pair
    # density) beat the range-sweep tiled path (on-chip sweeps,
    # tools/sweep_chunked.py: 192.9 vs 209.9 ms/step at tile 0.25).
    method = os.environ.get("BENCH_METHOD", "chunked" if D == 3 else "tiled")
    # Tile default tuned on-chip per D (D=3 footprints cover more tiles per
    # Gaussian; a coarser grid balances entry count vs pair density).
    # D=3: tile 0.2 with axis radii (round-4 sweep: 152.6 vs 158.3 ms at
    # 0.25; finer tiles lose - chunk-padding density and per-entry costs).
    tile = float(os.environ.get("BENCH_TILE", {2: 0.051, 3: 0.2}.get(D, 0.1)))
    C = int(os.environ.get("BENCH_C", 4))

    # sigma ~ 2/P^(1/D): footprints a few tiles wide at 100k Gaussians.
    sigma = float(os.environ.get("BENCH_SIGMA", 2.0 / max(P, 1) ** (1.0 / D)))
    # Init on the host CPU backend so the capacity planner never pulls data
    # back over the device tunnel (the first device->host transfer of a
    # process is pathologically slow on tunneled TPU backends).
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        field = init_field(jax.random.PRNGKey(0), P, D, C, sigma=sigma)
        samples = jax.random.uniform(
            jax.random.PRNGKey(1), (N, D), minval=-1.0, maxval=1.0
        )

    # Exact static capacities from the native host planner (csrc/
    # host_binning.cpp): sweep caps sized to the true per-block maxima, so
    # the kernel grid carries no predicated-off slack and overflow is 0 by
    # construction.
    blocks = SamplerConfig()
    cfg = SamplerConfig(
        tile_size=tile,
        max_tiles_per_gaussian=int(os.environ.get("BENCH_R", 3)),
        eig_floor=float(os.environ.get("BENCH_EIG_FLOOR", 1e-12)),
        block_n=int(os.environ.get("BENCH_BN", blocks.block_n)),
        # The chunked path uses (block_n, block_p) for BOTH directions;
        # 512x256 won the D=3 chunked sweep.  The 4-order D=3 workload
        # must drop to 128-entry blocks: its K*C=80 cotangent rows exceed
        # the 16MB scoped-VMEM stack at 512x256 (compiler OOM, round 2/5).
        block_p=int(os.environ.get(
            "BENCH_BP",
            (128 if "third" in ORDERS else 256)
            if method == "chunked" and D == 3 else blocks.block_p)),
        # Very large per-chip sample counts need coarser backward sample
        # blocks to keep the work list inside scalar SMEM.
        block_n_bwd=int(os.environ.get(
            "BENCH_BBN", 512 if N > 4_000_000 else blocks.bwd_blocks[0])),
        # Wider backward entry blocks amortize the pinned-precision dot
        # passes: the post-fix D=2 re-sweep put 256x256 bwd blocks 4 ms
        # ahead of the old 256x128 (tools/sweep_blocks.py round 4); D=3
        # already used 256.
        block_p_bwd=int(os.environ.get("BENCH_BBP", 256)),
        # BENCH_MOMENTS=0/1 forces the moment-form backward off/on; unset
        # keeps the per-D auto default (ops/sampling.sample_tiled_multi).
        moment_backward=(None if "BENCH_MOMENTS" not in os.environ
                         else os.environ["BENCH_MOMENTS"] == "1"),
        # Multi-block work items (kernels/tiled.work_list span): amortize
        # the fixed per-grid-step cost over span column sub-blocks.  Round-4
        # A/B: span 2 wins at D=2 (-1.6 ms), neutral at D=3 (compute-bound
        # kernels); large shards need span to keep work lists inside SMEM.
        work_span_fwd=int(os.environ.get("BENCH_SPAN_F", 2 if D == 2 else 1)),
        work_span_bwd=int(os.environ.get("BENCH_SPAN_B", 2 if D == 2 else 1)),
        # Tight per-axis AABB footprints (oracle.dense.radii_axis): same
        # 3-sigma support, fewer duplicates/pairs on anisotropic fields
        # (-23% pairs at the D=3 operating point).  BENCH_AXIS=0 restores
        # the reference's isotropic sqrt(lambda_max) box.
        axis_radii=os.environ.get("BENCH_AXIS", "1") == "1",
        # Exact ellipsoid-vs-tile cull (binning/grid.ellip_keep): drops the
        # AABB corner tiles the 3-sigma ellipsoid never touches.  On-chip
        # round 5: D=3 233.3 -> 207.4 ms (-11%); D=2 LOSES ~2 ms (sub-tile
        # footprints leave no corners to cull and the in-step CD solve
        # costs ~2 ms) - so the default is per-D.  BENCH_ELLIP overrides.
        ellip_cull=os.environ.get("BENCH_ELLIP", "1" if D >= 3 else "0")
        == "1",
        # BENCH_SEP=0/1 forces the separable MXU pair math off/on (unset =
        # per-D auto); the tradeoff flipped when kernel dot precision was
        # pinned to HIGHEST.
        separable_kernels=(None if "BENCH_SEP" not in os.environ
                           else os.environ["BENCH_SEP"] == "1"),
        # BENCH_FOLDED=0/1 forces the folded-values kernels off/on (unset =
        # auto ON where the wrap-free certificate holds): one G contraction
        # per pair block instead of K per-component value dots.
        folded_values=(None if "BENCH_FOLDED" not in os.environ
                       else os.environ["BENCH_FOLDED"] == "1"),
        # A/B knobs for the folded-backward variants (defaults off - the
        # classic dvalue dots hide under the VPU-bound backward).
        folded_dvals=(None if "BENCH_FDV" not in os.environ
                      else os.environ["BENCH_FDV"] == "1"),
        folded_vjp=(None if "BENCH_FVJP" not in os.environ
                    else os.environ["BENCH_FVJP"] == "1"),
        h_matmul=(None if "BENCH_HMM" not in os.environ
                  else os.environ["BENCH_HMM"] == "1"),
        # BENCH_FASTMATH=1: documented fast-math mode (one-pass bf16 MXU
        # dots).  Outputs do NOT meet the fp32 gate - label any number
        # measured this way.
        fast_math_dots=os.environ.get("BENCH_FASTMATH", "0") == "1",
    )
    if method == "chunked":
        from dgs_tpu.ops import sampling_chunked

        # Plan on the host CPU backend: the eager plan does device_get, and
        # the first device->host transfer over the tunnel is pathological.
        with jax.default_device(cpu):
            cfg, cplan = sampling_chunked.plan_chunked(
                cfg, field.means, field.covariances(), samples)
    else:
        plan = native.plan_capacities(cfg, field.means, field.covariances(),
                                      samples)
        cfg = native.config_from_plan(cfg, plan, P)
    # Computed roofline (utils/roofline.py): exact same-tile pair totals
    # from one CPU binning build -> speed-of-light step-time model for the
    # chip (SURVEY.md section 5; replaces interpreting vs_baseline as MFU).
    from dgs_tpu.binning import grid as binning
    from dgs_tpu.utils import roofline

    with jax.default_device(cpu):
        state_cpu = binning.build(cfg, field.means, field.covariances(),
                                  samples)
        pairs = roofline.pair_count(
            jax.device_get(state_cpu.ent_tile),
            binning.num_tiles(cfg, D), jax.device_get(state_cpu.s_tile))
        E_cnt = int(jax.device_get(state_cpu.num_entries))
        folded_active = bool(cfg.folded_values)
        rl = roofline.step_roofline(ORDERS, D, C, pairs, N, E_cnt,
                                    folded=folded_active)
        del state_cpu

    dev = jax.devices()[0]
    field = jax.device_put(field, dev)
    samples = jax.device_put(samples, dev)

    def loss_fn(field, samples, sb):
        # Sum-of-squares over the FULL symmetric tensors, computed from the
        # unique components with their mirror multiplicities (permutation
        # invariant -> also keep outputs tile-sorted, block-padded (pad rows
        # are zero); all three skip epilogues without changing the value).
        packed = method in ("tiled", "chunked")
        if method == "chunked":
            from dgs_tpu.ops import sampling_chunked

            outs, diag = sampling_chunked.sample_chunked(
                cfg, field.means, field.values, field.conics(),
                field.covariances(), samples, cplan, sb, ORDERS,
                padded_outputs=True)
        else:
            outs, diag = field_outputs(
                cfg, field, samples, orders=ORDERS, method=method,
                sorted_outputs=packed, unique_outputs=packed,
                padded_outputs=packed, sample_binning=sb)
        diag = {k: v for k, v in diag.items() if k != "perm"}
        if packed:
            from dgs_tpu.ops import formulas

            # padded outputs are lane-major (n_unique, C, Np).
            loss = sum(
                jnp.einsum(
                    "ucn,u->",
                    o * o,
                    jnp.asarray(formulas.sym_multiplicity(order, D),
                                jnp.float32),
                )
                for order, o in outs.items()
            )
        else:
            loss = sum(jnp.sum(o * o) for o in outs.values())
        # Mean over samples: keeps the dependency-carrying SGD touch's
        # parameter drift scale-independent (a sum loss at 16M samples
        # produces gradients large enough to move the means and break the
        # planned capacities).
        return loss / N, diag

    # One dispatch for the whole run: a lax.scan training loop (the standard
    # TPU production-loop shape - per-call dispatch over the tunneled device
    # costs ~20 ms, which a scan amortizes to zero).
    @functools.partial(jax.jit, static_argnums=(3,))
    def run(field, samples, sb, n):
        def step(field, _):
            (loss, diag), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(field, samples, sb)
            # Dependency-carrying SGD touch: each step consumes the previous
            # step's gradients (like a real optimizer), so the timing below
            # measures the true sequential pipeline.
            field = jax.tree.map(lambda p, g: p - 1e-12 * g, field, grads)
            return field, (loss, diag)

        return jax.lax.scan(step, field, None, length=n)

    # The sample-side binning is parameter-independent: build it once and
    # reuse across steps (the Gaussian side re-bins every step, as the
    # reference does - SURVEY.md 3.5).
    from dgs_tpu.binning import grid as binning

    if method == "chunked":
        from dgs_tpu.ops import sampling_chunked

        sb = sampling_chunked.chunk_samples(cfg, samples, cplan, cfg.block_n)
    elif method == "tiled":
        sb = jax.jit(binning.bin_samples, static_argnums=0)(cfg, samples)
    else:
        sb = None

    # jax.block_until_ready can return EARLY over the tunneled backend for
    # some executables (measured: a 43 ms/step scan "completed" in 0.16 ms),
    # so every sync below is a real device->host read of a scalar.
    def sync(loss):
        return float(jax.device_get(loss[-1]))

    # Warmup / compile (also pays the pathological first-D2H cost).
    field_w, (loss_w, diag) = run(field, samples, sb, steps)
    sync(loss_w)

    # Time one chained run, then three; the difference is two runs of pure
    # execution (dispatch + D2H + any fixed tunnel latency cancel exactly).
    t0 = time.perf_counter()
    f, (loss, diag) = run(field_w, samples, sb, steps)
    sync(loss)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    f, (loss, _) = run(field_w, samples, sb, steps)
    f, (loss, _) = run(f, samples, sb, steps)
    f, (loss, diag) = run(f, samples, sb, steps)
    sync(loss)
    t_three = time.perf_counter() - t0
    dt = (t_three - t_one) / (2 * steps)
    diag = jax.tree.map(lambda x: x[-1], diag)

    overflow = {k: int(v) for k, v in diag.items()}
    if any(overflow.values()):
        print(f"WARNING: overflow diagnostics {overflow}", file=sys.stderr)
    samples_per_sec = N / dt

    print(json.dumps({
        "metric": "gaussian_point_samples_per_sec_per_chip_fwd_bwd",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_sec / TARGET_SAMPLES_PER_SEC, 4),
        "vs_speed_of_light": round(rl["sol_step_s"] / dt, 4),
    }))
    print(
        json.dumps({
            "detail": {
                "P": P, "N": N, "D": D, "C": C, "orders": ORDERS,
                "method": method, "median_step_s": round(dt, 5),
                "sigma": round(sigma, 5), "tile": tile,
                "backend": jax.default_backend(),
                "overflow": overflow,
                "roofline": {k: (round(v, 6) if isinstance(v, float) else v)
                             for k, v in rl.items()},
            }
        }),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
