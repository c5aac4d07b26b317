"""Per-op device-time profile of the headline sampling step (bench.py's
workload) via utils.profiling.device_op_times.

Env: same knobs as bench.py (BENCH_P/N/D/TILE/METHOD/BN/BP/ORDERS...),
plus PROF_STEPS (5) and PROF_TOP (20).
"""

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dgs_tpu.config import SamplerConfig
from dgs_tpu.models.field import init_field
from dgs_tpu.models.pigs import field_outputs
from dgs_tpu.ops import formulas
from dgs_tpu.utils import native
from dgs_tpu.utils.profiling import device_op_times, trace

ORDERS = tuple(
    os.environ.get("BENCH_ORDERS", "value,derivative,laplacian").split(",")
)


def main():
    P = int(os.environ.get("BENCH_P", 100_000))
    N = int(os.environ.get("BENCH_N", 1_000_000))
    D = int(os.environ.get("BENCH_D", 2))
    method = os.environ.get("BENCH_METHOD", "tiled")
    steps = int(os.environ.get("PROF_STEPS", 5))
    tile = float(os.environ.get("BENCH_TILE", {2: 0.051, 3: 0.25}.get(D, 0.1)))
    C = int(os.environ.get("BENCH_C", 4))
    sigma = float(os.environ.get("BENCH_SIGMA", 2.0 / max(P, 1) ** (1.0 / D)))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        field = init_field(jax.random.PRNGKey(0), P, D, C, sigma=sigma)
        samples = jax.random.uniform(
            jax.random.PRNGKey(1), (N, D), minval=-1.0, maxval=1.0)

    blocks = SamplerConfig()
    cfg = SamplerConfig(
        tile_size=tile, max_tiles_per_gaussian=3,
        eig_floor=float(os.environ.get("BENCH_EIG_FLOOR", 1e-12)),
        block_n=int(os.environ.get("BENCH_BN", blocks.block_n)),
        block_p=int(os.environ.get("BENCH_BP", blocks.block_p)),
        block_n_bwd=int(os.environ.get("BENCH_BBN", blocks.bwd_blocks[0])),
        block_p_bwd=int(os.environ.get(
            "BENCH_BBP", 256 if D == 3 else blocks.bwd_blocks[1])),
        moment_backward=(None if "BENCH_MOMENTS" not in os.environ
                         else os.environ["BENCH_MOMENTS"] == "1"),
        work_span_fwd=int(os.environ.get("BENCH_SPAN_F", 1)),
        work_span_bwd=int(os.environ.get("BENCH_SPAN_B", 1)),
        axis_radii=os.environ.get("BENCH_AXIS", "1") == "1",
        folded_values=(None if "BENCH_FOLDED" not in os.environ
                       else os.environ["BENCH_FOLDED"] == "1"),
        fast_math_dots=os.environ.get("BENCH_FASTMATH", "0") == "1",
    )
    if method == "chunked":
        from dgs_tpu.ops import sampling_chunked

        with jax.default_device(cpu):
            cfg, cplan = sampling_chunked.plan_chunked(
                cfg, field.means, field.covariances(), samples)
    else:
        plan = native.plan_capacities(cfg, field.means, field.covariances(),
                                      samples)
        cfg = native.config_from_plan(cfg, plan, P)
    dev = jax.devices()[0]
    field = jax.device_put(field, dev)
    samples = jax.device_put(samples, dev)

    def loss_fn(field, samples, sb):
        if method == "chunked":
            from dgs_tpu.ops import sampling_chunked

            outs, diag = sampling_chunked.sample_chunked(
                cfg, field.means, field.values, field.conics(),
                field.covariances(), samples, cplan, sb, ORDERS,
                padded_outputs=True)
        else:
            outs, diag = field_outputs(
                cfg, field, samples, orders=ORDERS, method=method,
                sorted_outputs=True, unique_outputs=True,
                padded_outputs=True, sample_binning=sb)
        loss = sum(
            jnp.einsum("ucn,u->", o * o,
                       jnp.asarray(formulas.sym_multiplicity(order, D),
                                   jnp.float32))
            for order, o in outs.items())
        return loss / N, None

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(field, samples, sb, n):
        def step(field, _):
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(field, samples, sb)
            field = jax.tree.map(lambda p, g: p - 1e-12 * g, field, grads)
            return field, loss

        return jax.lax.scan(step, field, None, length=n)

    if method == "chunked":
        from dgs_tpu.ops import sampling_chunked

        sb = sampling_chunked.chunk_samples(cfg, samples, cplan, cfg.block_n)
    else:
        from dgs_tpu.binning import grid as binning

        sb = jax.jit(binning.bin_samples, static_argnums=0)(cfg, samples)

    f, loss = run(field, samples, sb, steps)
    float(jax.device_get(loss[-1]))
    logdir = "/tmp/step_trace"
    with trace(logdir):
        f, loss = run(f, samples, sb, steps)
        float(jax.device_get(loss[-1]))

    total = 0.0
    for rec in device_op_times(logdir, top=int(os.environ.get("PROF_TOP", 20)),
                               steps=steps):
        total += rec["ms_per_step"]
        print(json.dumps(rec))
    print(f"# top-N total {total:.2f} ms/step  (D={D} method={method} "
          f"tile={tile})")


if __name__ == "__main__":
    main()
