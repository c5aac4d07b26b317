"""Decompose the config-4 dynamics training step on TPU.

Profiles the two halves of models/dynamics.train's step separately (their
compiles are minutes shorter than the full scan step):
  * rollout: 2 aggregate_pallas fwd+bwd through the residual update
  * eval: the 65k-point tiled field evaluation fwd+bwd (fresh points per
    step, hoisted Gaussian binning, auto-tiled grid)
Prints one JSON line per phase plus the top device ops.

Env: DYN_P, DYN_EVAL, DYN_ROLLOUT, DYN_PROFILE=rollout|eval|none.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from dgs_tpu.config import SamplerConfig
from dgs_tpu.models import dynamics
from dgs_tpu.models.field import init_field
from dgs_tpu.ops import aggregation
from dgs_tpu.oracle.dense import radii as compute_radii
from dgs_tpu.utils.profiling import trace, device_op_times

STEPS = 4


def timed(run, *args):
    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(*args)
    jax.block_until_ready(out)
    t3 = time.perf_counter() - t0
    return (t3 - t1) / (2 * STEPS)


def main():
    P = int(os.environ.get("DYN_P", 100_000))
    n_eval = int(os.environ.get("DYN_EVAL", 65_536))
    rollout = int(os.environ.get("DYN_ROLLOUT", 2))
    D = 2
    sigma = 3.0 * 2.0 / max(P, 1) ** 0.5

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        field = init_field(jax.random.PRNGKey(0), P, D, 1, sigma=sigma)
        cov = field.covariances()
        con = field.conics()
        rad = compute_radii(cov, D, 3.0, 1e-12)
    cfg = SamplerConfig(
        eig_floor=1e-12,
        tile_size=float(os.environ.get("T100K_DTILE", 0.51)),
        axis_radii=os.environ.get("BENCH_AXIS", "1") == "1",
        ellip_cull=os.environ.get("BENCH_ELLIP", "1") == "1",
        work_span_fwd=2, work_span_bwd=2)

    agg_tile = os.environ.get("DYN_AGG_TILE")
    if agg_tile is not None:
        import dataclasses

        cfg_a, aplan = aggregation.plan_pallas(
            dataclasses.replace(cfg.with_dims(D),
                                tile_size=float(agg_tile)),
            field.means, rad, auto_tile=False)
    else:
        cfg_a, aplan = aggregation.plan_pallas(
            cfg.with_dims(D), field.means, rad)
    print(json.dumps({"agg_tile": cfg_a.tile_size, "agg_plan": list(aplan)}))
    nbr = jax.jit(functools.partial(
        aggregation.preprocess_pallas, cfg_a, plan=aplan
    ))(field.means, con, rad)
    params = dynamics.init_dynamics_params(
        jax.random.PRNGKey(2), P, 1, D, ladder=True)
    eval_u = dynamics.make_value_eval(cfg, field, "tiled", n_eval=n_eval,
                                      with_overflow=True, padded=True)

    def rollout_loss(params, values):
        stacked = []
        for _ in range(rollout):
            values = dynamics.rollout_step(params, values, nbr, ladder=True)
            stacked.append(values)
        return sum(jnp.sum(v * v) for v in stacked)

    @jax.jit
    def run_rollout(params, values):
        def body(c, _):
            g, gv = jax.grad(rollout_loss, argnums=(0, 1))(*c)
            return (jax.tree.map(lambda a, b: a - 1e-12 * b, c[0], g),
                    c[1] - 1e-12 * gv), None
        return jax.lax.scan(body, (params, values), None, length=STEPS)[0]

    def eval_loss(V, key):
        x = jax.random.uniform(key, (n_eval, D), minval=-1.0, maxval=1.0)
        u, perm, of = eval_u(V, x)
        return jnp.sum(u * u), of

    @jax.jit
    def run_eval(V, key):
        def body(c, k):
            (l, of), g = jax.value_and_grad(
                eval_loss, has_aux=True)(c, k)
            return c - 1e-12 * g, of
        return jax.lax.scan(body, V, jax.random.split(key, STEPS))

    V = jnp.concatenate([field.values] * rollout, axis=1)
    dt_r = timed(run_rollout, params, field.values)
    dt_e = timed(run_eval, V, jax.random.PRNGKey(3))
    print(json.dumps({
        "rollout_ms": round(dt_r * 1e3, 2), "eval_ms": round(dt_e * 1e3, 2),
        "P": P, "n_eval": n_eval, "rollout": rollout,
        "eval_tile": None,
    }))

    which = os.environ.get("DYN_PROFILE", "eval")
    logdir = "/tmp/dyn_trace"
    if which != "none":
        with trace(logdir):
            if which == "eval":
                out = run_eval(V, jax.random.PRNGKey(4))
            else:
                out = run_rollout(params, field.values)
            jax.block_until_ready(out)
        for rec in device_op_times(logdir, top=18, steps=STEPS):
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
