"""Profile the Pallas aggregation fwd+bwd step on TPU: per-op device times.

Env: AGG_P, AGG_L, AGG_K, AGG_NFREQ, AGG_BN, AGG_BE.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from dgs_tpu.config import SamplerConfig
from dgs_tpu.models.field import init_field
from dgs_tpu.ops import aggregation
from dgs_tpu.oracle.dense import radii as compute_radii
from dgs_tpu.utils.profiling import trace, device_op_times


def main():
    P = int(os.environ.get("AGG_P", 100_000))
    L = int(os.environ.get("AGG_L", 8))
    K = int(os.environ.get("AGG_K", 8))
    nfreq = int(os.environ.get("AGG_NFREQ", 4))
    D = 2
    sigma = float(os.environ.get("AGG_SIGMA", 2.0 / max(P, 1) ** 0.5))
    bn = int(os.environ.get("AGG_BN", 32))
    be = int(os.environ.get("AGG_BE", 128))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        field = init_field(jax.random.PRNGKey(0), P, D, L, sigma=sigma)
        ks = jax.random.split(jax.random.PRNGKey(1), 6)
        E = nfreq * D * 2 + 1
        params = dict(
            features=jax.random.normal(ks[0], (P, L)) * 0.1,
            transform=jax.random.normal(ks[1], (L, L)) * 0.1,
            queries=jax.random.normal(ks[2], (P, K)) * 0.1,
            keys=jax.random.normal(ks[3], (P, K)) * 0.1,
            frequencies=(jnp.arange(1, nfreq + 1, dtype=jnp.float32)
                         if os.environ.get("AGG_LADDER", "0") == "1" else
                         jnp.abs(jax.random.normal(ks[4], (nfreq,))) + 0.5),
            distance_transform=jax.random.normal(ks[5], (2 * E,)) * 0.1,
        )
        cov = field.covariances()
        con = field.conics()

    cfg = SamplerConfig(tile_size=float(os.environ.get("AGG_TILE", 0.051)),
                        eig_floor=1e-12)
    rad_host = compute_radii(cov, D, cfg.radius_sigma, cfg.eig_floor)
    cfg, plan = aggregation.plan_pallas(
        cfg, field.means, rad_host, block_n=bn, block_e=be)
    print(json.dumps({"plan": list(plan), "tile": cfg.tile_size}))

    dev = jax.devices()[0]
    means = jax.device_put(field.means, dev)
    con = jax.device_put(con, dev)
    rad = jax.device_put(rad_host, dev)
    params = jax.device_put(params, dev)

    agg = jax.jit(functools.partial(
        aggregation.preprocess_pallas, cfg, plan=plan,
        block_n=bn, block_e=be))(means, con, rad)
    jax.block_until_ready(agg)

    def loss(p, agg):
        out = aggregation.aggregate_pallas(
            p["features"], p["transform"], p["queries"], p["keys"],
            p["frequencies"], p["distance_transform"], agg,
            period=None, block_n=bn, block_e=be,
            ladder_frequencies=os.environ.get("AGG_LADDER", "0") == "1")
        return jnp.sum(out * out)

    STEPS = 5

    @jax.jit
    def run(p, agg):
        def body(p, _):
            g = jax.grad(loss)(p, agg)
            p = jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
            return p, None
        return jax.lax.scan(body, p, None, length=STEPS)[0]

    out = run(params, agg)
    jax.block_until_ready(out)

    which = os.environ.get("AGG_PROFILE", "step")
    logdir = "/tmp/agg_trace"
    if which == "preprocess":
        @jax.jit
        def pre_n(means, con, rad):
            def body(m, _):
                nbr = aggregation.preprocess_pallas(
                    cfg, m, con, rad, plan=plan, block_n=bn, block_e=be)
                m = m + 1e-12 * nbr.ctr_static[nbr.pos, -1:]
                return m, nbr.overflow
            return jax.lax.scan(body, means, None, length=STEPS)
        out = pre_n(means, con, rad)
        jax.block_until_ready(out)
        with trace(logdir):
            out = pre_n(means, con, rad)
            jax.block_until_ready(out)
    else:
        with trace(logdir):
            out = run(params, agg)
            jax.block_until_ready(out)

    for rec in device_op_times(logdir, top=20, steps=STEPS):
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
