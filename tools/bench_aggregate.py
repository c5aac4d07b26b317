"""Neighbor-aggregation benchmark (the reference's second subsystem,
aggregate_neighbors.cu): grid preprocess + attention aggregation fwd+bwd.

Measures Gaussians/s through preprocess_grid (collision search + neighbor
table) and through aggregate + grad over all six parameter groups, at a
PIGS-dynamics-like operating point.  Prints one JSON line per phase.

Env: AGG_P, AGG_L (feature channels), AGG_K (query/key dim), AGG_NFREQ,
AGG_STEPS, AGG_SIGMA, AGG_METHOD (xla | pallas), AGG_BN/AGG_BE (pallas
blocks), AGG_LADDER=1 (integer-laddered frequencies + the angle-addition
sincos recurrence in the kernels - the production parameterization,
models/dynamics.py init).
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
from dgs_tpu.models.field import init_field
from dgs_tpu.ops import aggregation
from dgs_tpu.oracle.dense import radii as compute_radii
from dgs_tpu.utils import native


def main():
    P = int(os.environ.get("AGG_P", 100_000))
    L = int(os.environ.get("AGG_L", 8))
    K = int(os.environ.get("AGG_K", 8))
    nfreq = int(os.environ.get("AGG_NFREQ", 4))
    steps = int(os.environ.get("AGG_STEPS", 10))
    D = 2
    sigma = float(os.environ.get("AGG_SIGMA", 2.0 / max(P, 1) ** 0.5))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        field = init_field(jax.random.PRNGKey(0), P, D, L, sigma=sigma)
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 6)
        E = nfreq * D * 2 + 1
        ladder = os.environ.get("AGG_LADDER", "0") == "1"
        params = dict(
            features=jax.random.normal(ks[0], (P, L)) * 0.1,
            transform=jax.random.normal(ks[1], (L, L)) * 0.1,
            queries=jax.random.normal(ks[2], (P, K)) * 0.1,
            keys=jax.random.normal(ks[3], (P, K)) * 0.1,
            frequencies=(jnp.arange(1, nfreq + 1, dtype=jnp.float32)
                         if ladder else
                         jnp.abs(jax.random.normal(ks[4], (nfreq,))) + 0.5),
            distance_transform=jax.random.normal(ks[5], (2 * E,)) * 0.1,
        )
        cov = field.covariances()
        con = field.conics()

    method = os.environ.get("AGG_METHOD", "pallas")
    cfg = SamplerConfig(tile_size=float(os.environ.get("AGG_TILE", 0.051)),
                        eig_floor=1e-12)
    rad_host = compute_radii(cov, D, cfg.radius_sigma, cfg.eig_floor)
    bn = int(os.environ.get("AGG_BN", 32))
    be = int(os.environ.get("AGG_BE", 128))
    if method == "pallas":
        cfg, plan = aggregation.plan_pallas(
            cfg, field.means, rad_host, block_n=bn, block_e=be)
        NC = -1
    else:
        cfg, NC, rect = aggregation.suggest_grid_capacities(
            cfg, field.means, rad_host
        )

    dev = jax.devices()[0]
    means = jax.device_put(field.means, dev)
    con = jax.device_put(con, dev)
    rad = jax.device_put(rad_host, dev)
    params = jax.device_put(params, dev)

    if method == "pallas":
        pre = functools.partial(
            aggregation.preprocess_pallas, cfg,
            plan=plan, block_n=bn, block_e=be,
        )
    else:
        pre = functools.partial(
            aggregation.preprocess_grid, cfg,
            neighbor_capacity=NC, rect_capacity=rect,
        )

    @jax.jit
    def preprocess_n(means, con, rad, n):
        def body(m, _):
            nbr = pre(m, con, rad)
            # dependency: nudge means by a tiny function of the table
            dep = (nbr.ctr_static[nbr.pos, -1:]
                   if method == "pallas"
                   else nbr.inv_total_densities[:, None])
            m = m + 1e-12 * dep
            return m, nbr.overflow
        return jax.lax.scan(body, means, None, length=steps)

    # device_get sync + 1-vs-3 chained-run difference: block_until_ready
    # can return early over the tunneled backend (see bench.py).
    m2, of = preprocess_n(means, con, rad, steps)
    float(jax.device_get(m2[0, 0]))
    t0 = time.perf_counter()
    m3, of = preprocess_n(m2, con, rad, steps)
    float(jax.device_get(m3[0, 0]))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    m3, of = preprocess_n(m2, con, rad, steps)
    m3, of = preprocess_n(m3, con, rad, steps)
    m3, of = preprocess_n(m3, con, rad, steps)
    float(jax.device_get(m3[0, 0]))
    dt_pre = (time.perf_counter() - t0 - t_one) / (2 * steps)

    nbr = jax.jit(pre)(means, con, rad)
    jax.block_until_ready(nbr)

    agg_fn = (functools.partial(aggregation.aggregate_pallas,
                                period=None, block_n=bn, block_e=be,
                                ladder_frequencies=ladder)
              if method == "pallas" else aggregation.aggregate)

    def loss(p, nbr):
        out = agg_fn(
            p["features"], p["transform"], p["queries"], p["keys"],
            p["frequencies"], p["distance_transform"], nbr,
        )
        return jnp.sum(out * out)

    @jax.jit
    def train_n(p, nbr):
        def body(p, _):
            l, g = jax.value_and_grad(loss)(p, nbr)
            p = jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
            return p, l
        return jax.lax.scan(body, p, None, length=steps)

    p2, ls = train_n(params, nbr)
    float(jax.device_get(ls[-1]))
    t0 = time.perf_counter()
    p3, ls = train_n(p2, nbr)
    float(jax.device_get(ls[-1]))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    p3, ls = train_n(p2, nbr)
    p3, ls = train_n(p3, nbr)
    p3, ls = train_n(p3, nbr)
    float(jax.device_get(ls[-1]))
    dt_fb = (time.perf_counter() - t0 - t_one) / (2 * steps)

    overflow = int(jax.device_get(nbr.overflow))
    print(json.dumps({
        "metric": "aggregation_preprocess_gaussians_per_sec",
        "value": round(P / dt_pre, 1),
        "unit": "gaussians/s",
        "step_s": round(dt_pre, 5),
        "neighbor_capacity": NC,
        "overflow": overflow,
    }))
    print(json.dumps({
        "metric": "aggregation_fwd_bwd_gaussians_per_sec",
        "value": round(P / dt_fb, 1),
        "unit": "gaussians/s",
        "step_s": round(dt_fb, 5),
        "P": P, "L": L, "K": K, "nfreq": nfreq, "method": method,
        "ladder": ladder,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
