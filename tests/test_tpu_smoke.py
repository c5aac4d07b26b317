"""On-chip smoke suite: the compiled-Mosaic twins of the interpret-mode
kernel-vs-oracle tests (SURVEY.md section 4: the kernel-vs-oracle tier must
cover the shipping compilation mode).

The default test run forces CPU (conftest.py), so every other test exercises
the Pallas kernels in interpret mode only; an interpret-vs-compiled
divergence (e.g. the round-2 PSD-tolerance issue, kernels/tiled.py PSD_TOL)
would not fail any of them.  This file closes that gap.  Run it on the real
chip via:

    DGS_TEST_TPU=1 timeout 900 python -m pytest tests/test_tpu_smoke.py -v

(~7 distinct kernel shapes; first compile of each is a remote RPC, 20-60 s.
The TPU is single-tenant over the tunnel - never run two TPU processes.)
All tests auto-skip when the backend is not TPU, so the default CPU suite is
unaffected.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_gaussians, make_samples

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="real-chip smoke test (DGS_TEST_TPU=1, TPU backend only)",
    ),
]


def _tol(ref, rtol=3e-4):
    return dict(rtol=rtol, atol=1e-5 * max(1.0, float(np.abs(ref).max())))


@pytest.mark.parametrize("D", [2, 3])
def test_tiled_fwd_bwd_matches_oracle_on_chip(D):
    """Compiled tiled Pallas fwd + bwd vs the masked dense oracle."""
    from dgs_tpu.binning import grid as binning
    from dgs_tpu.config import SamplerConfig
    from dgs_tpu.oracle import dense as oracle
    from dgs_tpu.ops import sampling

    rng = np.random.default_rng(0)
    P, N, C = 200, 2048, 2
    means, values, covs, conics = make_gaussians(
        rng, P, D, C, sigma_range=(0.05, 0.15))
    samples = make_samples(rng, N, D)
    m, v, cov, c, s = map(jnp.asarray, (means, values, covs, conics, samples))

    cfg = SamplerConfig(tile_size=0.5, work_blocks_fwd=16,
                        work_blocks_bwd=32).with_dims(D)
    orders = ("value", "derivative", "laplacian")

    def run(m, v, c):
        outs, diag = sampling.sample_binned(
            cfg, m, v, c, cov, s, orders=orders)
        return outs, diag

    outs, diag = jax.jit(run)(m, v, c)
    for k in ("bin_overflow", "work_overflow_fwd", "work_overflow_bwd"):
        assert int(jax.device_get(diag[k])) == 0, k

    state = binning.build(cfg, m, cov, s)
    mask = binning.pair_mask_dense(cfg, state, s, P)
    for order in orders:
        ref = oracle.evaluate(order, m, v, c, s, pair_mask=mask)
        got = np.asarray(jax.device_get(outs[order]))
        np.testing.assert_allclose(got, np.asarray(ref), **_tol(ref),
                                   err_msg=f"D={D} {order} forward")

    def loss(m, v, c):
        outs, _ = run(m, v, c)
        return sum(jnp.sum(o * o) for o in outs.values())

    def oracle_loss(m, v, c):
        return sum(
            jnp.sum(oracle.evaluate(o, m, v, c, s, pair_mask=mask) ** 2)
            for o in orders
        )

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(m, v, c)
    g_ref = jax.grad(oracle_loss, argnums=(0, 1, 2))(m, v, c)
    for name, a, b in zip(("dmeans", "dvalues", "dconics"), g, g_ref):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(b), **_tol(b),
            err_msg=f"D={D} {name}")


def test_chunked_d3_matches_oracle_on_chip():
    """Compiled chunk-packed D=3 path (separable forward + moment-form
    backward - the production D=3 configuration) vs the masked oracle."""
    from dgs_tpu.binning import grid as binning
    from dgs_tpu.config import SamplerConfig
    from dgs_tpu.oracle import dense as oracle
    from dgs_tpu.ops import sampling_chunked

    rng = np.random.default_rng(1)
    P, N, C, D = 150, 2048, 2, 3
    means, values, covs, conics = make_gaussians(
        rng, P, D, C, sigma_range=(0.05, 0.12))
    samples = make_samples(rng, N, D)
    m, v, cov, c, s = map(jnp.asarray, (means, values, covs, conics, samples))

    cfg = SamplerConfig(tile_size=0.5, block_n=512, block_p=128).with_dims(D)
    cfg, plan = sampling_chunked.plan_chunked(cfg, m, cov, s)
    cs = sampling_chunked.chunk_samples(cfg, s, plan, cfg.block_n)
    orders = ("value", "laplacian")

    def run(m, v, c):
        outs, diag = sampling_chunked.sample_chunked(
            cfg, m, v, c, cov, s, plan, cs, orders)
        return outs, diag

    outs, diag = jax.jit(run)(m, v, c)
    for k, val in diag.items():
        if k != "perm":
            assert int(jax.device_get(val)) == 0, k

    state = binning.build(cfg, m, cov, s)
    mask = binning.pair_mask_dense(cfg, state, s, P)
    for order in orders:
        ref = oracle.evaluate(order, m, v, c, s, pair_mask=mask)
        got = np.asarray(jax.device_get(outs[order]))
        np.testing.assert_allclose(got, np.asarray(ref), **_tol(ref),
                                   err_msg=f"chunked {order}")

    def loss(m, v, c):
        outs, _ = run(m, v, c)
        return sum(jnp.sum(o * o) for o in outs.values())

    def oracle_loss(m, v, c):
        return sum(
            jnp.sum(oracle.evaluate(o, m, v, c, s, pair_mask=mask) ** 2)
            for o in orders
        )

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(m, v, c)
    g_ref = jax.grad(oracle_loss, argnums=(0, 1, 2))(m, v, c)
    for name, a, b in zip(("dmeans", "dvalues", "dconics"), g, g_ref):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(b), **_tol(b),
            err_msg=f"chunked {name}")


def test_aggregation_pallas_on_chip():
    """Compiled aggregation pair-sweep kernels (totals + forward + fused
    backward) vs the XLA table path: values and all six gradients."""
    from dgs_tpu.config import SamplerConfig
    from dgs_tpu.ops import aggregation
    from dgs_tpu.oracle.dense import radii as compute_radii

    rng = np.random.default_rng(2)
    P, D, C = 300, 2, 2
    means, values, covs, conics = make_gaussians(
        rng, P, D, C, sigma_range=(0.05, 0.2))
    m, cov, c = map(jnp.asarray, (means, covs, conics))
    cfg = SamplerConfig()
    rad = compute_radii(cov, D, cfg.radius_sigma, cfg.eig_floor)

    cfg2, plan = aggregation.plan_pallas(cfg, m, rad)
    agg = aggregation.preprocess_pallas(cfg2, m, c, rad, plan)
    assert int(jax.device_get(agg.overflow)) == 0
    nb = aggregation.preprocess_grid(cfg, m, c, rad)
    assert int(jax.device_get(nb.overflow)) == 0

    L, K, E = 4, 4, 9
    r = np.random.default_rng(3)
    args = tuple(map(jnp.asarray, (
        r.normal(size=(P, L)).astype(np.float32),
        r.normal(size=(L, L)).astype(np.float32),
        r.normal(size=(P, K)).astype(np.float32),
        r.normal(size=(P, K)).astype(np.float32),
        np.arange(1.0, 3.0).astype(np.float32),
        r.normal(size=(2 * E,)).astype(np.float32),
    )))

    got = jax.device_get(aggregation.aggregate_pallas(*args, agg))
    ref = jax.device_get(aggregation.aggregate(*args, nb))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-5)

    def loss(fn, structure):
        return lambda *a: jnp.sum(fn(*a, structure) ** 2)

    g = jax.jit(jax.grad(loss(aggregation.aggregate_pallas, agg),
                         argnums=tuple(range(6))))(*args)
    g_ref = jax.grad(loss(aggregation.aggregate, nb),
                     argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(jax.device_get(g), jax.device_get(g_ref))):
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-4 * max(1.0, float(np.abs(b).max())),
            err_msg=f"grad group {i}")
