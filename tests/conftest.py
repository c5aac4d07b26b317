"""Test harness configuration.

Forces an 8-device virtual CPU mesh so sharding tests run without a TPU pod
(SURVEY.md section 4: fake an N-device mesh via
``--xla_force_host_platform_device_count``).  Must run before jax is imported.
"""

import os

_ON_TPU = os.environ.get("DGS_TEST_TPU", "") not in ("", "0")

if not _ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

# The axon sitecustomize force-registers the tunneled TPU backend and
# overrides JAX_PLATFORMS at interpreter start; undo it after import so tests
# run on the virtual 8-device CPU mesh (eager test workloads over the TPU
# tunnel are pathologically slow and single-tenant).  DGS_TEST_TPU=1 keeps
# the real chip visible instead, for the @pytest.mark.tpu smoke suite
# (tests/test_tpu_smoke.py): compiled-Mosaic twins of the interpret-mode
# kernel-vs-oracle tests.
import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_gaussians(rng, P, D, C, *, sigma_range=(0.02, 0.2), dtype=np.float32):
    """Random well-conditioned anisotropic Gaussians on [-1, 1]^D.

    Returns (means, values, covariances, conics) with the packed-triangular
    layout of the reference (sample_points.cu:167).
    """
    from dgs_tpu.config import tri_size

    means = rng.uniform(-1.0, 1.0, (P, D)).astype(dtype)
    values = rng.normal(0.0, 1.0, (P, C)).astype(dtype)
    # Random SPD covariance via A A^T scaled into sigma_range.
    covs = np.zeros((P, tri_size(D)), dtype)
    conics = np.zeros((P, tri_size(D)), dtype)
    for p in range(P):
        A = rng.normal(0.0, 1.0, (D, D))
        S = A @ A.T + np.eye(D) * 0.3
        # scale so sqrt(max eigenvalue) lands in sigma_range
        lam = np.linalg.eigvalsh(S).max()
        target = rng.uniform(*sigma_range) ** 2
        S *= target / lam
        Sinv = np.linalg.inv(S)
        k = 0
        for i in range(D):
            for j in range(i, D):
                covs[p, k] = S[i, j]
                conics[p, k] = Sinv[i, j]
                k += 1
    return means, values, covs, conics


def make_samples(rng, N, D, dtype=np.float32):
    return rng.uniform(-1.0, 1.0, (N, D)).astype(dtype)


@pytest.fixture
def gaussians_factory():
    return make_gaussians


@pytest.fixture
def samples_factory():
    return make_samples
