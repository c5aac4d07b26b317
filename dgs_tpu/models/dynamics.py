"""Gaussian-cloud dynamics via neighbor aggregation (the PIGS dynamics net).

The reference's aggregation subsystem (aggregate_neighbors.cu, SURVEY.md C12-
C15) exists to serve as "the neural network over the Gaussian cloud that
predicts dynamics" in downstream PIGS.  This module reproduces that usage
TPU-natively: a field u(x, t) is carried by a fixed Gaussian cloud whose
per-Gaussian feature values evolve through the attention-style neighbor
aggregation layer, trained so rollouts match an analytic advection-diffusion
solution on the periodic torus:

    u_t + c . grad(u) = kappa * laplace(u)
    u*(x, t) = exp(-D kappa pi^2 t) * prod_d sin(pi (x_d - c_d t))

Per rollout step:  values <- values + aggregate(values, ...)  (residual
update through the same 6 learnable parameter groups as the reference:
transform, queries, keys, frequencies, distance_transform - gradients via
JAX autodiff match the reference's hand-written backward).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import SamplerConfig
from ..ops import aggregation, sampling
from ..oracle.dense import radii as compute_radii
from .field import GaussianField, init_field


class DynamicsParams(NamedTuple):
    """The six learnable parameter groups of the aggregation layer
    (reference __init__.py:303-317)."""

    transform: jnp.ndarray           # (L, L)
    queries: jnp.ndarray             # (P, K)
    keys: jnp.ndarray                # (P, K)
    frequencies: jnp.ndarray         # (nfreq,)
    distance_transform: jnp.ndarray  # (2E,)


def init_dynamics_params(key, P: int, L: int, D: int, *, n_heads: int = 4,
                         n_freq: int = 2) -> DynamicsParams:
    E = 2 * D * n_freq + 1
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    scale = 0.1
    return DynamicsParams(
        transform=jax.random.normal(k1, (L, L)) * scale / L**0.5,
        queries=jax.random.normal(k2, (P, n_heads)) * scale,
        keys=jax.random.normal(k3, (P, n_heads)) * scale,
        frequencies=jnp.arange(1, n_freq + 1, dtype=jnp.float32),
        distance_transform=jax.random.normal(k5, (2 * E,)) * scale,
    )


def advection_diffusion_solution(D: int, kappa: float = 0.05,
                                 velocity: float = 0.3):
    """u*(x, t) on the period-2 torus."""
    c = jnp.full((D,), velocity, jnp.float32)

    def u_star(x, t):  # (N, D), scalar t -> (N, 1)
        decay = jnp.exp(-D * kappa * jnp.pi**2 * t)
        return (decay * jnp.prod(jnp.sin(jnp.pi * (x - c * t)), axis=-1))[
            :, None
        ]

    return u_star


def rollout_step(params: DynamicsParams, values, nbr):
    """values <- values + aggregate(values)  (residual dynamics update).
    Dispatches on the neighbor structure: the XLA table path
    (aggregation.Neighbors) or the Pallas chunked-pair-sweep path
    (aggregation.AggBinning)."""
    if isinstance(nbr, aggregation.AggBinning):
        agg = aggregation.aggregate_pallas(
            values, params.transform, params.queries, params.keys,
            params.frequencies, params.distance_transform, nbr,
        )
    else:
        agg = aggregation.aggregate(
            values, params.transform, params.queries, params.keys,
            params.frequencies, params.distance_transform, nbr,
        )
    return values + agg


def make_value_eval(cfg: SamplerConfig, field: GaussianField,
                    eval_method: str = "dense", n_eval: int = 4096):
    """(values, x) -> u(x) evaluator for a fixed cloud geometry, for
    batches of ``n_eval`` points.

    "dense" materializes (N, P) pair arrays - fine for small P;
    "tiled" routes through the binned Pallas sampler with capacities
    planned from the geometry and an ``n_eval``-sized probe (the only
    viable path at 100k+ Gaussians, where dense pair arrays are tens of
    GB).  Sample points may differ per call (sample_binned re-bins
    in-trace); a fresh random batch is probed eagerly once and must show
    zero overflow."""
    conics = field.conics()
    if eval_method == "dense":
        def eval_u(values, x):
            return sampling.sample_dense(
                "value", field.means, values, conics, x, period=cfg.period
            )
        return eval_u

    import dataclasses

    from ..utils import native

    covs = field.covariances()
    probe = jax.random.uniform(
        jax.random.PRNGKey(17), (n_eval, field.D), minval=-1.0, maxval=1.0)
    plan = native.plan_capacities(cfg, field.means, covs, probe)
    cfg_s = native.config_from_plan(cfg, plan, field.means.shape[0])
    # Resampled eval points shift per-tile occupancy; pad the sweep caps.
    cfg_s = dataclasses.replace(
        cfg_s,
        work_items_fwd=None, work_items_bwd=None,
        work_blocks_fwd=max(int(plan["work_blocks_fwd"]) * 4, 16),
        work_blocks_bwd=max(int(plan["work_blocks_bwd"]) * 4, 32),
    )

    def eval_u(values, x):
        outs, _ = sampling.sample_binned(
            cfg_s, field.means, values, conics, covs, x, ("value",))
        return outs["value"]

    # One eager probe on a fresh batch: the capacities must hold for
    # resampled points, not just the planning probe.
    check = jax.random.uniform(
        jax.random.PRNGKey(18), (n_eval, field.D), minval=-1.0, maxval=1.0)
    _, diag = sampling.sample_binned(
        cfg_s, field.means, field.values, conics, covs, check, ("value",))
    bad = {k: int(v) for k, v in diag.items()
           if k != "perm" and int(v) != 0}
    if bad:
        raise ValueError(f"tiled value eval overflows on a fresh batch: "
                         f"{bad}; enlarge the sweep caps")
    return eval_u


def fit_values(cfg: SamplerConfig, field: GaussianField, target: Callable,
               *, steps: int = 200, lr: float = 5e-2, n_fit: int = 4096,
               key=None, eval_method: str = "dense") -> GaussianField:
    """Least-squares fit of the per-Gaussian values to a target field at
    t=0 (means/covariances stay fixed)."""
    key = key if key is not None else jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (n_fit, field.D), minval=-1.0, maxval=1.0)
    y = target(x)
    eval_u = make_value_eval(cfg, field, eval_method, n_eval=n_fit)
    opt = optax.adam(lr)

    def loss_fn(values):
        u = eval_u(values, x)
        return jnp.mean((u - y) ** 2)

    @jax.jit
    def step(values, opt_state):
        l, g = jax.value_and_grad(loss_fn)(values)
        updates, opt_state = opt.update(g, opt_state, values)
        return optax.apply_updates(values, updates), opt_state, l

    values, opt_state = field.values, opt.init(field.values)
    for _ in range(steps):
        values, opt_state, l = step(values, opt_state)
    return field._replace(values=values)


def train(cfg: SamplerConfig, *, P: int = 512, D: int = 2, steps: int = 150,
          rollout: int = 3, dt: float = 0.05, sigma: float = 0.12,
          learning_rate: float = 3e-3, n_eval: int = 2048, seed: int = 0,
          neighbor_capacity: int = 64, kappa: float = 0.05,
          log_every: int = 50, logger=None, method: str = "grid",
          eval_method: str = "dense"):
    """Train the dynamics net to roll the field forward in time.

    Returns (params, history).  loss = mean over rollout steps r of
    mean((u_model(x, r*dt) - u*(x, r*dt))^2) at fresh sample points.

    ``method``: "grid" (XLA neighbor-table path) or "pallas" (the chunked
    pair-sweep kernels - the production path at large P, where the table
    path's (P, NC, .) HBM traffic dominates).  ``eval_method``: "dense" or
    "tiled" (required at large P - see make_value_eval).
    """
    u_star = advection_diffusion_solution(D, kappa=kappa)
    key = jax.random.PRNGKey(seed)
    key, k_field, k_params = jax.random.split(key, 3)

    field = init_field(k_field, P, D, 1, sigma=sigma)
    field = fit_values(cfg, field, lambda x: u_star(x, 0.0),
                       eval_method=eval_method)
    rad = compute_radii(field.covariances(), D, cfg.radius_sigma,
                        cfg.eig_floor)
    conics = field.conics()
    if method == "pallas":
        import functools

        cfg_a, aplan = aggregation.plan_pallas(
            cfg.with_dims(D), field.means, rad)
        nbr = jax.jit(functools.partial(
            aggregation.preprocess_pallas, cfg_a, plan=aplan
        ))(field.means, conics, rad)
    else:
        nbr = aggregation.preprocess_grid(
            cfg.with_dims(D), field.means, conics, rad, neighbor_capacity
        )
    params = init_dynamics_params(k_params, P, 1, D)
    opt = optax.adam(learning_rate)
    eval_u = make_value_eval(cfg, field, eval_method, n_eval=n_eval)

    def loss_fn(params, key):
        # Python-unrolled rollout (a handful of steps): a lax.scan body
        # here would put the binned sampler's custom-vjp closures behind a
        # scan trace boundary, which leaks their work-list tracers into the
        # outer grad trace.
        values, errs = field.values, []
        for r in range(rollout):
            values = rollout_step(params, values, nbr)
            x = jax.random.uniform(
                jax.random.fold_in(key, r), (n_eval, D),
                minval=-1.0, maxval=1.0,
            )
            u = eval_u(values, x)
            errs.append(jnp.mean((u - u_star(x, (r + 1.0) * dt)) ** 2))
        return jnp.mean(jnp.stack(errs))

    @jax.jit
    def step(params, opt_state, key):
        l, g = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    import time

    opt_state = opt.init(params)
    history = []
    for i in range(steps):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, l = step(params, opt_state, sub)
        if i % log_every == 0 or i == steps - 1:
            # Sync only on logged steps: a per-step float(l) would add the
            # ~26 ms fixed device->host tunnel latency to EVERY step.
            rec = {"step": i, "loss": float(l),
                   # First-step records include compilation; take min over
                   # records for the warm step time.
                   "t_step_s": time.perf_counter() - t0,
                   "nbr_overflow": int(nbr.overflow)}
            history.append(rec)
            if logger is not None:
                logger.log(rec)
    return params, history
