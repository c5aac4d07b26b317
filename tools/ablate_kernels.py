"""Ablate the tiled pair kernels on-chip to localize time (MXU vs VPU).

Variants:
  fwd-full      the real forward kernel
  fwd-nomm      weights computed, matmuls replaced by one dummy dot
  fwd-noew      elementwise replaced by trivial weights, matmuls kept
  bwd-full      the real backward kernel
  bwd-nomm      h/dvals matmuls replaced by cheap stand-ins
  bwd-noew      VJP elementwise replaced by trivial, matmuls kept

Usage: python tools/ablate_kernels.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dgs_tpu.config import SamplerConfig, tri_size
from dgs_tpu.binning import grid as binning
from dgs_tpu.kernels import tiled as ktiled
from dgs_tpu.kernels.dense import _pad_axis, _round_up
from dgs_tpu.models.field import init_field
from dgs_tpu.ops import formulas
from dgs_tpu.utils import native

P, N, D, C = 100_000, 1_000_000, 2, 4
ORDERS = ("value", "derivative", "laplacian")


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:12s} {1e3 * sorted(ts)[len(ts) // 2]:9.2f} ms", flush=True)


def fwd_kernel(mode, orders, period, D, C,
               aux_ref, col_ref,
               geom_ref, ent_tile_ref, vals_ref,
               samples_ref, s_tile_ref, out_ref):
    w = pl.program_id(0)
    a_w = aux_ref[w]

    @pl.when((a_w & 2) != 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        tri = tri_size(D)
        Xs = [formulas.wrap(geom_ref[d, :][None, :]
                            - samples_ref[d, :][:, None], period)
              for d in range(D)]
        con = [geom_ref[D + t, :][None, :] for t in range(tri)]
        if mode == "noew":
            K = ktiled.total_unique(orders, D)
            wgts = [Xs[0] for _ in range(K)]
        else:
            G, a = formulas.power_terms(Xs, con)
            G = G * ktiled._tile_mask(s_tile_ref, ent_tile_ref)
            wgts = []
            for order in orders:
                wgts.extend(formulas.components_unique(order, Xs, con, G, a))
        vals = vals_ref[...]
        if mode == "nomm":
            s = sum(wgts)
            acc = jnp.dot(s, vals, preferred_element_type=jnp.float32)
            out_ref[...] += jnp.concatenate(
                [acc] * len(wgts), axis=1)
        else:
            accs = [jnp.dot(wg, vals, preferred_element_type=jnp.float32)
                    for wg in wgts]
            out_ref[...] += jnp.concatenate(accs, axis=1)


def bwd_kernel(mode, orders, period, D, C,
               aux_ref, col_ref,
               geom_ref, ent_tile_ref, samples_ref, s_tile_ref,
               ct_ref, ct_t_ref, dent_ref):
    w = pl.program_id(0)
    tri = tri_size(D)
    a_w = aux_ref[w]

    @pl.when((a_w & 2) != 0)
    def _init():
        dent_ref[...] = jnp.zeros_like(dent_ref)

    @pl.when((a_w & 1) != 0)
    def _compute():
        Xs = [formulas.wrap(geom_ref[d, :][None, :]
                            - samples_ref[d, :][:, None], period)
              for d in range(D)]
        con = [geom_ref[D + t, :][None, :] for t in range(tri)]
        G, a = formulas.power_terms(Xs, con)
        G = G * ktiled._tile_mask(s_tile_ref, ent_tile_ref)
        values_t = geom_ref[D + tri:D + tri + C, :]
        ct = ct_ref[...]
        K = ktiled.total_unique(orders, D)

        if mode == "bmm":
            # Batched contractions: one dot_general for all K h-matrices and
            # one for dvals, instead of 2K separate small dots.
            BN = ct_ref.shape[0]
            BP = geom_ref.shape[1]
            ct3 = ct_t_ref[...].reshape(K, C, BN)
            h_all = jax.lax.dot_general(
                ct3, values_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (K, BN, BP)
            hs = [h_all[k] for k in range(K)]
            w_list = []
            for order in orders:
                polys = formulas.component_polys(order, Xs, con, a)
                for p_ in polys:
                    w_list.append(G if isinstance(p_, float) else G * p_)
            wstack = jnp.stack(w_list, axis=0)            # (K, BN, BP)
            dv_k = jax.lax.dot_general(
                ct3, wstack, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # (K, C, BP)
            dvals = jnp.sum(dv_k, axis=0)
        else:
            hs, dvals = [], None
            k0 = 0
            for order in orders:
                nk = formulas.n_unique(order, D)
                polys = formulas.component_polys(order, Xs, con, a)
                for k in range(nk):
                    if mode == "nomm":
                        hs.append(G)
                        dv = None
                    else:
                        g_nc = ct[:, (k0 + k) * C:(k0 + k + 1) * C]
                        hs.append(jnp.dot(g_nc, values_t,
                                          preferred_element_type=jnp.float32))
                        g_t = ct_t_ref[(k0 + k) * C:(k0 + k + 1) * C, :]
                        w_k = (G if isinstance(polys[k], float)
                               else G * polys[k])
                        dv = jnp.dot(g_t, w_k,
                                     preferred_element_type=jnp.float32)
                    if dv is not None:
                        dvals = dv if dvals is None else dvals + dv
                k0 += nk
            if dvals is None:
                dvals = jnp.zeros((C, geom_ref.shape[1]), jnp.float32)

        if mode == "noew":
            dmu = [hs[0]] * D
            dcon = [hs[0]] * tri
        else:
            lap_polys = (formulas.component_polys("laplacian", Xs, con, a)
                         if "laplacian" in orders else None)
            dmu, dcon = formulas.vjp_params_fused(
                ORDERS, Xs, con, G, a, hs, lap_polys)
        rows = ([jnp.sum(m, axis=0, keepdims=True) for m in dmu]
                + [jnp.sum(ctn, axis=0, keepdims=True) for ctn in dcon]
                + [dvals])
        dent_ref[...] += jnp.concatenate(rows, axis=0)


def main():
    sigma = 2.0 / P**0.5
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        field = init_field(jax.random.PRNGKey(0), P, D, C, sigma=sigma)
        samples = jax.random.uniform(jax.random.PRNGKey(1), (N, D),
                                     minval=-1.0, maxval=1.0)
    cfg = SamplerConfig(tile_size=0.0637, max_tiles_per_gaussian=3,
                        eig_floor=1e-12)
    plan = native.plan_capacities(cfg, field.means, field.covariances(),
                                  samples)
    cfg = native.config_from_plan(cfg, plan, P)
    dev = jax.devices()[0]
    field = jax.device_put(field, dev)
    samples = jax.device_put(samples, dev)

    bn, be = cfg.block_n, cfg.block_p
    bbn, bbe = cfg.bwd_blocks
    align_e, align_n = max(be, bbe), max(bn, bbn)

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def prep(_cfg, nothing, m, cov, con, v, s):
        state = binning.build(_cfg, m, cov, s)
        smp = ktiled.prepare_samples(state, s, align_n)[:3]
        ent = ktiled.prepare_entries(state, m, v, con, align_e)
        Np, Ep = smp[2], ent[3]
        fb, fn = binning.forward_geometry(state, bn, be)
        bb, bnn = binning.backward_geometry(state, bbe, bbn)
        NB_f, EB_f = Np // bn, Ep // be
        EB_b, NB_b = Ep // bbe, Np // bbn
        fb = jnp.clip(_pad_axis(fb, 0, NB_f), 0, EB_f - 1)
        fn = _pad_axis(fn, 0, NB_f)
        bb = jnp.clip(_pad_axis(bb, 0, EB_b), 0, NB_b - 1)
        bnn = _pad_axis(bnn, 0, EB_b)
        wl_f = ktiled.work_list(fb, fn, EB_f, cfg.work_items_fwd + NB_f)
        wl_b = ktiled.work_list(bb, bnn, NB_b, cfg.work_items_bwd + EB_b)
        return smp, ent, wl_f[:2], wl_b[:2]

    con, cov = field.conics(), field.covariances()
    smp, ent, wl_f, wl_b = jax.block_until_ready(
        prep(cfg, None, field.means, cov, con, field.values, samples))
    gid, ent_tile, geom, Ep = ent[:4]
    s_sorted, s_tile, Np = smp
    # prepare_entries carries the f32 tile row at row 0, prepare_samples
    # LAST; this tool's kernels use the separate int tile operands, so
    # strip them.
    geom = geom[1:]
    s_sorted = s_sorted[:-1]
    # The value rows ride inside geom (prepare_entries packs means, conics,
    # values); this tool's row-major forward wants them as a (Ep, C) operand.
    vals = geom[D + tri_size(D):D + tri_size(D) + C].T
    K = ktiled.total_unique(ORDERS, D)
    NPARAM = ktiled.n_params(D, C)
    ct = jnp.ones((Np, K * C), jnp.float32)
    ct_t = ct.T

    def run_fwd(mode):
        cap = wl_f[0].shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(cap,),
            in_specs=[
                pl.BlockSpec((NPARAM, be), lambda w, a, c: (0, c[w])),
                pl.BlockSpec((1, be), lambda w, a, c: (0, c[w])),
                pl.BlockSpec((be, C), lambda w, a, c: (c[w], 0)),
                pl.BlockSpec((D, bn), lambda w, a, c: (0, a[w] >> 2)),
                pl.BlockSpec((1, bn), lambda w, a, c: (0, a[w] >> 2)),
            ],
            out_specs=pl.BlockSpec((bn, K * C),
                                   lambda w, a, c: (a[w] >> 2, 0)),
        )
        f = pl.pallas_call(
            functools.partial(fwd_kernel, mode, ORDERS, cfg.period, D, C),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Np, K * C), jnp.float32),
        )
        return jax.jit(lambda: f(*wl_f, geom, ent_tile, vals, s_sorted,
                                 s_tile))

    def run_bwd(mode):
        cap = wl_b[0].shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(cap,),
            in_specs=[
                pl.BlockSpec((NPARAM, bbe), lambda w, a, c: (0, a[w] >> 2)),
                pl.BlockSpec((1, bbe), lambda w, a, c: (0, a[w] >> 2)),
                pl.BlockSpec((D, bbn), lambda w, a, c: (0, c[w])),
                pl.BlockSpec((1, bbn), lambda w, a, c: (0, c[w])),
                pl.BlockSpec((bbn, K * C), lambda w, a, c: (c[w], 0)),
                pl.BlockSpec((K * C, bbn), lambda w, a, c: (0, c[w])),
            ],
            out_specs=pl.BlockSpec((NPARAM, bbe),
                                   lambda w, a, c: (0, a[w] >> 2)),
        )
        f = pl.pallas_call(
            functools.partial(bwd_kernel, mode, ORDERS, cfg.period, D, C),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NPARAM, Ep), jnp.float32),
        )
        return jax.jit(lambda: f(*wl_b, geom, ent_tile, s_sorted, s_tile,
                                 ct, ct_t))

    for mode in ("full", "nomm", "noew"):
        timeit(f"fwd-{mode}", run_fwd(mode))
    for mode in ("full", "bmm", "nomm", "noew"):
        timeit(f"bwd-{mode}", run_bwd(mode))


if __name__ == "__main__":
    main()
