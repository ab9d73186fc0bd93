"""Piecewise timing of the NEW plane-layout grid BA on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(fn, n=30, warmup=5):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from orb_slam2_annotate_tpu.geometry import CameraModel
    from orb_slam2_annotate_tpu.solvers import ba_core

    print("devices:", jax.devices())
    cam = CameraModel.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                             width=640, height=480)
    C, N, P = 32, 1024, 2048
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    g = ba_core.GridBA(
        R=jnp.tile(jnp.eye(3), (C, 1, 1)),
        t=jax.random.normal(ks[0], (C, 3)) * 0.1,
        points=jax.random.normal(ks[1], (P, 3)) + jnp.asarray([0, 0, 5.0]),
        cam_fixed=jnp.zeros((C,), bool).at[16:].set(True),
        cam_valid=jnp.ones((C,), bool), pt_valid=jnp.ones((P,), bool),
        pt_loc=jax.random.randint(ks[2], (C, N), 0, P).astype(jnp.int32),
        uv=jax.random.uniform(ks[3], (C, N, 2)) * 400 + 100,
        ur=jnp.full((C, N), -1.0), inv_sigma2=jnp.ones((C, N)),
        edge_valid=jnp.ones((C, N), bool))
    g = jax.tree.map(jnp.asarray, g)
    jax.block_until_ready(g.R)

    rj = jax.jit(lambda gg: ba_core._grid_planes_residual_jac(
        cam, gg.R, gg.t, gg.points, gg)[1])
    print(f"planes_residual_jac      : {timeit(lambda: rj(g))*1e3:8.3f} ms")

    cost_j = jax.jit(lambda gg: ba_core._grid_cost(
        cam, gg.R, gg.t, gg.points, gg))
    print(f"_grid_cost               : {timeit(lambda: cost_j(g))*1e3:8.3f} ms")

    base_valid = g.edge_valid & (g.pt_loc >= 0)

    @jax.jit
    def stage_camside(gg):
        r, Jc, Jp, is_stereo, depth_ok = ba_core._grid_planes_residual_jac(
            cam, gg.R, gg.t, gg.points, gg)
        chi2 = jnp.sum(r * r, axis=0) * gg.inv_sigma2
        delta2 = jnp.where(is_stereo, 7.815, 5.991)
        w_huber = jnp.where(chi2 > delta2,
                            jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)), 1.0)
        w = gg.inv_sigma2 * w_huber * (base_valid & depth_ok)
        Jcw = Jc * w[None, None]
        Hcc = jnp.einsum("ricn,rjcn->cij", Jcw, Jc)
        gc = jnp.einsum("ricn,rcn->ci", Jcw, r)
        return Hcc, gc

    print(f"  resjac+camside         : {timeit(lambda: stage_camside(g))*1e3:8.3f} ms")

    @jax.jit
    def stage_all(gg):
        """Full linearize as in bundle_adjust_grid."""
        cam_ids = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N))
        n_ids = jnp.broadcast_to(jnp.arange(N)[None, :], (C, N))
        inv = jnp.full((P, C), N, jnp.int32).at[
            jnp.clip(gg.pt_loc, 0).reshape(-1), cam_ids.reshape(-1)
        ].min(jnp.where(base_valid, n_ids, N).reshape(-1))
        selT = (inv + jnp.arange(C)[None, :] * (N + 1)).T

        def take(a):
            pad_width = [(0, 0)] * (a.ndim - 1) + [(0, 1)]
            ap = jnp.pad(a, pad_width)
            flat = ap.reshape(a.shape[:-2] + (-1,))
            return flat[..., selT]

        r, Jc, Jp, is_stereo, depth_ok = ba_core._grid_planes_residual_jac(
            cam, gg.R, gg.t, gg.points, gg)
        chi2 = jnp.sum(r * r, axis=0) * gg.inv_sigma2
        delta2 = jnp.where(is_stereo, 7.815, 5.991)
        w_huber = jnp.where(chi2 > delta2,
                            jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)), 1.0)
        w = gg.inv_sigma2 * w_huber * (base_valid & depth_ok)
        Jc = jnp.where(gg.cam_fixed[None, None, :, None], 0.0, Jc)
        Jcw = Jc * w[None, None]
        Jpw = Jp * w[None, None]
        Hcc = jnp.einsum("ricn,rjcn->cij", Jcw, Jc)
        gc = jnp.einsum("ricn,rcn->ci", Jcw, r)
        Jp_pc = take(Jpw)
        Jp0_pc = take(Jp)
        Jcw_pc = take(Jcw)
        r_pc = take(r)
        Hpp = jnp.einsum("rjcp,rkcp->jkp", Jp_pc, Jp0_pc)
        gp = jnp.einsum("rjcp,rcp->jp", Jp_pc, r_pc)
        B = jnp.einsum("ricp,rkcp->ikcp", Jcw_pc, Jp0_pc)
        return Hcc, Hpp, B, gc, gp

    out = stage_all(g)
    jax.block_until_ready(out[0])
    print(f"  full linearize planes  : {timeit(lambda: stage_all(g))*1e3:8.3f} ms")
    Hcc, Hpp, B, gc, gp = out
    cam_free = jnp.ones((C,), bool).at[16:].set(False)

    sp = jax.jit(lambda Hcc, Hpp, B, gc, gp, cf: ba_core.schur_solve_planes(
        Hcc, Hpp, B, gc, gp, 1e-4, cf)[0])
    print(f"  schur_solve_planes x1  : "
          f"{timeit(lambda: sp(Hcc, Hpp, B, gc, gp, cam_free))*1e3:8.3f} ms")

    sp3 = jax.jit(lambda Hcc, Hpp, B, gc, gp, cf: jax.vmap(
        lambda l: ba_core.schur_solve_planes(Hcc, Hpp, B, gc, gp, l, cf)[0]
    )(jnp.asarray([1e-4, 8e-4, 64e-4])))
    print(f"  schur_solve_planes x3  : "
          f"{timeit(lambda: sp3(Hcc, Hpp, B, gc, gp, cam_free))*1e3:8.3f} ms")

    for it in (1, 13):
        f = jax.jit(lambda gg, i=it: ba_core.bundle_adjust_grid(
            cam, gg, iters=i, robust=True)[4])
        print(f"bundle_adjust_grid it={it:2d}: "
              f"{timeit(lambda: f(g), n=10)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
