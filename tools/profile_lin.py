"""Break the BA linearization into pieces to find the slow op on TPU.

All device values are passed as jit ARGUMENTS — capturing them as
closure constants triggers the axon constant-rematerialization slow path
(see commit 'Fix axon slow-path') and poisons the measurement.
"""

import os
import sys
import time
from functools import partial

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

    rj = jax.jit(lambda gg: ba_core._grid_residual_jac(
        cam, gg.R, gg.t, gg.points, gg)[1])
    print(f"_grid_residual_jac       : {timeit(lambda: rj(g))*1e3:8.3f} ms")

    cost_j = jax.jit(lambda gg: ba_core._grid_cost(
        cam, gg.R, gg.t, gg.points, gg))
    print(f"_grid_cost               : {timeit(lambda: cost_j(g))*1e3:8.3f} ms")

    @jax.jit
    def lin_full(gg):
        """The exact linearize() body of bundle_adjust_grid."""
        base_valid = gg.edge_valid & (gg.pt_loc >= 0)
        cam_ids = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N))
        n_ids = jnp.broadcast_to(jnp.arange(N)[None, :], (C, N))
        inv = jnp.full((P, C), N, jnp.int32).at[
            jnp.clip(gg.pt_loc, 0).reshape(-1), cam_ids.reshape(-1)
        ].min(jnp.where(base_valid, n_ids, N).reshape(-1))

        def pad_n(a):
            pad_width = [(0, 0), (0, 1)] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, pad_width)

        lin_sel_base = jnp.arange(C)[None, :] * (N + 1)
        r, Jc, Jp, is_stereo, depth_ok = ba_core._grid_residual_jac(
            cam, gg.R, gg.t, gg.points, gg)
        chi2 = jnp.sum(r * r, axis=-1) * gg.inv_sigma2
        delta2 = jnp.where(is_stereo, 7.815, 5.991)
        w_huber = jnp.where(chi2 > delta2,
                            jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)), 1.0)
        live = base_valid & depth_ok
        w = gg.inv_sigma2 * w_huber * live
        Jc = jnp.where(gg.cam_fixed[:, None, None, None], 0.0, Jc)
        Jcw = Jc * w[..., None, None]
        Jpw = Jp * w[..., None, None]
        Hcc = jnp.einsum("cnij,cnik->cjk", Jcw, Jc)
        gc = jnp.einsum("cnij,cni->cj", Jcw, r)
        sel = inv + lin_sel_base

        def take(a):
            return pad_n(a).reshape((C * (N + 1),) + a.shape[2:])[sel]

        Jp_pc = take(Jpw)
        Jp0_pc = take(Jp)
        Jcw_pc = take(Jcw)
        r_pc = take(r)
        Hpp = jnp.einsum("pcij,pcik->pjk", Jp_pc, Jp0_pc)
        gp = jnp.einsum("pcij,pci->pj", Jp_pc, r_pc)
        B = jnp.einsum("pcij,pcik->pcjk", Jcw_pc, Jp0_pc)
        return Hcc, Hpp, B, gc, gp

    print(f"linearize (exact)        : {timeit(lambda: lin_full(g))*1e3:8.3f} ms")

    @jax.jit
    def lin_no_take(gg):
        """Camera side + per-edge blocks, point side via scatter-add."""
        base_valid = gg.edge_valid & (gg.pt_loc >= 0)
        r, Jc, Jp, is_stereo, depth_ok = ba_core._grid_residual_jac(
            cam, gg.R, gg.t, gg.points, gg)
        chi2 = jnp.sum(r * r, axis=-1) * gg.inv_sigma2
        delta2 = jnp.where(is_stereo, 7.815, 5.991)
        w_huber = jnp.where(chi2 > delta2,
                            jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)), 1.0)
        live = base_valid & depth_ok
        w = gg.inv_sigma2 * w_huber * live
        Jc = jnp.where(gg.cam_fixed[:, None, None, None], 0.0, Jc)
        Jcw = Jc * w[..., None, None]
        Jpw = Jp * w[..., None, None]
        Hcc = jnp.einsum("cnij,cnik->cjk", Jcw, Jc)
        gc = jnp.einsum("cnij,cni->cj", Jcw, r)
        Hpp_e = jnp.einsum("cnij,cnik->cnjk", Jpw, Jp)
        gp_e = jnp.einsum("cnij,cni->cnj", Jpw, r)
        Hcp_e = jnp.einsum("cnij,cnik->cnjk", Jcw, Jp)
        pt_flat = jnp.clip(gg.pt_loc, 0).reshape(-1)
        cam_ids = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N)).reshape(-1)
        Hpp = jnp.zeros((P, 3, 3)).at[pt_flat].add(Hpp_e.reshape(-1, 3, 3))
        gp = jnp.zeros((P, 3)).at[pt_flat].add(gp_e.reshape(-1, 3))
        B = jnp.zeros((P, C, 6, 3)).at[pt_flat, cam_ids].add(
            Hcp_e.reshape(-1, 6, 3))
        return Hcc, Hpp, B, gc, gp

    print(f"linearize scatter-add    : {timeit(lambda: lin_no_take(g))*1e3:8.3f} ms")

    Hcc, Hpp, B, gc, gp = lin_full(g)
    jax.block_until_ready(Hcc)
    cam_free = jnp.ones((C,), bool).at[16:].set(False)

    sd = jax.jit(lambda *a: ba_core.schur_solve_dense(*a)[0])
    print(f"schur_solve x1           : "
          f"{timeit(lambda: sd(Hcc, Hpp, B, gc, gp, 1e-4, cam_free))*1e3:8.3f} ms")

    sd3 = jax.jit(lambda Hcc, Hpp, B, gc, gp, cf: jax.vmap(
        lambda l: ba_core.schur_solve_dense(Hcc, Hpp, B, gc, gp, l, cf)[0]
    )(jnp.asarray([1e-4, 8e-4, 64e-4])))
    print(f"schur_solve x3 vmapped   : "
          f"{timeit(lambda: sd3(Hcc, Hpp, B, gc, gp, cam_free))*1e3:8.3f} ms")

    one_it = jax.jit(lambda gg: ba_core.bundle_adjust_grid(
        cam, gg, iters=1, robust=True)[4])
    print(f"bundle_adjust_grid it=1  : {timeit(lambda: one_it(g), n=10)*1e3:8.3f} ms")
    it13 = jax.jit(lambda gg: ba_core.bundle_adjust_grid(
        cam, gg, iters=13, robust=True)[4])
    print(f"bundle_adjust_grid it=13 : {timeit(lambda: it13(g), n=10)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
