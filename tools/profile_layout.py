"""Validate the tile-layout hypothesis: same BA linearization math with
the edge axis LAST (small Jacobian dims leading) vs the current
edge-axis-major layout with trailing (3,6) dims."""

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

    print("devices:", jax.devices())
    cam = CameraModel.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                             width=640, height=480)
    C, N, P = 32, 1024, 2048
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)
    R = jnp.tile(jnp.eye(3), (C, 1, 1))
    t = jax.random.normal(ks[0], (C, 3)) * 0.1
    X = jax.random.normal(ks[1], (P, 3)) + jnp.asarray([0, 0, 5.0])
    pt_loc = jax.random.randint(ks[2], (C, N), 0, P).astype(jnp.int32)
    uv = jax.random.uniform(ks[3], (C, N, 2)) * 400 + 100
    inv_sigma2 = jnp.ones((C, N))

    # ---------------- edge-last layout ----------------
    # xc: [C,3,N]; Jc: [C,3,6,N] -> but keep as components; uv as [C,2,N]
    uvT = uv.transpose(0, 2, 1)  # [C,2,N]

    @jax.jit
    def lin_edge_last():
        Xg = X[pt_loc]                          # [C,N,3] gather
        XgT = Xg.transpose(0, 2, 1)             # [C,3,N]
        xc = jnp.einsum("cij,cjn->cin", R, XgT) + t[:, :, None]
        x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]  # [C,N] each
        z_safe = jnp.maximum(z, 1e-3)
        iz = 1.0 / z_safe
        iz2 = iz * iz
        u = cam.fx * x * iz + cam.cx
        v = cam.fy * y * iz + cam.cy
        ru = u - uvT[:, 0]
        rv = v - uvT[:, 1]
        chi2 = (ru * ru + rv * rv) * inv_sigma2
        w = inv_sigma2 * jnp.where(chi2 > 5.991,
                                   jnp.sqrt(5.991 / jnp.maximum(chi2, 1e-12)),
                                   1.0)
        # du/dxc rows: [C,3,N] each (2 pixel rows x 3 cam coords)
        zeros = jnp.zeros_like(x)
        du = jnp.stack([cam.fx * iz, zeros, -cam.fx * x * iz2], 1)  # [C,3,N]
        dv = jnp.stack([zeros, cam.fy * iz, -cam.fy * y * iz2], 1)
        # J_xc_cam: [I | -hat(xc)]: 6 columns; Jc row r = dpix_r . J_xc_cam
        # Build Jc as [C, 2, 6, N]
        def jrow(d):
            # d: [C,3,N] = d(pix)/dxc
            # translation part = d; rotation part = d . (-hat(xc))
            dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
            # -hat(xc) columns: c0=(0,z,-y) c1=(-z,0,x) c2=(y,-x,0)
            r3 = dy * z - dz * y
            r4 = dz * x - dx * z
            r5 = dx * y - dy * x
            return jnp.stack([dx, dy, dz, r3, r4, r5], 1)  # [C,6,N]
        Ju = jrow(du)
        Jv = jrow(dv)                                       # [C,6,N]
        # Hcc[c,i,j] = sum_n w (Ju_i Ju_j + Jv_i Jv_j)
        Juw = Ju * w[:, None, :]
        Jvw = Jv * w[:, None, :]
        Hcc = jnp.einsum("cin,cjn->cij", Juw, Ju) + \
              jnp.einsum("cin,cjn->cij", Jvw, Jv)
        gc = jnp.einsum("cin,cn->ci", Juw, ru) + \
             jnp.einsum("cin,cn->ci", Jvw, rv)
        # point jacobian Jp = dpix . R: [C,3,N] rows
        JpU = jnp.einsum("cin,cij->cjn", du, R)   # [C,3,N] (du . R)
        JpV = jnp.einsum("cin,cij->cjn", dv, R)
        # point-side scatter-add: Hpp [P,3,3], gp [P,3]
        HppU = jnp.einsum("cin,cjn->cnij", JpU * w[:, None, :], JpU)
        HppV = jnp.einsum("cin,cjn->cnij", JpV * w[:, None, :], JpV)
        Hpp = jnp.zeros((P, 3, 3)).at[pt_loc.reshape(-1)].add(
            (HppU + HppV).reshape(-1, 3, 3))
        gp_e = JpU * (w * ru)[:, None, :] + JpV * (w * rv)[:, None, :]
        gp = jnp.zeros((P, 3)).at[pt_loc.reshape(-1)].add(
            gp_e.transpose(0, 2, 1).reshape(-1, 3))
        # B[p,c,6,3]: per-edge Hcp = Juw_i JpU_j + Jvw_i JpV_j -> [C,N,6,3]
        Hcp = jnp.einsum("cin,cjn->cnij", Juw, JpU) + \
              jnp.einsum("cin,cjn->cnij", Jvw, JpV)
        cam_ids = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N))
        B = jnp.zeros((P, C, 6, 3)).at[pt_loc.reshape(-1),
                                        cam_ids.reshape(-1)].add(
            Hcp.reshape(-1, 6, 3))
        return Hcc, gc, Hpp, gp, B

    out = lin_edge_last()
    jax.block_until_ready(out[0])
    print(f"linearize edge-last      : {timeit(lin_edge_last)*1e3:8.3f} ms")

    # pieces
    @jax.jit
    def residual_only():
        Xg = X[pt_loc]
        XgT = Xg.transpose(0, 2, 1)
        xc = jnp.einsum("cij,cjn->cin", R, XgT) + t[:, :, None]
        x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]
        iz = 1.0 / jnp.maximum(z, 1e-3)
        u = cam.fx * x * iz + cam.cx
        v = cam.fy * y * iz + cam.cy
        return u - uvT[:, 0], v - uvT[:, 1]
    print(f"  residual only          : {timeit(residual_only)*1e3:8.3f} ms")

    # gather X by pt_loc: [C,N] from [P,3]
    gx = jax.jit(lambda: X[pt_loc])
    print(f"  X gather [C,N,3]       : {timeit(gx)*1e3:8.3f} ms")
    XT = X.T  # [3,P]
    gx2 = jax.jit(lambda: XT[:, pt_loc])
    print(f"  X gather [3,C,N]       : {timeit(gx2)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
