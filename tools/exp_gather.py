"""Experiment: which gather/scatter/solve formulations are fast on this TPU.

Informs the rewrite of ic_angles/brief/observation_matrix/pose_opt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def bench(name, fn, n=20):
    try:
        t = timeit(fn, n=n)
        print(f"{name:<44s}: {t*1e3:8.3f} ms")
    except Exception as e:
        print(f"{name:<44s}: FAILED {repr(e)[:120]}")


def main():
    print("devices:", jax.devices())
    H, W = 480, 640
    N = 1024
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W).astype(np.float32))
    yi = jnp.asarray(rng.randint(16, H - 16, (N,)), jnp.int32)
    xi = jnp.asarray(rng.randint(16, W - 16, (N,)), jnp.int32)
    # 512 scatter-free offsets per keypoint
    offs = jnp.asarray(rng.randint(-13, 14, (N, 512, 2)), jnp.int32)

    # ---- A: flat scalar gather [N,512]
    @jax.jit
    def flat_gather(img, yi, xi, offs):
        yy = jnp.clip(yi[:, None] + offs[..., 0], 0, H - 1)
        xx = jnp.clip(xi[:, None] + offs[..., 1], 0, W - 1)
        return jnp.take(img.reshape(-1), yy * W + xx)

    bench("A flat scalar gather N*512", lambda: jax.block_until_ready(
        flat_gather(img, yi, xi, offs)))

    # ---- B: row gather then within-row gather
    @jax.jit
    def row_then_col(img, yi, xi, offs):
        # patch rows: for each keypoint take 31 full rows [N, 31, W]
        rows = img[jnp.clip(yi[:, None] + jnp.arange(-15, 16), 0, H - 1)]  # [N,31,W]
        yy = offs[..., 0] + 15                       # [N,512] row within patch
        xx = jnp.clip(xi[:, None] + offs[..., 1], 0, W - 1)
        return jnp.take_along_axis(
            rows.reshape(N, 31 * W), yy * W + xx, axis=1)

    bench("B row gather + take_along_axis", lambda: jax.block_until_ready(
        row_then_col(img, yi, xi, offs)))

    # ---- C: one-hot matmul patch extraction [N,31,31] then in-patch gather
    @jax.jit
    def onehot_patch(img, yi, xi):
        ry = yi[:, None] + jnp.arange(-15, 16)
        rx = xi[:, None] + jnp.arange(-15, 16)
        oh_y = (ry[:, :, None] == jnp.arange(H)[None, None, :]).astype(jnp.float32)
        oh_x = (rx[:, :, None] == jnp.arange(W)[None, None, :]).astype(jnp.float32)
        tmp = jnp.einsum("npy,yx->npx", oh_y, img)       # [N,31,W]
        return jnp.einsum("npx,nqx->npq", tmp, oh_x)     # [N,31,31]

    bench("C one-hot matmul 31x31 patches", lambda: jax.block_until_ready(
        onehot_patch(img, yi, xi)))

    @jax.jit
    def onehot_patch_bf16(img, yi, xi):
        ry = yi[:, None] + jnp.arange(-15, 16)
        rx = xi[:, None] + jnp.arange(-15, 16)
        oh_y = (ry[:, :, None] == jnp.arange(H)[None, None, :]).astype(jnp.bfloat16)
        oh_x = (rx[:, :, None] == jnp.arange(W)[None, None, :]).astype(jnp.bfloat16)
        tmp = jnp.einsum("npy,yx->npx", oh_y, img.astype(jnp.bfloat16),
                         preferred_element_type=jnp.bfloat16)
        return jnp.einsum("npx,nqx->npq", tmp, oh_x,
                          preferred_element_type=jnp.float32)

    bench("C' same in bf16", lambda: jax.block_until_ready(
        onehot_patch_bf16(img, yi, xi)))

    # ---- D: dynamic_slice vmap (current ic_angles approach)
    @jax.jit
    def dynslice(img, yi, xi):
        def one(yc, xc):
            return jax.lax.dynamic_slice(img, (yc - 15, xc - 15), (31, 31))
        return jax.vmap(one)(yi, xi)

    bench("D vmap dynamic_slice 31x31", lambda: jax.block_until_ready(
        dynslice(img, yi, xi)))

    # ---- E: row gather only [N, 31, W]
    @jax.jit
    def rowgather(img, yi):
        return img[jnp.clip(yi[:, None] + jnp.arange(-15, 16), 0, H - 1)]

    bench("E row gather [N,31,W]", lambda: jax.block_until_ready(
        rowgather(img, yi)))

    # ---- F: in-patch scalar gather from [N,31,31] patches
    patches = onehot_patch(img, yi, xi)
    idx512 = jnp.asarray(rng.randint(0, 961, (N, 512)), jnp.int32)

    @jax.jit
    def inpatch(patches, idx):
        return jnp.take_along_axis(patches.reshape(N, 961), idx, axis=1)

    bench("F take_along_axis [N,961]->512", lambda: jax.block_until_ready(
        inpatch(patches, idx512)))

    # ---- G: one-hot matmul sampling from patches (bin-shared pattern)
    # offsets quantized to 32 bins: sample matrix per bin [512, 961]
    S = jnp.asarray(rng.rand(32, 512, 961) < 0.001, jnp.bfloat16)
    bins = jnp.asarray(rng.randint(0, 32, (N,)), jnp.int32)

    @jax.jit
    def binned_sample(patches, bins):
        Sn = S[bins]  # [N,512,961] gather of rows — big
        return jnp.einsum("nsp,np->ns", Sn,
                          patches.reshape(N, 961).astype(jnp.bfloat16))

    bench("G per-bin sample matrix einsum", lambda: jax.block_until_ready(
        binned_sample(patches, bins)), n=5)

    # ---- H: scatter [K,N] -> [K,P] (observation_matrix shape)
    K, P = 128, 16384
    obs = jnp.asarray(rng.randint(-1, P, (K, N)), jnp.int32)

    @jax.jit
    def scatter_om(obs):
        O = jnp.zeros((K, P), bool)
        return O.at[jnp.arange(K)[:, None], jnp.clip(obs, 0)].max(obs >= 0)

    bench("H scatter [K,N]->[K,P]", lambda: jax.block_until_ready(scatter_om(obs)))

    # ---- I: same via sort-free bincount-style one-hot matmul
    @jax.jit
    def onehot_om(obs):
        # [K, N, P] one-hot would be 2G... instead compare against chunks
        oh = jax.nn.one_hot(jnp.clip(obs, 0), P, dtype=jnp.bfloat16)  # [K,N,P]
        w = (obs >= 0).astype(jnp.bfloat16)
        return (jnp.einsum("knp,kn->kp", oh, w) > 0)

    bench("I one_hot einsum [K,N,P]", lambda: jax.block_until_ready(onehot_om(obs)), n=5)

    # ---- J: 6x6 solve styles inside a scan (pose_opt shape)
    Hm = jnp.asarray(rng.rand(6, 6).astype(np.float32))
    Hm = Hm @ Hm.T + 6 * jnp.eye(6)
    g = jnp.asarray(rng.rand(6).astype(np.float32))

    @jax.jit
    def scan_solve(Hm, g):
        def body(c, _):
            x = jnp.linalg.solve(Hm + c * jnp.eye(6), g)
            return c + x[0] * 1e-9, None
        c, _ = jax.lax.scan(body, 0.0, None, length=40)
        return c

    bench("J 40x jnp.linalg.solve 6x6 scan", lambda: jax.block_until_ready(
        scan_solve(Hm, g)))

    @jax.jit
    def scan_chol(Hm, g):
        def chol_solve(A, b):
            L = jnp.linalg.cholesky(A)
            y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, y)
        def body(c, _):
            x = chol_solve(Hm + c * jnp.eye(6), g)
            return c + x[0] * 1e-9, None
        c, _ = jax.lax.scan(body, 0.0, None, length=40)
        return c

    bench("J' 40x cholesky solve 6x6 scan", lambda: jax.block_until_ready(
        scan_chol(Hm, g)))

    def chol6_unrolled(A, b):
        """Fully unrolled 6x6 Cholesky solve with scalar ops."""
        L = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i + 1):
                s = A[i, j]
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                if i == j:
                    L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
                else:
                    L[i][j] = s / L[j][j]
        y = [None] * 6
        for i in range(6):
            s = b[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * 6
        for i in reversed(range(6)):
            s = y[i]
            for k in range(i + 1, 6):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return jnp.stack(x)

    @jax.jit
    def scan_unrolled(Hm, g):
        def body(c, _):
            x = chol6_unrolled(Hm + c * jnp.eye(6), g)
            return c + x[0] * 1e-9, None
        c, _ = jax.lax.scan(body, 0.0, None, length=40)
        return c

    bench("J'' 40x unrolled chol 6x6 scan", lambda: jax.block_until_ready(
        scan_unrolled(Hm, g)))

    # full LM-iteration-shaped scan: einsum assembly + unrolled solve
    r = jnp.asarray(rng.rand(N, 3).astype(np.float32))
    J = jnp.asarray(rng.rand(N, 3, 6).astype(np.float32))
    w = jnp.asarray(rng.rand(N).astype(np.float32))

    @jax.jit
    def scan_full_iter(J, r, w):
        def body(c, _):
            Jw = J * (w[:, None, None] + c)
            Hm = jnp.einsum("nij,nik->jk", Jw, J)
            gv = jnp.einsum("nij,ni->j", Jw, r)
            x = chol6_unrolled(Hm + jnp.eye(6), gv)
            return c + x[0] * 1e-9, None
        c, _ = jax.lax.scan(body, 0.0, None, length=40)
        return c

    bench("K 40x (einsum N=1024 + chol) scan", lambda: jax.block_until_ready(
        scan_full_iter(J, r, w)))

    # ---- L: median via sort [P, 32] (update_mappoint_stats shape)
    D = jnp.asarray(rng.randint(0, 256, (P, 32, 32)), jnp.int32)

    @jax.jit
    def med(D):
        return jnp.median(D, axis=-1)

    bench("L median [P,32,32]", lambda: jax.block_until_ready(med(D)), n=5)


if __name__ == "__main__":
    main()
