"""Bisect: why are ic_angles/brief 25ms when their parts are 0.1ms?
Also: scan-step overhead scaling, scatter variants, median variants."""

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
        print(f"{name:<46s}: {t*1e3:8.3f} ms")
        return t
    except Exception as e:
        print(f"{name:<46s}: FAILED {repr(e)[:120]}")


def main():
    from orb_slam2_annotate_tpu.ops import orb

    print("devices:", jax.devices())
    H, W = 480, 640
    N = 235
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W).astype(np.float32) * 255)
    xy = jnp.asarray(
        np.stack([rng.randint(20, W - 20, N), rng.randint(20, H - 20, N)], 1
                 ).astype(np.float32))
    valid = jnp.asarray(np.ones(N, bool))
    ang = jnp.asarray(rng.rand(N).astype(np.float32) * 6.28)

    # ---- ic_angles as-is
    f = jax.jit(orb.ic_angles)
    bench("ic_angles as-is", lambda: jax.block_until_ready(f(img, xy, valid)))

    # variant: no arctan2
    def ic_no_atan(image, kps, valid):
        h, w = image.shape
        x0 = jnp.clip(jnp.round(kps[:, 0]).astype(jnp.int32), 15, w - 16)
        y0 = jnp.clip(jnp.round(kps[:, 1]).astype(jnp.int32), 15, h - 16)
        def pm(xc, yc):
            p = jax.lax.dynamic_slice(image, (yc - 15, xc - 15), (31, 31))
            return jnp.sum(p * orb.GRID_X), jnp.sum(p * orb.GRID_Y), jnp.sum(p)
        a, b, c = jax.vmap(pm)(x0, y0)
        return a + b + c
    bench("ic no-atan sums only", lambda: jax.block_until_ready(
        jax.jit(ic_no_atan)(img, xy, valid)))

    # variant: with atan2
    def ic_atan(image, kps, valid):
        h, w = image.shape
        x0 = jnp.clip(jnp.round(kps[:, 0]).astype(jnp.int32), 15, w - 16)
        y0 = jnp.clip(jnp.round(kps[:, 1]).astype(jnp.int32), 15, h - 16)
        def pm(xc, yc):
            p = jax.lax.dynamic_slice(image, (yc - 15, xc - 15), (31, 31))
            return jnp.sum(p * orb.GRID_X), jnp.sum(p * orb.GRID_Y)
        m10, m01 = jax.vmap(pm)(x0, y0)
        return jnp.arctan2(m01, m10)
    bench("ic + arctan2", lambda: jax.block_until_ready(
        jax.jit(ic_atan)(img, xy, valid)))

    # ---- brief as-is
    fb = jax.jit(orb.brief_descriptors)
    bench("brief as-is", lambda: jax.block_until_ready(fb(img, xy, ang, valid)))

    # variant: skip ROT_OFFSETS gather (bin fixed 0)
    def brief_nobin(blurred, kps, angles, valid):
        h, w = blurred.shape
        off = jnp.broadcast_to(orb.ROT_OFFSETS[0], (N, 512, 2))
        yk = jnp.round(kps[:, 1]).astype(jnp.int32)[:, None]
        xk = jnp.round(kps[:, 0]).astype(jnp.int32)[:, None]
        yy = jnp.clip(yk + off[..., 0], 0, h - 1)
        xx = jnp.clip(xk + off[..., 1], 0, w - 1)
        vals = jnp.take(blurred.reshape(-1), yy * w + xx)
        bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.uint32)
        words = bits.reshape(bits.shape[0], 8, 32)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    bench("brief fixed-bin", lambda: jax.block_until_ready(
        jax.jit(brief_nobin)(img, xy, ang, valid)))

    # variant: with bin gather but no pack
    def brief_nopack(blurred, kps, angles, valid):
        h, w = blurred.shape
        two_pi = 2.0 * jnp.pi
        bin_ = jnp.round((angles % two_pi) / (two_pi / 32)).astype(jnp.int32) % 32
        off = orb.ROT_OFFSETS[bin_]
        yk = jnp.round(kps[:, 1]).astype(jnp.int32)[:, None]
        xk = jnp.round(kps[:, 0]).astype(jnp.int32)[:, None]
        yy = jnp.clip(yk + off[..., 0], 0, h - 1)
        xx = jnp.clip(xk + off[..., 1], 0, w - 1)
        vals = jnp.take(blurred.reshape(-1), yy * w + xx)
        return (vals[:, :256] < vals[:, 256:])
    bench("brief no-pack", lambda: jax.block_until_ready(
        jax.jit(brief_nopack)(img, xy, ang, valid)))

    # variant: pack only
    bits = jnp.asarray(rng.rand(N, 256) < 0.5)
    def pack(bits):
        words = bits.astype(jnp.uint32).reshape(bits.shape[0], 8, 32)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    bench("pack only (u32 shifts)", lambda: jax.block_until_ready(
        jax.jit(pack)(bits)))

    # modulo ops?
    def mod_only(angles):
        two_pi = 2.0 * jnp.pi
        return jnp.round((angles % two_pi) / (two_pi / 32)).astype(jnp.int32) % 32
    bench("mod/round only", lambda: jax.block_until_ready(
        jax.jit(mod_only)(ang)))

    # ---- scan overhead scaling
    x = jnp.zeros((8,))
    for L in (1, 5, 10, 40):
        def mk(L):
            @jax.jit
            def s(x):
                def body(c, _):
                    return c + 1.0, None
                c, _ = jax.lax.scan(body, x, None, length=L)
                return c
            return s
        f_s = mk(L)
        bench(f"scan trivial body len={L}", lambda f_s=f_s: jax.block_until_ready(f_s(x)))

    # unrolled python loop x40 of the LM-iteration-shaped body
    Nn = 1024
    J = jnp.asarray(rng.rand(Nn, 3, 6).astype(np.float32))
    r = jnp.asarray(rng.rand(Nn, 3).astype(np.float32))
    w = jnp.asarray(rng.rand(Nn).astype(np.float32))

    @jax.jit
    def unrolled40(J, r, w):
        c = 0.0
        for _ in range(40):
            Jw = J * (w[:, None, None] + c)
            Hm = jnp.einsum("nij,nik->jk", Jw, J)
            gv = jnp.einsum("nij,ni->j", Jw, r)
            x = jnp.linalg.solve(Hm + jnp.eye(6), gv)
            c = c + x[0] * 1e-9
        return c
    bench("40x LM body UNROLLED + linalg.solve", lambda: jax.block_until_ready(
        unrolled40(J, r, w)), n=10)

    # scan with unroll= param
    @jax.jit
    def scan_unroll8(J, r, w):
        def body(c, _):
            Jw = J * (w[:, None, None] + c)
            Hm = jnp.einsum("nij,nik->jk", Jw, J)
            gv = jnp.einsum("nij,ni->j", Jw, r)
            x = jnp.linalg.solve(Hm + jnp.eye(6), gv)
            return c + x[0] * 1e-9, None
        c, _ = jax.lax.scan(body, 0.0, None, length=40, unroll=40)
        return c
    bench("scan len=40 unroll=40", lambda: jax.block_until_ready(
        scan_unroll8(J, r, w)), n=10)

    # ---- scatter variants
    K, P = 128, 16384
    Nf = 1024
    obs = jnp.asarray(rng.randint(-1, P, (K, Nf)), jnp.int32)

    @jax.jit
    def scat_flat_max(obs):
        flat = (jnp.arange(K)[:, None] * P + jnp.clip(obs, 0)).reshape(-1)
        O = jnp.zeros((K * P,), bool)
        return O.at[flat].max((obs >= 0).reshape(-1)).reshape(K, P)
    bench("scatter flat 1D max", lambda: jax.block_until_ready(scat_flat_max(obs)))

    @jax.jit
    def scat_flat_add(obs):
        flat = (jnp.arange(K)[:, None] * P + jnp.clip(obs, 0)).reshape(-1)
        O = jnp.zeros((K * P,), jnp.float32)
        return O.at[flat].add((obs >= 0).astype(jnp.float32).reshape(-1)).reshape(K, P)
    bench("scatter flat 1D add f32", lambda: jax.block_until_ready(scat_flat_add(obs)))

    @jax.jit
    def scat_sorted(obs):
        flat = (jnp.arange(K)[:, None] * P + jnp.clip(obs, 0)).reshape(-1)
        v = (obs >= 0).reshape(-1)
        order = jnp.argsort(flat)
        O = jnp.zeros((K * P,), bool)
        return O.at[flat[order]].max(v[order]).reshape(K, P)
    bench("scatter sorted idx max", lambda: jax.block_until_ready(scat_sorted(obs)))

    @jax.jit
    def seg_sum(obs):
        flat = (jnp.arange(K)[:, None] * P + jnp.clip(obs, 0)).reshape(-1)
        v = (obs >= 0).astype(jnp.float32).reshape(-1)
        return jax.ops.segment_sum(v, flat, num_segments=K * P).reshape(K, P)
    bench("segment_sum", lambda: jax.block_until_ready(seg_sum(obs)), n=5)

    # small scatter: 1024 updates into [P]
    ids = jnp.asarray(rng.randint(0, P, (Nf,)), jnp.int32)
    @jax.jit
    def scat_small(ids):
        return jnp.zeros((P,), bool).at[ids].max(jnp.ones((Nf,), bool))
    bench("scatter 1024 -> [16384]", lambda: jax.block_until_ready(scat_small(ids)))

    @jax.jit
    def scat_32k(obs):
        ids = jnp.clip(obs[:32], 0).reshape(-1)
        return jnp.zeros((P,), bool).at[ids].max(jnp.ones((32 * Nf,), bool))
    bench("scatter 32K -> [16384]", lambda: jax.block_until_ready(scat_32k(obs)))

    # one-hot matmul for the 32K->P union (rows chunked over MXU)
    @jax.jit
    def union_matmul(obs):
        ids = jnp.clip(obs[:32], 0)                    # [32, 1024]
        v = (obs[:32] >= 0)
        oh = jax.nn.one_hot(ids, P, dtype=jnp.bfloat16)  # [32,1024,P] = 1GB bf16
        return (jnp.einsum("knp,kn->p", oh, v.astype(jnp.bfloat16)) > 0)
    bench("union via one_hot einsum 32x1024xP", lambda: jax.block_until_ready(
        union_matmul(obs)), n=3)

    # ---- median variants for [P, M] int
    M = 24
    D = jnp.asarray(rng.randint(0, 256, (P, M)), jnp.int32)
    bench("median [16384,24] sort", lambda: jax.block_until_ready(
        jax.jit(lambda d: jnp.median(d, axis=-1))(D)), n=10)
    bench("sort [16384,24]", lambda: jax.block_until_ready(
        jax.jit(lambda d: jnp.sort(d, axis=-1))(D)), n=10)
    # median via counting (values bounded 0..256): cumulative histogram
    @jax.jit
    def med_count(d):
        # median = smallest v such that count(<=v) >= M/2; bounded domain
        lt = d[:, None, :] <= jnp.arange(0, 257, 4)[None, :, None]  # [P,65,M]
        cnt = jnp.sum(lt, axis=-1)
        return jnp.argmax(cnt >= (M + 1) // 2, axis=1) * 4
    bench("median via counting (65 bins)", lambda: jax.block_until_ready(
        med_count(D)), n=10)


if __name__ == "__main__":
    main()
