"""Isolate the trigger of the 25ms/call floor. Run ONE candidate 'bad'
program (selected by argv[1]) in a fresh process, then measure a trivial
program before and after.

Usage: python exp_poison.py {scan|scatter|bigalloc|sort|median|vmapslice|modonly}
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def t_once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def stats(fn, n=10):
    ts = [t_once(fn) for _ in range(n)]
    return min(ts), sorted(ts)[n // 2]


def main():
    which = sys.argv[1]
    print("devices:", jax.devices(), "candidate:", which)
    x = jnp.zeros((128,))
    triv = jax.jit(lambda x: x * 2.0 + 1.0)
    triv(x).block_until_ready()
    mn, md = stats(lambda: triv(x).block_until_ready())
    print(f"trivial BEFORE: min {mn*1e3:.3f} median {md*1e3:.3f} ms")

    rng = np.random.RandomState(0)

    if which == "scan":
        @jax.jit
        def f(x):
            def body(c, _):
                return c + 1.0, None
            c, _ = jax.lax.scan(body, x, None, length=40)
            return c
        arg = x
    elif which == "scatter":
        P = 16384
        ids = jnp.asarray(rng.randint(0, P, (1024,)), jnp.int32)
        @jax.jit
        def f(ids):
            return jnp.zeros((P,), bool).at[ids].max(jnp.ones((1024,), bool))
        arg = ids
    elif which == "bigalloc":
        a = jnp.asarray(rng.rand(1024, 512).astype(np.float32))
        @jax.jit
        def f(a):
            big = a[:, None, :] * a[None, :, :]  # [1024,1024,512] f32 = 2GB
            return jnp.sum(big, axis=-1)
        arg = a
    elif which == "sort":
        d = jnp.asarray(rng.randint(0, 256, (16384, 24)), jnp.int32)
        f = jax.jit(lambda d: jnp.sort(d, axis=-1))
        arg = d
    elif which == "median":
        d = jnp.asarray(rng.randint(0, 256, (16384, 24)), jnp.int32)
        f = jax.jit(lambda d: jnp.median(d, axis=-1))
        arg = d
    elif which == "vmapslice":
        img = jnp.asarray(rng.rand(480, 640).astype(np.float32))
        yi = jnp.asarray(rng.randint(16, 464, (235,)), jnp.int32)
        xi = jnp.asarray(rng.randint(16, 624, (235,)), jnp.int32)
        G = jnp.asarray(rng.rand(31, 31).astype(np.float32))
        @jax.jit
        def f(img, yi, xi):
            def one(yc, xc):
                p = jax.lax.dynamic_slice(img, (yc - 15, xc - 15), (31, 31))
                return jnp.sum(p * G), jnp.sum(p)
            return jax.vmap(one)(yi, xi)
        arg = None
        f2 = lambda: jax.block_until_ready(f(img, yi, xi))
    elif which == "modonly":
        ang = jnp.asarray(rng.rand(235).astype(np.float32))
        @jax.jit
        def f(a):
            two_pi = 2.0 * jnp.pi
            return jnp.round((a % two_pi) / (two_pi / 32)).astype(jnp.int32) % 32
        arg = ang
    else:
        raise SystemExit("unknown")

    if which != "vmapslice":
        f2 = lambda: jax.block_until_ready(f(arg))

    f2()  # compile
    mn, md = stats(f2)
    print(f"candidate {which}: min {mn*1e3:.3f} median {md*1e3:.3f} ms")

    mn, md = stats(lambda: triv(x).block_until_ready())
    print(f"trivial AFTER : min {mn*1e3:.3f} median {md*1e3:.3f} ms")


if __name__ == "__main__":
    main()
