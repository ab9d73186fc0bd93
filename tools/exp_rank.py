"""Is the poison trigger the RANK of the captured literal?"""

import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
x = jnp.zeros((1024,))
x2 = jnp.zeros((31, 31))
triv = jax.jit(lambda x: x * 2.0 + 1.0)
triv(x).block_until_ready()


def med(fn, n=8):
    ts = []
    for _ in range(n):
        t1 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t1)
    return sorted(ts)[n // 2] * 1e3


def probe(tag):
    print(f"{tag:<38s} trivial {med(lambda: triv(x).block_until_ready()):7.3f} ms",
          flush=True)


probe("baseline")
rng = np.random.RandomState(0)
G = rng.rand(31, 31).astype(np.float32)
Gflat = G.reshape(-1)

# 1: flat literal + reshape inside jit
@jax.jit
def f1(x2):
    return x2 * Gflat.reshape(31, 31)

jax.block_until_ready(f1(x2))
print(f"flat-literal+reshape: {med(lambda: jax.block_until_ready(f1(x2))):7.3f} ms", flush=True)
probe("after flat+reshape")

# 2: vmap slice + iota-derived 2D weights (no literal)
img = jnp.asarray(rng.rand(480, 640).astype(np.float32))
yi = jnp.asarray(rng.randint(16, 464, (235,)), jnp.int32)
xi = jnp.asarray(rng.randint(16, 624, (235,)), jnp.int32)

@jax.jit
def f2(img, yi, xi):
    W = (jnp.arange(31)[:, None] * jnp.arange(31)[None, :]).astype(jnp.float32)
    def one(yc, xc):
        p = jax.lax.dynamic_slice(img, (yc - 15, xc - 15), (31, 31))
        return jnp.sum(p * W), jnp.sum(p)
    return jax.vmap(one)(yi, xi)

jax.block_until_ready(f2(img, yi, xi))
print(f"vmapslice iota-weights: {med(lambda: jax.block_until_ready(f2(img, yi, xi))):7.3f} ms", flush=True)
probe("after vmapslice-iota")

# 3: vmap slice + flat-literal-reshaped weights
@jax.jit
def f3(img, yi, xi):
    W = Gflat.reshape(31, 31)
    def one(yc, xc):
        p = jax.lax.dynamic_slice(img, (yc - 15, xc - 15), (31, 31))
        return jnp.sum(p * W), jnp.sum(p)
    return jax.vmap(one)(yi, xi)

jax.block_until_ready(f3(img, yi, xi))
print(f"vmapslice flat-reshape: {med(lambda: jax.block_until_ready(f3(img, yi, xi))):7.3f} ms", flush=True)
probe("after vmapslice flat-reshape")

# 4: plain 2D literal multiply (the suspected trigger) — LAST
@jax.jit
def f4(x2):
    return x2 * G

jax.block_until_ready(f4(x2))
print(f"2D literal multiply: {med(lambda: jax.block_until_ready(f4(x2))):7.3f} ms", flush=True)
probe("after 2D literal")
