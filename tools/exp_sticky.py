"""Two hypotheses:
H1: jit programs with captured (closure) constant arrays run ~25ms while
    identical programs taking the same arrays as ARGS run ~0.1ms.
H2: after any long-running program executes, ALL subsequent calls pay a
    ~25ms floor (sticky slow wait-mode).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.perf_counter()
print("devices:", jax.devices(), flush=True)

rng = np.random.RandomState(0)
x = jnp.zeros((128,))
triv = jax.jit(lambda x: x * 2.0 + 1.0)
triv(x).block_until_ready()


def stats(fn, n=10):
    ts = []
    for _ in range(n):
        t1 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t1)
    return f"min {min(ts)*1e3:7.3f} med {sorted(ts)[n//2]*1e3:7.3f} ms"


print("trivial baseline:", stats(lambda: triv(x).block_until_ready()), flush=True)

img = jnp.asarray(rng.rand(480, 640).astype(np.float32))
yi = jnp.asarray(rng.randint(16, 464, (235,)), jnp.int32)
xi = jnp.asarray(rng.randint(16, 624, (235,)), jnp.int32)
G_np = rng.rand(31, 31).astype(np.float32)
G_dev = jnp.asarray(G_np)

# ---- H1a: constants as ARGS
@jax.jit
def f_arg(img, yi, xi, G):
    def one(yc, xc):
        p = jax.lax.dynamic_slice(img, (yc - 15, xc - 15), (31, 31))
        return jnp.sum(p * G), jnp.sum(p)
    return jax.vmap(one)(yi, xi)

jax.block_until_ready(f_arg(img, yi, xi, G_dev))
print("vmapslice G-as-arg     :", stats(
    lambda: jax.block_until_ready(f_arg(img, yi, xi, G_dev))), flush=True)

print("trivial after H1a      :", stats(lambda: triv(x).block_until_ready()), flush=True)

# ---- H1b: captured device constant
@jax.jit
def f_cap(img, yi, xi):
    def one(yc, xc):
        p = jax.lax.dynamic_slice(img, (yc - 15, xc - 15), (31, 31))
        return jnp.sum(p * G_dev), jnp.sum(p)
    return jax.vmap(one)(yi, xi)

jax.block_until_ready(f_cap(img, yi, xi))
print("vmapslice G captured   :", stats(
    lambda: jax.block_until_ready(f_cap(img, yi, xi))), flush=True)

print("trivial after H1b      :", stats(lambda: triv(x).block_until_ready()), flush=True)

# ---- H1c: captured NUMPY constant (traced as literal)
@jax.jit
def f_np(img, yi, xi):
    def one(yc, xc):
        p = jax.lax.dynamic_slice(img, (yc - 15, xc - 15), (31, 31))
        return jnp.sum(p * G_np), jnp.sum(p)
    return jax.vmap(one)(yi, xi)

jax.block_until_ready(f_np(img, yi, xi))
print("vmapslice G numpy lit  :", stats(
    lambda: jax.block_until_ready(f_np(img, yi, xi))), flush=True)

print("trivial after H1c      :", stats(lambda: triv(x).block_until_ready()), flush=True)

# ---- H2: deliberately long program (~50ms of real matmul work)
A = jnp.asarray(rng.rand(4096, 4096).astype(np.float32))

@jax.jit
def longprog(A):
    B = A
    for _ in range(60):
        B = B @ A * 1e-9
    return B

jax.block_until_ready(longprog(A))
print("longprog               :", stats(
    lambda: jax.block_until_ready(longprog(A)), n=3), flush=True)

print("trivial after longprog :", stats(lambda: triv(x).block_until_ready(), n=20), flush=True)
print("vmap-arg after longprog:", stats(
    lambda: jax.block_until_ready(f_arg(img, yi, xi, G_dev))), flush=True)
time.sleep(2)
print("trivial after 2s idle  :", stats(lambda: triv(x).block_until_ready(), n=20), flush=True)
