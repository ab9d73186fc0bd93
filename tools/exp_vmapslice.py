"""Instrumented rerun of the vmapslice candidate: where does time go?"""

import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.perf_counter()
print("devices:", jax.devices(), f"+{time.perf_counter()-t0:.1f}s", flush=True)

rng = np.random.RandomState(0)
x = jnp.zeros((128,))
triv = jax.jit(lambda x: x * 2.0 + 1.0)
triv(x).block_until_ready()
print(f"trivial ok +{time.perf_counter()-t0:.1f}s", flush=True)

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


print("lowering...", flush=True)
low = f.lower(img, yi, xi)
print(f"lowered +{time.perf_counter()-t0:.1f}s", flush=True)
comp = low.compile()
print(f"compiled +{time.perf_counter()-t0:.1f}s", flush=True)
out = comp(img, yi, xi)
jax.block_until_ready(out)
print(f"first run +{time.perf_counter()-t0:.1f}s", flush=True)
for i in range(5):
    t1 = time.perf_counter()
    jax.block_until_ready(comp(img, yi, xi))
    print(f"run {i}: {(time.perf_counter()-t1)*1e3:.3f} ms", flush=True)

t1 = time.perf_counter()
triv(x).block_until_ready()
print(f"trivial AFTER: {(time.perf_counter()-t1)*1e3:.3f} ms", flush=True)
