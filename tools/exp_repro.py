"""Reproduce exp_sticky's exact f_cap (vmap slice + captured 2D array),
then the package's real ic_angles / extract."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
x = jnp.zeros((1024,))
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
    print(f"  -> trivial after {tag}: {med(lambda: triv(x).block_until_ready()):7.3f} ms",
          flush=True)


rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(480, 640).astype(np.float32))
yi = jnp.asarray(rng.randint(16, 464, (235,)), jnp.int32)
xi = jnp.asarray(rng.randint(16, 624, (235,)), jnp.int32)
G_dev = jnp.asarray(rng.rand(31, 31).astype(np.float32))

probe("baseline")

# EXACT f_cap from exp_sticky
@jax.jit
def f_cap(img, yi, xi):
    def one(yc, xc):
        p = jax.lax.dynamic_slice(img, (yc - 15, xc - 15), (31, 31))
        return jnp.sum(p * G_dev), jnp.sum(p)
    return jax.vmap(one)(yi, xi)

jax.block_until_ready(f_cap(img, yi, xi))
print(f"f_cap (captured 2D dev): {med(lambda: jax.block_until_ready(f_cap(img, yi, xi))):7.3f} ms", flush=True)
probe("f_cap")

# real package ic_angles
from orb_slam2_annotate_tpu.ops import orb
xy = jnp.stack([xi.astype(jnp.float32), yi.astype(jnp.float32)], 1)
valid = jnp.ones((235,), bool)
f_ang = jax.jit(orb.ic_angles)
jax.block_until_ready(f_ang(img, xy, valid))
print(f"ic_angles real: {med(lambda: jax.block_until_ready(f_ang(img, xy, valid))):7.3f} ms", flush=True)
probe("ic_angles")

# real extract
from orb_slam2_annotate_tpu.ops.extractor import ExtractorConfig, extract
cfg = ExtractorConfig(n_features=1024, n_levels=8)
jax.block_until_ready(extract(img, cfg).desc)
print(f"extract real: {med(lambda: jax.block_until_ready(extract(img, cfg).desc), n=5):7.3f} ms", flush=True)
probe("extract")
