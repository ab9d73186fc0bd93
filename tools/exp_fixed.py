"""Post-fix timing: extract + ic_angles must now be ~1ms and not poison."""

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


def med(fn, n=10):
    ts = []
    for _ in range(n):
        t1 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t1)
    return sorted(ts)[n // 2] * 1e3


def probe(tag):
    print(f"  -> trivial after {tag}: {med(lambda: triv(x).block_until_ready()):7.3f} ms", flush=True)


rng = np.random.RandomState(0)
img = jnp.asarray((rng.rand(480, 640) * 255).astype(np.float32))
probe("baseline")

from orb_slam2_annotate_tpu.ops import orb
from orb_slam2_annotate_tpu.ops.extractor import ExtractorConfig, extract

tab = orb.tables()
xy = jnp.asarray(np.stack([rng.randint(20, 620, 235), rng.randint(20, 460, 235)], 1).astype(np.float32))
valid = jnp.ones((235,), bool)

f_ang = jax.jit(orb.ic_angles)
jax.block_until_ready(f_ang(img, xy, valid, tab))
print(f"ic_angles (tab arg): {med(lambda: jax.block_until_ready(f_ang(img, xy, valid, tab))):7.3f} ms", flush=True)
probe("ic_angles")

cfg = ExtractorConfig(n_features=1024, n_levels=8)
jax.block_until_ready(extract(img, cfg).desc)
print(f"extract 8lvl 1024f: {med(lambda: jax.block_until_ready(extract(img, cfg).desc)):7.3f} ms", flush=True)
probe("extract")

# full frame build
from orb_slam2_annotate_tpu.geometry import CameraModel
from orb_slam2_annotate_tpu.pipeline.frame import make_frame_mono

cam = CameraModel.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                         width=640, height=480)
jax.block_until_ready(make_frame_mono(img, cam, cfg).desc)
print(f"make_frame_mono: {med(lambda: jax.block_until_ready(make_frame_mono(img, cam, cfg).desc)):7.3f} ms", flush=True)
probe("make_frame_mono")
