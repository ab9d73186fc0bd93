"""Strong-scaling benchmark of distributed bundle adjustment.

Runs the same global-BA problem on meshes of 1/2/4/8 devices and reports
throughput + parallel efficiency (BASELINE.md asks >= 70% at 2+ hosts).

On this environment only virtual CPU devices are available
(XLA_FLAGS=--xla_force_host_platform_device_count=8 on a 2-core host),
so the numbers measure the sharding overhead / collective correctness,
NOT real ICI scaling — virtual devices share the same cores.  Run on a
real slice for meaningful efficiency.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/bench_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_problem(C=32, Pn=4096, seed=0):
    import jax.numpy as jnp

    from orb_slam2_annotate_tpu.geometry import CameraModel
    from orb_slam2_annotate_tpu.solvers.ba_core import BAProblem

    rng = np.random.RandomState(seed)
    cam = CameraModel.create(fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                             width=640, height=480)
    X = rng.uniform([-4, -3, 4], [4, 3, 12], (Pn, 3)).astype(np.float32)
    Rs, ts, cam_i, pt_i, uvs = [], [], [], [], []
    for c in range(C):
        R = np.eye(3, dtype=np.float32)
        t = np.array([-0.15 * c, 0, 0], np.float32)
        Rs.append(R)
        ts.append(t)
        Xc = X @ R.T + t
        uv = np.stack([400 * Xc[:, 0] / Xc[:, 2] + 320,
                       400 * Xc[:, 1] / Xc[:, 2] + 240], 1)
        cam_i += [c] * Pn
        pt_i += list(range(Pn))
        uvs.append(uv + rng.randn(Pn, 2) * 0.4)
    E = C * Pn
    cam_fixed = np.zeros(C, bool)
    cam_fixed[0] = True
    return cam, BAProblem(
        R=jnp.asarray(np.stack(Rs)), t=jnp.asarray(np.stack(ts)),
        points=jnp.asarray(X + rng.randn(Pn, 3).astype(np.float32) * 0.03),
        cam_fixed=jnp.asarray(cam_fixed), cam_valid=jnp.ones(C, bool),
        pt_valid=jnp.ones(Pn, bool),
        cam_idx=jnp.asarray(cam_i, jnp.int32),
        pt_idx=jnp.asarray(pt_i, jnp.int32),
        uv=jnp.asarray(np.concatenate(uvs), jnp.float32),
        ur=jnp.full((E,), -1.0, jnp.float32),
        inv_sigma2=jnp.ones((E,), jnp.float32),
        edge_valid=jnp.ones((E,), bool),
    )


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import orb_slam2_annotate_tpu  # noqa: F401
    from orb_slam2_annotate_tpu.parallel import dist_ba

    n_avail = len(jax.devices())
    print(f"devices: {n_avail} x {jax.devices()[0].platform}")
    cam, prob0 = make_problem()
    results = {}
    n_list = [n for n in (1, 2, 4, 8) if n <= n_avail]
    for n in n_list:
        mesh = Mesh(np.array(jax.devices()[:n]), ("mp",))
        prob = dist_ba.shard_ba_problem(prob0, n)
        spec_pt = NamedSharding(mesh, P("mp"))
        spec_rep = NamedSharding(mesh, P())
        prob = prob._replace(
            points=jax.device_put(prob.points, spec_pt),
            pt_valid=jax.device_put(prob.pt_valid, spec_pt),
            cam_idx=jax.device_put(prob.cam_idx, spec_pt),
            pt_idx=jax.device_put(prob.pt_idx, spec_pt),
            uv=jax.device_put(prob.uv, spec_pt),
            ur=jax.device_put(prob.ur, spec_pt),
            inv_sigma2=jax.device_put(prob.inv_sigma2, spec_pt),
            edge_valid=jax.device_put(prob.edge_valid, spec_pt),
            R=jax.device_put(prob.R, spec_rep),
            t=jax.device_put(prob.t, spec_rep),
            cam_fixed=jax.device_put(prob.cam_fixed, spec_rep),
            cam_valid=jax.device_put(prob.cam_valid, spec_rep),
        )
        step = dist_ba.make_distributed_ba(mesh, iters=8)
        out = step(cam, prob)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = step(cam, prob)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        cost = float(out[3])
        results[n] = dt
        base = results[n_list[0]]
        eff = base / (dt * n) * n_list[0]
        print(f"n={n}: {dt*1e3:8.1f} ms/solve  cost={cost:10.1f} "
              f"speedup={base/dt:5.2f}x  efficiency={eff*100:5.1f}%")

    with open("SCALING.json", "w") as f:
        json.dump({str(k): v for k, v in results.items()}, f)
    print("wrote SCALING.json")


if __name__ == "__main__":
    main()
