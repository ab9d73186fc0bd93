"""Sim(3) estimation between keyframes for loop closing.

Replaces Sim3Solver.cc: Horn's closed-form absolute orientation
(quaternion eigendecomposition, ComputeCentroid:232 / ComputeSim3:240)
inside a RANSAC loop (iterate:150).  TPU-first: all RANSAC hypotheses are
solved at once — [S, 3] point triples -> vmapped 4x4 symmetric
eigendecompositions -> [S, N] reprojection scoring in both directions.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import CameraModel


def horn_sim3(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray,
              fix_scale: bool = False):
    """Closed-form Sim3 (s, R, t) with x2 ~ s R x1 + t (weighted Horn).

    x1, x2: [N, 3]; w: [N] weights.  Horn 1987 quaternion method.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c1 = jnp.sum(x1 * w[:, None], axis=0) / wsum
    c2 = jnp.sum(x2 * w[:, None], axis=0) / wsum
    a = x1 - c1
    b = x2 - c2
    M = jnp.einsum("ni,nj,n->ij", a, b, w)  # sum a b^T

    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    Q = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    vals, vecs = jnp.linalg.eigh(Q)
    q = vecs[:, -1]  # [w, x, y, z]
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    R = jnp.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )
    Ra = a @ R.T
    num = jnp.sum(Ra * b * w[:, None])
    den = jnp.maximum(jnp.sum(Ra * Ra * w[:, None]), 1e-12)
    s = jnp.where(fix_scale, 1.0, num / den)
    t = c2 - s * (R @ c1)
    return s, R, t


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnums=(6, 7))
def sim3_ransac(key, cam: CameraModel, x1, x2, uv1, uv2,
                n_hyp: int = 128, fix_scale: bool = False,
                valid=None, th_chi2: float = 9.21,
                inv_sigma2_1=None, inv_sigma2_2=None) -> Sim3Result:
    """RANSAC Sim3 from matched 3D point pairs with image-space scoring.

    x1, x2: [N,3] matched map points in the two keyframes' CAMERA frames
    (like the reference, Sim3Solver.cc:66-99).  uv1, uv2: their observed
    pixels.  Scoring projects x2 through S12^-1 into image 1 and x1
    through S12 into image 2 (CheckInliers, Sim3Solver.cc:224).
    th_chi2 = 9.21 (Sim3Solver.cc:86 mTh ~ chi2 99% 2dof).
    """
    N = x1.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)
    if inv_sigma2_1 is None:
        inv_sigma2_1 = jnp.ones((N,))
    if inv_sigma2_2 is None:
        inv_sigma2_2 = jnp.ones((N,))

    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1e-9)
    keys = jax.random.split(key, n_hyp)
    samples = jax.vmap(
        lambda k: jax.random.choice(k, N, (3,), replace=False, p=probs)
    )(keys)

    def fit(sample):
        w3 = jnp.ones((3,))
        return horn_sim3(x1[sample], x2[sample], w3, fix_scale)

    ss, Rs, ts = jax.vmap(fit)(samples)

    def score(s, R, t):
        # x1 -> frame 2
        y2 = s * (x1 @ R.T) + t
        u2 = jnp.stack(
            [cam.fx * y2[:, 0] / jnp.maximum(y2[:, 2], 1e-6) + cam.cx,
             cam.fy * y2[:, 1] / jnp.maximum(y2[:, 2], 1e-6) + cam.cy], 1
        )
        e2 = jnp.sum((u2 - uv2) ** 2, 1) * inv_sigma2_2
        # x2 -> frame 1 (inverse)
        si = 1.0 / s
        Ri = R.T
        ti = -si * (Ri @ t)
        y1 = si * (x2 @ Ri.T) + ti
        u1 = jnp.stack(
            [cam.fx * y1[:, 0] / jnp.maximum(y1[:, 2], 1e-6) + cam.cx,
             cam.fy * y1[:, 1] / jnp.maximum(y1[:, 2], 1e-6) + cam.cy], 1
        )
        e1 = jnp.sum((u1 - uv1) ** 2, 1) * inv_sigma2_1
        inl = valid & (e1 < th_chi2) & (e2 < th_chi2) & (y1[:, 2] > 0) & (y2[:, 2] > 0)
        return jnp.sum(inl), inl

    ns, inls = jax.vmap(score)(ss, Rs, ts)
    best = jnp.argmax(ns)
    # refine on inliers with weighted Horn
    w = inls[best].astype(jnp.float32)
    s_r, R_r, t_r = horn_sim3(x1, x2, w, fix_scale)
    n_r, inl_r = score(s_r, R_r, t_r)
    use_refined = n_r >= ns[best]
    s_f = jnp.where(use_refined, s_r, ss[best])
    R_f = jnp.where(use_refined, R_r, Rs[best])
    t_f = jnp.where(use_refined, t_r, ts[best])
    inl_f = jnp.where(use_refined, inl_r, inls[best])
    n_f = jnp.maximum(n_r, ns[best])
    return Sim3Result(n_f >= 20, s_f, R_f, t_f, inl_f, n_f)
