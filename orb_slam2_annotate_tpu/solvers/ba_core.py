"""Bundle adjustment engine: batched robust LM with Schur marginalization.

The TPU-native replacement for g2o's BlockSolver_6_3 +
OptimizationAlgorithmLevenberg stack used by Optimizer::BundleAdjustment /
LocalBundleAdjustment (Optimizer.cc:54-253, 483-813).  Where g2o walks a
sparse graph of vertex/edge objects, everything here is a padded edge list:

  cam_idx[E], pt_idx[E], uv[E,2], ur[E], inv_sigma2[E], valid[E]

and one LM iteration is a handful of batched einsums + segment reductions:

  residual/Jacobian   [E,3,{6,3}]      (VPU)
  Hpp = sum per point [P,3,3] -> batched 3x3 inverse
  B   = sum per (point,cam) [P,C,6,3]  (scatter-add)
  S   = Hcc - B Hpp^-1 B^T             (einsum -> MXU)
  dense Cholesky on the [6C, 6C] reduced camera system
  back-substitution for landmarks      (batched 3x3)

g2o's setMarginalized(true) IS the Schur step; setFixed becomes a boolean
mask zeroing camera Jacobians; robust Huber kernels become IRLS weights;
"edge level" outlier exclusion becomes the valid mask.

A matrix-free variant (conjugate gradient on the Schur complement with a
block-Jacobi preconditioner) is provided for camera counts where the dense
[P,C,6,3] tensor would not fit; it is also the unit that distributes over
a device mesh (each shard reduces its edge range, psum the camera system —
see parallel/dist_ba.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie
from ..geometry.camera import CameraModel

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAProblem(NamedTuple):
    """Padded BA problem.

    poses:  (R [C,3,3], t [C,3]) world->cam
    points: [P, 3]
    cam_fixed: [C] bool — fixed frontier KFs / gauge anchors
    cam_valid: [C] bool, pt_valid: [P] bool
    edges: cam_idx [E] i32, pt_idx [E] i32, uv [E,2], ur [E] (<0 = mono),
           inv_sigma2 [E], valid [E] bool
    """

    R: jnp.ndarray
    t: jnp.ndarray
    points: jnp.ndarray
    cam_fixed: jnp.ndarray
    cam_valid: jnp.ndarray
    pt_valid: jnp.ndarray
    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    uv: jnp.ndarray
    ur: jnp.ndarray
    inv_sigma2: jnp.ndarray
    edge_valid: jnp.ndarray


def edge_residual_jac(cam: CameraModel, prob: BAProblem):
    """Residuals + Jacobians for every edge.

    Returns r [E,3], Jc [E,3,6] (wrt left se3 update of the edge's camera),
    Jp [E,3,3] (wrt the world point), is_stereo [E], depth_ok [E].

    depth_ok gates out edges whose point sits at/behind the camera plane:
    their clamped-z Jacobians are ~1e14-scale and overflow f32 in the
    Hessian products (the reference instead drops such edges via its
    per-iteration chi2/depth checks, Optimizer.cc:705-743).
    """
    Re = prob.R[prob.cam_idx]  # [E,3,3]
    te = prob.t[prob.cam_idx]
    Xw = prob.points[prob.pt_idx]
    xc = jnp.einsum("eij,ej->ei", Re, Xw) + te
    x, y, z = xc[:, 0], xc[:, 1], xc[:, 2]
    depth_ok = z > 1e-3
    z_safe = jnp.where(z < 1e-3, 1e-3, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz

    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur_pred = u - cam.bf * iz

    is_stereo = prob.ur >= 0
    r = jnp.stack(
        [
            u - prob.uv[:, 0],
            v - prob.uv[:, 1],
            jnp.where(is_stereo, ur_pred - prob.ur, 0.0),
        ],
        axis=1,
    )

    du = jnp.stack([cam.fx * iz, jnp.zeros_like(x), -cam.fx * x * iz2], axis=1)
    dv = jnp.stack([jnp.zeros_like(x), cam.fy * iz, -cam.fy * y * iz2], axis=1)
    dr = du + jnp.stack([jnp.zeros_like(x), jnp.zeros_like(x), cam.bf * iz2], axis=1)
    dr = jnp.where(is_stereo[:, None], dr, 0.0)
    dpix = jnp.stack([du, dv, dr], axis=1)  # [E,3,3] d(uvr)/dxc

    eye = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), (xc.shape[0], 3, 3))
    J_xc_cam = jnp.concatenate([eye, -lie.hat(xc)], axis=2)  # [E,3,6]
    Jc = dpix @ J_xc_cam
    Jp = dpix @ Re  # dxc/dXw = R
    return r, Jc, Jp, is_stereo, depth_ok


def edge_chi2(r, inv_sigma2):
    return jnp.sum(r * r, axis=1) * inv_sigma2


def build_normal_eqs(cam: CameraModel, prob: BAProblem, robust: bool):
    """One linearization: returns the blocks of the normal equations.

    Hcc [C,6,6] (diag blocks), Hpp [P,3,3], B [P,C,6,3] (cam-point
    coupling, aggregated per (point, cam)), gc [C,6], gp [P,3], cost.
    """
    C = prob.R.shape[0]
    P = prob.points.shape[0]
    r, Jc, Jp, is_stereo, depth_ok = edge_residual_jac(cam, prob)
    chi2 = edge_chi2(r, prob.inv_sigma2)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    w_huber = jnp.where(
        robust & (chi2 > delta2), jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)), 1.0
    )
    fixed_e = prob.cam_fixed[prob.cam_idx]
    live_e = prob.edge_valid & depth_ok
    w = prob.inv_sigma2 * w_huber * live_e
    Jc = jnp.where(fixed_e[:, None, None], 0.0, Jc)

    Jcw = Jc * w[:, None, None]
    Jpw = Jp * w[:, None, None]

    Hcc_e = jnp.einsum("eij,eik->ejk", Jcw, Jc)  # [E,6,6]
    Hpp_e = jnp.einsum("eij,eik->ejk", Jpw, Jp)  # [E,3,3]
    Hcp_e = jnp.einsum("eij,eik->ejk", Jcw, Jp)  # [E,6,3]
    gc_e = jnp.einsum("eij,ei->ej", Jcw, r)      # [E,6]
    gp_e = jnp.einsum("eij,ei->ej", Jpw, r)      # [E,3]

    Hcc = jnp.zeros((C, 6, 6)).at[prob.cam_idx].add(Hcc_e)
    Hpp = jnp.zeros((P, 3, 3)).at[prob.pt_idx].add(Hpp_e)
    gc = jnp.zeros((C, 6)).at[prob.cam_idx].add(gc_e)
    gp = jnp.zeros((P, 3)).at[prob.pt_idx].add(gp_e)
    B = jnp.zeros((P, C, 6, 3)).at[prob.pt_idx, prob.cam_idx].add(Hcp_e)

    # robust cost (for LM accept/reject): huberized chi2; behind-camera
    # edges contribute a flat barrier so a step cannot "improve" cost by
    # pushing points behind the camera
    hub = jnp.where(
        chi2 > delta2,
        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2,
        chi2,
    )
    hub = jnp.where(depth_ok, hub, 1e6)
    cost = jnp.sum(hub * prob.edge_valid)
    return Hcc, Hpp, B, gc, gp, cost


def _damp_blocks(H, lam, eps=1e-9):
    d = jnp.diagonal(H, axis1=-2, axis2=-1)
    return H + (lam * d + eps)[..., None] * jnp.eye(H.shape[-1], dtype=H.dtype)


def schur_solve_dense(Hcc, Hpp, B, gc, gp, lam, cam_free_mask):
    """Direct dense solve of the Schur-reduced camera system.

    cam_free_mask: [C] bool — cameras allowed to move.
    Returns (dc [C,6], dp [P,3]).
    """
    C = Hcc.shape[0]
    Hcc_d = _damp_blocks(Hcc, lam)
    Hpp_d = _damp_blocks(Hpp, lam)
    Hpp_inv = jnp.linalg.inv(Hpp_d + 1e-8 * jnp.eye(3))

    # S = blockdiag(Hcc) - B Hpp^-1 B^T   (einsum over points -> [C,C,6,6])
    BH = jnp.einsum("pcij,pjk->pcik", B, Hpp_inv)  # [P,C,6,3]
    S_off = jnp.einsum("pcik,pdlk->cdil", BH, B)   # [C,C,6,6]
    S = -S_off
    S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)

    # reduced rhs: -gc + B Hpp^-1 gp
    rhs = -gc + jnp.einsum("pcik,pk->ci", BH, gp)  # [C,6]

    # flatten to [6C, 6C]; inactive cameras get identity rows
    Sf = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    mask6 = jnp.repeat(cam_free_mask, 6)
    Sf = jnp.where(mask6[:, None] & mask6[None, :], Sf, 0.0)
    Sf = Sf + jnp.diag(jnp.where(mask6, 0.0, 1.0))
    rf = jnp.where(mask6, rhs.reshape(-1), 0.0)

    dc = jax.scipy.linalg.solve(Sf, rf, assume_a="pos").reshape(C, 6)
    dc = jnp.where(cam_free_mask[:, None], dc, 0.0)

    # back-substitute landmarks: dp = Hpp^-1 (-gp - B^T dc)
    Btdc = jnp.einsum("pcij,ci->pj", B, dc)  # [P,3]
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, -gp - Btdc)
    return dc, dp


@partial(jax.jit, static_argnums=(2, 3))
def bundle_adjust(cam: CameraModel, prob: BAProblem, iters: int = 10,
                  robust: bool = True, lam0: float = 1e-5):
    """Robust LM bundle adjustment with dense Schur solve.

    Mirrors LocalBundleAdjustment's 5-then-10 iteration schedule when
    called twice with an outlier re-mask in between; a single call does
    `iters` LM steps with Huber IRLS re-weighting each iteration.

    Returns (R [C,3,3], t [C,3], points [P,3], edge_inlier [E], cost).
    """
    cam_free = prob.cam_valid & ~prob.cam_fixed

    def lm_step(carry, _):
        R, t, X, lam = carry
        p = prob._replace(R=R, t=t, points=X)
        Hcc, Hpp, B, gc, gp, cost = build_normal_eqs(cam, p, robust)
        dc, dp = schur_solve_dense(Hcc, Hpp, B, gc, gp, lam, cam_free)

        R_new, t_new = jax.vmap(lie.se3_retract)(R, t, dc)
        X_new = X + dp * prob.pt_valid[:, None]

        p_new = prob._replace(R=R_new, t=t_new, points=X_new)
        *_, cost_new = build_normal_eqs(cam, p_new, robust)
        better = cost_new < cost
        R = jnp.where(better, R_new, R)
        t = jnp.where(better, t_new, t)
        X = jnp.where(better, X_new, X)
        lam = jnp.where(better, lam * 0.3, lam * 8.0)
        return (R, t, X, lam), cost_new

    (R, t, X, _), costs = jax.lax.scan(
        lm_step, (prob.R, prob.t, prob.points, jnp.asarray(lam0)), None, length=iters
    )

    # final chi2 classification (Optimizer.cc:705-743)
    p = prob._replace(R=R, t=t, points=X)
    r, _, _, is_stereo, depth_ok = edge_residual_jac(cam, p)
    chi2 = edge_chi2(r, prob.inv_sigma2)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    # positive-depth check like the reference's pMP->IsInKeyFrame + chi2 gate
    inlier = prob.edge_valid & (chi2 <= delta2) & depth_ok
    return R, t, X, inlier, costs[-1]
