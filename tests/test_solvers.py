"""Tests for the LM solvers: motion-only pose optimization and Schur BA."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_annotate_tpu.geometry import CameraModel, lie
from orb_slam2_annotate_tpu.solvers import ba_core, pose_opt

CAM = CameraModel.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0,
                         width=640, height=480)


def make_pose_problem(n=200, n_outliers=0, noise=0.5, stereo=False, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform([-3, -2, 4], [3, 2, 10], (n, 3)).astype(np.float32)
    R_true = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.08], jnp.float32)))
    t_true = np.array([0.2, -0.1, 0.3], np.float32)
    Xc = X @ R_true.T + t_true
    uv = np.stack(
        [500 * Xc[:, 0] / Xc[:, 2] + 320, 500 * Xc[:, 1] / Xc[:, 2] + 240], axis=1
    ) + rng.randn(n, 2) * noise
    if stereo:
        ur = uv[:, 0] - 50.0 / Xc[:, 2] + rng.randn(n) * noise
    else:
        ur = np.full(n, -1.0, np.float32)
    if n_outliers:
        idx = rng.choice(n, n_outliers, replace=False)
        uv[idx] += rng.uniform(30, 120, (n_outliers, 2)) * np.sign(rng.randn(n_outliers, 2))
    obs = pose_opt.PoseObs(
        xw=jnp.asarray(X),
        uv=jnp.asarray(uv, jnp.float32),
        ur=jnp.asarray(ur, jnp.float32),
        inv_sigma2=jnp.ones(n, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    return obs, R_true, t_true


def pose_err(R, t, R_true, t_true):
    dR = np.asarray(R) @ R_true.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    return ang, np.linalg.norm(np.asarray(t) - t_true)


def test_pose_opt_converges_from_perturbed_start():
    obs, R_true, t_true = make_pose_problem()
    R0, t0 = lie.se3_retract(
        jnp.asarray(R_true), jnp.asarray(t_true),
        jnp.asarray([0.05, -0.05, 0.02, 0.03, -0.02, 0.04]),
    )
    R, t, inl, n = pose_opt.optimize_pose(CAM, R0, t0, obs)
    ang, terr = pose_err(R, t, R_true, t_true)
    assert ang < 2e-3, f"rot err {ang}"
    # tz is weakly observable at this depth/noise; compare costs instead
    assert terr < 5e-2, f"trans err {terr}"
    r, _, st, _ = pose_opt._residual_jac(CAM, R, t, obs)
    r_true, _, _, _ = pose_opt._residual_jac(
        CAM, jnp.asarray(R_true), jnp.asarray(t_true), obs
    )
    cost = float(jnp.sum(pose_opt._chi2(r, obs.inv_sigma2, st)))
    cost_true = float(jnp.sum(pose_opt._chi2(r_true, obs.inv_sigma2, st)))
    assert cost <= cost_true * 1.05, f"cost {cost} vs truth {cost_true}"
    assert int(n) > 190


def test_pose_opt_robust_to_outliers():
    obs, R_true, t_true = make_pose_problem(n=300, n_outliers=90, noise=0.5, seed=1)
    R0, t0 = lie.se3_retract(
        jnp.asarray(R_true), jnp.asarray(t_true),
        jnp.asarray([0.03, 0.02, -0.03, -0.02, 0.03, 0.02]),
    )
    R, t, inl, n = pose_opt.optimize_pose(CAM, R0, t0, obs)
    ang, terr = pose_err(R, t, R_true, t_true)
    assert ang < 5e-3, f"rot err {ang}"
    assert terr < 6e-2, f"trans err {terr}"
    # outliers should be flagged out
    assert 180 < int(n) < 240


def test_pose_opt_stereo():
    obs, R_true, t_true = make_pose_problem(stereo=True, seed=2)
    R0, t0 = lie.se3_retract(
        jnp.asarray(R_true), jnp.asarray(t_true),
        jnp.asarray([0.04, -0.03, 0.02, 0.02, -0.04, 0.03]),
    )
    R, t, inl, n = pose_opt.optimize_pose(CAM, R0, t0, obs)
    ang, terr = pose_err(R, t, R_true, t_true)
    # stereo observes depth directly -> tight bounds hold
    assert ang < 2e-3 and terr < 1e-2


def make_ba_problem(n_cams=6, n_pts=150, noise=0.3, seed=0, pix_noise=0.5):
    """Cameras on an arc looking at a point cloud; all observe all points."""
    rng = np.random.RandomState(seed)
    X_true = rng.uniform([-3, -2, 6], [3, 2, 12], (n_pts, 3)).astype(np.float32)
    Rs, ts = [], []
    for i in range(n_cams):
        phi = np.array([0.0, 0.05 * i, 0.0], np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        t = np.array([-0.4 * i, 0.0, 0.0], np.float32)
        Rs.append(R)
        ts.append(t)
    Rs = np.stack(Rs)
    ts = np.stack(ts)

    cam_idx, pt_idx, uvs, urs = [], [], [], []
    for c in range(n_cams):
        Xc = X_true @ Rs[c].T + ts[c]
        uv = np.stack(
            [500 * Xc[:, 0] / Xc[:, 2] + 320, 500 * Xc[:, 1] / Xc[:, 2] + 240],
            axis=1,
        ) + rng.randn(n_pts, 2) * pix_noise
        cam_idx += [c] * n_pts
        pt_idx += list(range(n_pts))
        uvs.append(uv)
        urs.append(np.full(n_pts, -1.0))
    E = n_cams * n_pts

    # perturb initial estimates (keep cam 0 fixed as gauge)
    R0 = Rs.copy()
    t0 = ts.copy()
    for c in range(1, n_cams):
        dR, dt = lie.se3_exp(jnp.asarray(rng.randn(6) * noise * 0.05, jnp.float32))
        R0[c], t0[c] = np.asarray(
            lie.se3_compose(dR, dt, jnp.asarray(Rs[c]), jnp.asarray(ts[c]))[0]
        ), np.asarray(
            lie.se3_compose(dR, dt, jnp.asarray(Rs[c]), jnp.asarray(ts[c]))[1]
        )
    X0 = X_true + rng.randn(n_pts, 3).astype(np.float32) * noise * 0.3

    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[0] = True
    prob = ba_core.BAProblem(
        R=jnp.asarray(R0), t=jnp.asarray(t0),
        points=jnp.asarray(X0),
        cam_fixed=jnp.asarray(cam_fixed),
        cam_valid=jnp.ones(n_cams, bool),
        pt_valid=jnp.ones(n_pts, bool),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uv=jnp.asarray(np.concatenate(uvs), jnp.float32),
        ur=jnp.asarray(np.concatenate(urs), jnp.float32),
        inv_sigma2=jnp.ones(E, jnp.float32),
        edge_valid=jnp.ones(E, bool),
    )
    return prob, Rs, ts, X_true


def reproj_rmse(cam, prob):
    r, _, _, _, _ = ba_core.edge_residual_jac(cam, prob)
    e2 = np.asarray(jnp.sum(r[:, :2] ** 2, axis=1))
    return float(np.sqrt(e2.mean()))


def test_ba_reduces_reprojection_error():
    prob, Rs, ts, X_true = make_ba_problem()
    rmse0 = reproj_rmse(CAM, prob)
    R, t, X, inlier, cost = ba_core.bundle_adjust(CAM, prob, iters=15)
    prob_opt = prob._replace(R=R, t=t, points=X)
    rmse1 = reproj_rmse(CAM, prob_opt)
    assert rmse0 > 2.0, "perturbation too small to be meaningful"
    assert rmse1 < 0.8, f"BA did not converge: rmse {rmse0} -> {rmse1}"
    # poses recovered (cam0 gauge-fixed so absolute comparison is valid)
    for c in range(prob.R.shape[0]):
        dR = np.asarray(R[c]) @ Rs[c].T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 3e-3, f"cam {c} rot err {ang}"
        assert np.linalg.norm(np.asarray(t[c]) - ts[c]) < 3e-2


def test_ba_respects_fixed_cameras():
    prob, *_ = make_ba_problem(seed=3)
    R, t, X, inlier, cost = ba_core.bundle_adjust(CAM, prob, iters=5)
    np.testing.assert_array_equal(np.asarray(R[0]), np.asarray(prob.R[0]))
    np.testing.assert_array_equal(np.asarray(t[0]), np.asarray(prob.t[0]))


def test_ba_flags_outlier_edges():
    prob, *_ = make_ba_problem(seed=4)
    # corrupt 5% of edges
    uv = np.asarray(prob.uv).copy()
    rng = np.random.RandomState(5)
    bad = rng.choice(uv.shape[0], uv.shape[0] // 20, replace=False)
    uv[bad] += 80.0
    prob = prob._replace(uv=jnp.asarray(uv))
    R, t, X, inlier, cost = ba_core.bundle_adjust(CAM, prob, iters=15)
    inl = np.asarray(inlier)
    assert inl[bad].mean() < 0.1, "outlier edges not flagged"
    good = np.setdiff1d(np.arange(uv.shape[0]), bad)
    assert inl[good].mean() > 0.95, "too many good edges flagged"


def test_ba_cg_matches_dense_schur():
    """Matrix-free Schur-PCG must converge like the dense solver."""
    from orb_slam2_annotate_tpu.solvers import ba_cg

    prob, Rs, ts, X_true = make_ba_problem(seed=6)
    rmse0 = reproj_rmse(CAM, prob)
    R, t, X, inlier, cost = ba_cg.bundle_adjust_cg(CAM, prob, iters=15,
                                                   cg_iters=30)
    rmse1 = reproj_rmse(CAM, prob._replace(R=R, t=t, points=X))
    assert rmse0 > 2.0
    assert rmse1 < 0.8, f"CG BA rmse {rmse0} -> {rmse1}"
    for c in range(prob.R.shape[0]):
        dR = np.asarray(R[c]) @ Rs[c].T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 5e-3, f"cam {c} rot err {ang}"


def test_ba_grid_matches_flat():
    """bundle_adjust_grid (gather assembly) must converge like the flat
    scatter path on the same problem."""
    prob, Rs, ts, X_true = make_ba_problem()
    n_cams = prob.R.shape[0]
    n_pts = prob.points.shape[0]
    # flat edge list is the dense [C, P] grid here: pt_loc[c, n] = n
    pt_loc = jnp.broadcast_to(jnp.arange(n_pts, dtype=jnp.int32)[None, :],
                              (n_cams, n_pts))
    g = ba_core.GridBA(
        R=prob.R, t=prob.t, points=prob.points,
        cam_fixed=prob.cam_fixed, cam_valid=prob.cam_valid,
        pt_valid=prob.pt_valid, pt_loc=pt_loc,
        uv=prob.uv.reshape(n_cams, n_pts, 2),
        ur=prob.ur.reshape(n_cams, n_pts),
        inv_sigma2=prob.inv_sigma2.reshape(n_cams, n_pts),
        edge_valid=prob.edge_valid.reshape(n_cams, n_pts),
    )
    R, t, X, inlier, cost = ba_core.bundle_adjust_grid(CAM, g, iters=15)
    prob_opt = prob._replace(R=R, t=t, points=X)
    rmse = reproj_rmse(CAM, prob_opt)
    assert rmse < 0.8, f"grid BA did not converge: rmse {rmse}"
    assert bool(jnp.all(inlier == inlier.reshape(n_cams, n_pts))), "shape"
    for c in range(n_cams):
        err = np.linalg.norm(np.asarray(t[c]) - ts[c])
        assert err < 0.05, f"cam {c} translation error {err}"
