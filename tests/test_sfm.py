"""Bundle adjustment + pose graph on synthetic scenes with exact ground truth.

These are the ATE-gate tests for the new distributed back-end (BASELINE.md):
noisy initialization must converge back to GT; the sharded (8-device mesh)
BA must agree with the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.geometry.utils import so3exp_map
from gluefactory_tpu.geometry.wrappers import Camera, Pose
from gluefactory_tpu.sfm import (
    BAProblem,
    bundle_adjust,
    bundle_adjust_sharded,
    optimize_pose_graph,
    triangulate_linear,
)

rng = np.random.default_rng(21)


@pytest.fixture(autouse=True)
def _fresh_rng():
    # reset the module rng per test: under pytest-xdist, tests of
    # this module run in arbitrary subsets/orders across workers,
    # so draw positions must not depend on which tests ran before
    global rng
    rng = np.random.default_rng(21)



def make_ba_scene(M=6, P=200, noise_px=0.0):
    """Cameras on an arc looking at a point cloud around the origin."""
    f = 500.0
    cam = Camera.from_fc(
        size=jnp.tile(jnp.array([640.0, 480.0]), (M, 1)),
        f=jnp.full((M, 2), f),
        c=jnp.tile(jnp.array([320.0, 240.0]), (M, 1)),
    )
    points = rng.uniform(-1, 1, (P, 3)) * np.array([2, 2, 1])
    angles = np.linspace(-0.4, 0.4, M)
    Rs, ts = [], []
    for a in angles:
        R = np.asarray(so3exp_map(jnp.asarray([0.0, a, 0.0], jnp.float32)))
        center = np.array([4 * np.sin(a), 0.0, -4 * np.cos(a) + 0.0])  # world
        t = -R @ center + np.array([0, 0, 5.0])  # push scene in front
        Rs.append(R)
        ts.append(t)
    poses = Pose(R=jnp.asarray(np.stack(Rs), jnp.float32), t=jnp.asarray(np.stack(ts), jnp.float32))
    pts = jnp.asarray(points, jnp.float32)
    # observations: all cams see all points (mask those behind/outside)
    obs_cam = np.repeat(np.arange(M), P).astype(np.int32)
    obs_pt = np.tile(np.arange(P), M).astype(np.int32)
    p_cam = jnp.einsum("mij,pj->mpi", poses.R, pts) + poses.t[:, None]
    uv, vis = jax.vmap(lambda c, p: c.cam2image(p))(cam, p_cam)
    uv = np.asarray(uv).reshape(M * P, 2)
    valid = np.asarray(vis).reshape(M * P)
    uv = uv + rng.normal(0, noise_px, uv.shape)
    return cam, poses, pts, obs_cam, obs_pt, jnp.asarray(uv, jnp.float32), jnp.asarray(valid)


def perturb(poses: Pose, pts, rot_sigma=0.01, t_sigma=0.05, pt_sigma=0.05, keep_first=1):
    M = poses.R.shape[0]
    d = rng.normal(0, 1, (M, 6)) * np.r_[[rot_sigma] * 3, [t_sigma] * 3]
    d[:int(keep_first)] = 0
    noisy = poses.retract_left(jnp.asarray(d, jnp.float32))
    noisy_pts = pts + jnp.asarray(rng.normal(0, pt_sigma, pts.shape), jnp.float32)
    return noisy, noisy_pts


def ate(poses_a: Pose, poses_b: Pose):
    ca = -jnp.einsum("mji,mj->mi", poses_a.R, poses_a.t)
    cb = -jnp.einsum("mji,mj->mi", poses_b.R, poses_b.t)
    return float(jnp.linalg.norm(ca - cb, axis=-1).mean())


def test_triangulation_exact():
    cam, poses, pts, obs_cam, obs_pt, uv, valid = make_ba_scene(M=4, P=50)
    M, P = 4, 50
    obs = np.asarray(uv).reshape(M, P, 2).transpose(1, 0, 2)
    mask = np.asarray(valid).reshape(M, P).T
    X = triangulate_linear(poses, cam, jnp.asarray(obs), jnp.asarray(mask))
    seen = mask.sum(1) >= 2
    err = np.linalg.norm(np.asarray(X)[seen] - np.asarray(pts)[seen], axis=-1)
    assert np.median(err) < 1e-3, np.median(err)


def test_bundle_adjustment_converges():
    cam, poses_gt, pts_gt, obs_cam, obs_pt, uv, valid = make_ba_scene(M=6, P=200)
    # fix TWO cameras: a single fixed pose leaves the global-scale gauge
    # free in monocular BA, so ATE vs GT would be meaningless
    noisy_poses, noisy_pts = perturb(poses_gt, pts_gt, keep_first=2)
    fixed = jnp.zeros(6, bool).at[0].set(True).at[1].set(True)
    problem = BAProblem(
        poses=noisy_poses, cameras=cam, points=noisy_pts,
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=uv, obs_valid=valid, fixed_cams=fixed,
    )
    ate_before = ate(noisy_poses, poses_gt)
    poses_opt, pts_opt, info = bundle_adjust(problem, num_iters=15)
    ate_after = ate(poses_opt, poses_gt)
    costs = np.asarray(info["costs"])
    assert costs[-1] < costs[0] * 1e-3, costs
    assert ate_after < 0.01 * max(ate_before, 1e-9), (ate_before, ate_after)


def test_bundle_adjustment_robust_to_outliers():
    cam, poses_gt, pts_gt, obs_cam, obs_pt, uv, valid = make_ba_scene(M=6, P=200, noise_px=0.3)
    uv = np.array(uv)
    n_out = 150
    out_idx = rng.choice(len(uv), n_out, replace=False)
    uv[out_idx] += rng.uniform(30, 120, (n_out, 2))
    noisy_poses, noisy_pts = perturb(poses_gt, pts_gt, rot_sigma=0.005, t_sigma=0.02,
                                     pt_sigma=0.02, keep_first=2)
    problem = BAProblem(
        poses=noisy_poses, cameras=cam, points=noisy_pts,
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv, jnp.float32), obs_valid=valid,
        fixed_cams=jnp.zeros(6, bool).at[0].set(True).at[1].set(True),
    )
    poses_opt, pts_opt, info = bundle_adjust(
        problem, num_iters=20, huber_delta=2.0, trim_th=15.0
    )
    assert ate(poses_opt, poses_gt) < 0.02


def test_bundle_adjustment_sharded_matches_single(devices):
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    cam, poses_gt, pts_gt, obs_cam, obs_pt, uv, valid = make_ba_scene(M=4, P=96)
    noisy_poses, noisy_pts = perturb(poses_gt, pts_gt)
    problem = BAProblem(
        poses=noisy_poses, cameras=cam, points=noisy_pts,
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=uv, obs_valid=valid,
        fixed_cams=jnp.zeros(4, bool).at[0].set(True),
    )
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("ba",))
    poses_s, pts_s, info_s = bundle_adjust_sharded(problem, mesh, num_iters=10)
    poses_1, pts_1, info_1 = bundle_adjust(problem, num_iters=10)
    np.testing.assert_allclose(
        np.asarray(info_s["costs"]), np.asarray(info_1["costs"]), rtol=2e-2,
        atol=1e-6,  # f32 psum reduction order drifts the trajectory up to
        # ~1% on some draws; the ate check below is the real equivalence gate
    )
    assert ate(poses_s, poses_1) < 1e-4


def test_pose_graph_closes_loop():
    # local rng: the module-level one makes this test's noise draw depend on
    # how many draws earlier tests consumed (order-dependent flake)
    rng = np.random.default_rng(23)
    M = 12
    # GT: poses on a circle (world->cam)
    Rs, ts = [], []
    for k in range(M):
        a = 2 * np.pi * k / M
        R = np.asarray(so3exp_map(jnp.asarray([0.0, 0.0, a], jnp.float32)))
        c = np.array([np.cos(a), np.sin(a), 0.0]) * 2.0
        ts.append(-R @ c)
        Rs.append(R)
    gt = Pose(R=jnp.asarray(np.stack(Rs), jnp.float32), t=jnp.asarray(np.stack(ts), jnp.float32))
    # odometry edges (noisy) + exact loop closure 0 <-> M-1
    ei, ej, meas_R, meas_t = [], [], [], []
    for k in range(M - 1):
        rel = gt[k + 1].compose(gt[k].inv())
        d = rng.normal(0, 1, 6) * np.r_[[0.02] * 3, [0.03] * 3]
        rel_noisy = rel.retract_left(jnp.asarray(d, jnp.float32))
        ei.append(k); ej.append(k + 1)
        meas_R.append(rel_noisy.R); meas_t.append(rel_noisy.t)
    rel = gt[M - 1].compose(gt[0].inv())
    ei.append(0); ej.append(M - 1)
    meas_R.append(rel.R); meas_t.append(rel.t)
    meas = Pose(R=jnp.stack(meas_R), t=jnp.stack(meas_t))
    # initialize by chaining noisy odometry
    init_R, init_t = [np.asarray(gt.R[0])], [np.asarray(gt.t[0])]
    cur = gt[0]
    for k in range(M - 1):
        cur = meas[k].compose(cur)
        init_R.append(np.asarray(cur.R)); init_t.append(np.asarray(cur.t))
    init = Pose(R=jnp.asarray(np.stack(init_R)), t=jnp.asarray(np.stack(init_t)))
    ate_before = ate(init, gt)
    opt, info = optimize_pose_graph(
        init, jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32), meas,
        num_iters=25,
    )
    ate_after = ate(opt, gt)
    assert ate_after < 0.5 * ate_before, (ate_before, ate_after)
    costs = np.asarray(info["costs"])
    assert costs[-1] < costs[0]


def test_full_sfm_pipeline():
    """matches -> incremental poses -> tracks -> triangulation -> BA on a
    synthetic sequence: recovered trajectory must align with GT up to the
    global scale gauge (first-baseline normalization)."""
    from gluefactory_tpu.sfm.pipeline import run_sfm

    M, P = 5, 150
    cam, poses_gt, pts_gt, obs_cam, obs_pt, uv, valid = make_ba_scene(M=M, P=P, noise_px=0.3)
    uv = np.asarray(uv).reshape(M, P, 2)
    vis = np.asarray(valid).reshape(M, P)
    # every view observes every point: keypoint k of view v IS point k
    matches = {}
    for i in range(M - 1):
        m = np.arange(P)
        m[~(vis[i] & vis[i + 1])] = -1
        matches[(i, i + 1)] = m
    out = run_sfm(uv, vis, matches, cam, ransac_th=2.0, num_hypotheses=512,
                  ba_iters=15)
    # reconstruction lives in camera-0's frame with a free global scale:
    # evaluate ATE after Sim(3) (Umeyama) alignment, normalized by the
    # trajectory extent
    from gluefactory_tpu.sfm.alignment import absolute_trajectory_error, camera_centers

    extent = np.linalg.norm(
        camera_centers(poses_gt) - camera_centers(poses_gt).mean(0), axis=-1
    ).max()
    ate_init = absolute_trajectory_error(out["poses_init"], poses_gt) / extent
    ate_opt = absolute_trajectory_error(out["poses"], poses_gt) / extent
    assert ate_opt < 0.02, (ate_init, ate_opt)
    assert ate_opt <= ate_init + 1e-6, (ate_init, ate_opt)
    costs = np.asarray(out["ba_info"]["costs"])
    assert costs[-1] <= costs[0]
