"""Bundle adjustment + pose graph + feature/track tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from reconstruction_tpu.ba.bundle_adjust import (
    BAProblem, apply_pose, bundle_adjust)
from reconstruction_tpu.ba.features import harris_corners, describe
from reconstruction_tpu.ba.tracks import build_tracks, match_descriptors
from reconstruction_tpu.ba.pose_graph import (
    _exp_se3, pose_graph_optimize)
from reconstruction_tpu.core.camera import synthetic_rig


def _make_ba_problem(rng, num_cams=4, num_pts=60, pixel_noise=0.0,
                     pose_noise=0.01):
    cams = synthetic_rig(num_cams, span_deg=30.0)
    K = [np.asarray(c.K, np.float64) for c in cams]
    Rt_true = [np.asarray(c.Rt, np.float64) for c in cams]
    pts_true = rng.uniform(-1, 1, size=(num_pts, 3))

    obs_uv = np.zeros((num_pts, num_cams, 2), np.float32)
    obs_cam = np.zeros((num_pts, num_cams), np.int32)
    obs_ok = np.zeros((num_pts, num_cams), bool)
    for ci in range(num_cams):
        R, t = Rt_true[ci][:, :3], Rt_true[ci][:, 3]
        xc = pts_true @ R.T + t
        uv = (xc @ K[ci].T)
        uv = uv[:, :2] / uv[:, 2:3]
        obs_uv[:, ci] = uv + rng.normal(scale=pixel_noise, size=uv.shape)
        obs_cam[:, ci] = ci
        obs_ok[:, ci] = True

    # Perturb base extrinsics (except cam 0, the gauge anchor).
    Rt0 = [Rt_true[0]]
    from reconstruction_tpu.core.rectify import rodrigues_mat
    for ci in range(1, num_cams):
        dR = rodrigues_mat(rng.normal(scale=pose_noise, size=3))
        pert = np.zeros((3, 4))
        pert[:, :3] = dR @ Rt_true[ci][:, :3]
        pert[:, 3] = dR @ Rt_true[ci][:, 3] + rng.normal(scale=pose_noise, size=3)
        Rt0.append(pert)
    pts0 = pts_true + rng.normal(scale=0.05, size=pts_true.shape)

    prob = BAProblem(
        K=jnp.asarray(np.stack(K), jnp.float32),
        Rt0=jnp.asarray(np.stack(Rt0), jnp.float32),
        points0=jnp.asarray(pts0, jnp.float32),
        obs_uv=jnp.asarray(obs_uv),
        obs_cam=jnp.asarray(obs_cam),
        obs_ok=jnp.asarray(obs_ok),
    )
    return prob, Rt_true, pts_true


def test_analytic_jacobians_match_jacfwd(rng):
    """The closed-form per-observation Jacobians (production assembly)
    must match forward-mode autodiff of the same smoothed primal."""
    import jax
    from reconstruction_tpu.ba.bundle_adjust import (
        _jac_point, _jac_pose, _obs_jacobians, _residual)
    K = jnp.asarray(np.array([[800.0, 0, 320], [0, 820, 240],
                              [0, 0, 1]], np.float32))
    for trial in range(10):
        Rt = np.hstack([np.linalg.qr(rng.normal(size=(3, 3)))[0],
                        rng.normal(size=(3, 1))]).astype(np.float32)
        pose = (rng.normal(scale=0.3, size=6).astype(np.float32)
                if trial % 2 else np.zeros(6, np.float32))
        X = rng.normal(size=3).astype(np.float32)
        X[2] += 6.0
        uv = rng.uniform(0, 600, 2).astype(np.float32)
        args = (K, jnp.asarray(Rt), jnp.asarray(pose), jnp.asarray(X),
                jnp.asarray(uv))
        r, Jc, Jp = _obs_jacobians(*args)
        np.testing.assert_allclose(np.asarray(r),
                                   np.asarray(_residual(*args)),
                                   rtol=1e-5, atol=1e-5)
        ref_c = np.asarray(_jac_pose(*args))
        ref_p = np.asarray(_jac_point(*args))
        sc = max(1.0, np.abs(ref_c).max())
        sp = max(1.0, np.abs(ref_p).max())
        np.testing.assert_allclose(np.asarray(Jc) / sc, ref_c / sc,
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(Jp) / sp, ref_p / sp,
                                   atol=2e-4)


def test_ba_converges(rng):
    prob, Rt_true, pts_true = _make_ba_problem(rng)
    poses, points, costs = bundle_adjust(prob, iterations=8)
    costs = np.asarray(costs)
    assert costs[-1] < costs[0] * 1e-3, costs
    # reprojection cost near zero (noiseless observations)
    assert costs[-1] < 1.0, costs[-1]


def test_ba_recovers_geometry(rng):
    prob, Rt_true, pts_true = _make_ba_problem(rng, pixel_noise=0.0)
    poses, points, costs = bundle_adjust(prob, iterations=10)
    # Pinning cam0 fixes 6 of the 7 gauge DoF; SCALE about cam0's
    # center stays free (reprojection is similarity-invariant), so the
    # solver can land anywhere on the 1-D zero-cost manifold — compare
    # up to that scale.  (The pre-r4 assert compared raw coordinates
    # and passed only by luck of the step trajectory at this seed;
    # other seeds drifted to 0.1+ raw error at cost ~1e-8.)
    R0, t0 = Rt_true[0][:, :3], Rt_true[0][:, 3]
    C0 = -R0.T @ t0
    est = np.asarray(points) - C0
    ref = pts_true - C0
    s = float((est * ref).sum() / np.maximum((est * est).sum(), 1e-12))
    err = np.linalg.norm(C0 + s * est - pts_true, axis=1)
    assert np.median(err) < 5e-3, (np.median(err), s)
    assert abs(s - 1.0) < 0.25, s  # scale drift bounded by the damping
    # camera 2 recovered up to the same scale gauge: rotation exactly,
    # translation via t' = (t + (1-s^-1) R C0) * s^-1 ... equivalently
    # compare camera centers under the similarity.
    Rt2 = apply_pose(np.asarray(prob.Rt0[2]), np.asarray(poses[2]))
    R2, t2 = Rt2[:, :3], Rt2[:, 3]
    assert np.abs(R2 - Rt_true[2][:, :3]).max() < 5e-3
    C2 = -R2.T @ t2                       # estimated center (est frame)
    C2_aligned = C0 + s * (C2 - C0)
    C2_true = -Rt_true[2][:, :3].T @ Rt_true[2][:, 3]
    assert np.abs(C2_aligned - C2_true).max() < 5e-3


def test_harris_and_matching(rng):
    img = rng.uniform(0, 255, size=(120, 160)).astype(np.float32)
    valid = jnp.ones((120, 160), bool)
    f = harris_corners(jnp.asarray(img), valid, max_features=128)
    assert int(f.ok.sum()) > 50
    d = describe(jnp.asarray(img), f, radius=3)
    # identical image: features must match themselves
    m = np.asarray(match_descriptors(d, f.ok, d, f.ok, threshold=0.9))
    okn = np.asarray(f.ok)
    agree = (m[okn] == np.arange(len(m))[okn]).mean()
    assert agree > 0.9


def test_tracks_and_ba_from_features(rng):
    """Mini SfM loop: render textured views of a plane, detect, track, BA."""
    import sys
    sys.path.insert(0, "tests")
    from synthetic import make_stereo_scene
    cams, imgs, masks = make_stereo_scene(
        image_size=(160, 120), span_deg=10.0, num_cameras=3)
    feats, descs = [], []
    for img, msk in zip(imgs, masks):
        gray = jnp.asarray(img.mean(-1))
        f = harris_corners(gray, jnp.asarray(msk > 200), max_features=256)
        feats.append(f)
        descs.append(describe(gray, f, radius=4))
    K = [np.asarray(c.K, np.float64) for c in cams]
    Rt = [np.asarray(c.Rt, np.float64) for c in cams]
    prob = build_tracks(feats, descs, K, Rt,
                        pairs=[(0, 1), (1, 2), (0, 2)], threshold=0.7)
    assert prob.points0.shape[0] > 20, prob.points0.shape
    # structure-only refinement (calibration trusted, like the reference
    # rig) — avoids the similarity-gauge drift of free-camera BA on a
    # nearly-degenerate 3-view arc
    poses, points, costs = bundle_adjust(prob, iterations=6,
                                         fix_cameras=True)
    costs = np.asarray(costs)
    assert costs[-1] <= costs[0]
    # triangulated track points should lie near the known surface
    from synthetic import surface_fn
    p = np.asarray(points)
    sel = (np.abs(p[:, 0]) < 1.5) & (np.abs(p[:, 1]) < 1.5)
    dz = p[sel][:, 2] - surface_fn(p[sel][:, 0], p[sel][:, 1])
    # integer-pixel Harris detections bound accuracy to ~0.5 px of
    # disparity ~= 0.09 depth units at this focal/baseline
    assert np.median(np.abs(dz)) < 0.1


def test_pose_graph_chain(rng):
    """Chain of noisy odometry + one loop closure: GN reduces error."""
    N = 8
    T_true = [np.eye(4)]
    for i in range(1, N):
        xi = np.concatenate([rng.normal(scale=0.1, size=3),
                             rng.normal(scale=0.5, size=3)])
        T_true.append(np.asarray(_exp_se3(jnp.asarray(xi))) @ T_true[-1])
    T_true = np.stack(T_true)

    edges, Z = [], []
    for i in range(N - 1):
        edges.append([i, i + 1])
        Z.append(np.linalg.inv(T_true[i]) @ T_true[i + 1])
    edges.append([0, N - 1])
    Z.append(np.linalg.inv(T_true[0]) @ T_true[N - 1])
    edges = np.asarray(edges, np.int32)
    Z = np.stack(Z)

    # noisy init
    T_init = T_true.copy()
    for i in range(1, N):
        xi = np.concatenate([rng.normal(scale=0.05, size=3),
                             rng.normal(scale=0.1, size=3)])
        T_init[i] = np.asarray(_exp_se3(jnp.asarray(xi))) @ T_init[i]

    T_opt, costs = pose_graph_optimize(
        jnp.asarray(edges), jnp.asarray(Z), jnp.asarray(T_init), N,
        iterations=10)
    costs = np.asarray(costs)
    assert costs[-1] < costs[0] * 1e-4
    err = np.abs(np.asarray(T_opt) - T_true).max()
    assert err < 1e-3, err
