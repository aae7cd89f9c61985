"""Video-sequence driver test: 3 frames, per-frame reconstruction stub +
pose-graph chaining."""

import numpy as np
import jax.numpy as jnp
import pytest

from reconstruction_tpu.config import preset
from reconstruction_tpu.pipeline.reconstruct import PairInput
from reconstruction_tpu.pipeline.video import reconstruct_video
from synthetic import make_stereo_scene


def test_video_driver_chains_frames():
    cfg = preset("tiny")
    cams, imgs, masks = make_stereo_scene(image_size=(160, 120),
                                          span_deg=8.0, num_cameras=2)

    def loader(i):
        # static scene; tiny brightness jitter per frame
        j = (i + 1) * 0.0
        return [PairInput(
            image0=imgs[0] + j, image1=imgs[1] + j,
            mask0=masks[0], mask1=masks[1],
            K0=np.asarray(cams[0].K), Rt0=np.asarray(cams[0].Rt),
            K1=np.asarray(cams[1].K), Rt1=np.asarray(cams[1].Rt))]

    class FakeRecon:
        def __init__(self):
            self.vertices = np.zeros((10, 3))
            self.faces = np.zeros((4, 3), np.int32)

    calls = []

    def fake_reconstruct(cfg, pairs):
        calls.append(len(pairs))
        return FakeRecon()

    results = reconstruct_video(cfg, loader, 3,
                                reconstruct_frame=fake_reconstruct,
                                depth_hint=8.0)
    assert len(results) == 3
    assert calls == [1, 1, 1]
    # static scene => optimized rig poses stay near identity
    for r in results:
        np.testing.assert_allclose(r.rig_pose[:3, :3], np.eye(3), atol=0.05)
        assert np.linalg.norm(r.rig_pose[:3, 3]) < 0.5


def _tr(x, y, z):
    T = np.eye(4)
    T[:3, 3] = (x, y, z)
    return T


def test_pose_graph_loop_closure_snaps_back():
    """VERDICT item: a loop trajectory whose odometry chain drifts must
    snap back when the (independent, exact) closure edge is added —
    end-pose error drops by well over 5x."""
    from reconstruction_tpu.ba.pose_graph import pose_graph_optimize

    # Square loop: 8 unit steps returning to the origin.
    steps = [(1, 0), (1, 0), (0, 1), (0, 1),
             (-1, 0), (-1, 0), (0, -1), (0, -1)]
    T_true = [np.eye(4)]
    for dx, dy in steps:
        T_true.append(T_true[-1] @ _tr(dx, dy, 0))
    N = len(T_true)  # 9 nodes; T_true[-1] == I

    bias = 0.05  # systematic odometry bias along +x per step
    edges, Z = [], []
    T_init = [np.eye(4)]
    for i in range(N - 1):
        edges.append([i, i + 1])
        Zi = np.linalg.inv(T_true[i]) @ T_true[i + 1] @ _tr(bias, 0, 0)
        Z.append(Zi)
        T_init.append(T_init[-1] @ Zi)

    def end_err(T_opt):
        return float(np.linalg.norm(T_opt[-1][:3, 3] - T_true[-1][:3, 3]))

    def run(edges, Z):
        T_opt, _ = pose_graph_optimize(
            jnp.asarray(np.asarray(edges, np.int32)),
            jnp.asarray(np.stack(Z).astype(np.float32)),
            jnp.asarray(np.stack(T_init).astype(np.float32)), N,
            iterations=15)
        return np.asarray(T_opt)

    err_chain = end_err(np.stack(T_init))
    assert err_chain > 0.3  # the chain genuinely drifts (8 * 0.05)
    err_no_closure = end_err(run(edges, Z))

    # Exact closure measurement between first and last node.
    closure_Z = np.linalg.inv(T_true[0]) @ T_true[-1]
    err_with = end_err(run(edges + [[0, N - 1]], Z + [closure_Z]))

    assert err_no_closure > 0.9 * err_chain  # no closure => no correction
    assert err_with * 5 < err_no_closure, (err_with, err_no_closure)


def test_video_loop_closure_corrects_drift(monkeypatch):
    """Driver-level: reconstruct_video's closure edges must be MEASURED
    between the two frames (re-matching), not derived from the drifted
    chain.  With a biased per-step estimator and an exact direct
    measurement, the loop run's end pose snaps back >5x."""
    from reconstruction_tpu.pipeline import video as video_mod

    steps = [(1, 0), (1, 0), (0, 1), (0, 1),
             (-1, 0), (-1, 0), (0, -1), (0, -1)]
    T_true = [np.eye(4)]
    for dx, dy in steps:
        T_true.append(_tr(dx, dy, 0) @ T_true[-1])
    N = len(T_true)
    bias = 0.05

    def fake_estimate(prev_gray, cur_gray, K, Rt, depth_hint):
        i = int(round(float(prev_gray.flat[0])))
        j = int(round(float(cur_gray.flat[0])))
        M = T_true[j] @ np.linalg.inv(T_true[i])
        if abs(j - i) == 1:           # odometry: biased
            return _tr(bias, 0, 0) @ M
        return M                      # direct closure: exact

    monkeypatch.setattr(video_mod, "_estimate_relative_pose", fake_estimate)

    cfg = preset("tiny")
    K = np.eye(3)
    Rt = np.hstack([np.eye(3), np.zeros((3, 1))])

    def loader(i):
        img = np.full((4, 4, 3), float(i), np.float32)
        return [PairInput(image0=img, image1=img,
                          mask0=img[..., 0], mask1=img[..., 0],
                          K0=K, Rt0=Rt, K1=K, Rt1=Rt)]

    class FakeRecon:
        vertices = np.zeros((3, 3))
        faces = np.zeros((1, 3), np.int32)

    fake_reconstruct = lambda c, p: FakeRecon()  # noqa: E731

    def end_err(results):
        return float(np.linalg.norm(results[-1].rig_pose[:3, 3]
                                    - T_true[-1][:3, 3]))

    no_closure = reconstruct_video(cfg, loader, N,
                                   reconstruct_frame=fake_reconstruct,
                                   loop_closure_stride=0)
    with_closure = reconstruct_video(cfg, loader, N,
                                     reconstruct_frame=fake_reconstruct,
                                     loop_closure_stride=N - 1)
    e0, e1 = end_err(no_closure), end_err(with_closure)
    assert e0 > 0.3, e0                  # chain drifts without closure
    assert e1 * 5 < e0, (e1, e0)         # closure snaps it back
