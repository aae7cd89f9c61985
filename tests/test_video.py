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
