"""Full pipeline integration: synthetic 4-camera rig (2 pairs) -> fused
cloud -> Poisson mesh -> textured output (SURVEY.md milestone #2 scaled
down to test size)."""

import numpy as np
import pytest

from reconstruction_tpu.config import preset
from reconstruction_tpu.pipeline.reconstruct import (
    PairInput, Reconstruction, reconstruct)
from synthetic import make_stereo_scene, surface_fn


@pytest.fixture(scope="module")
def recon(tmp_path_factory):
    cfg = preset("tiny").replace(
        pyramid_levels=3,
        lowest_level_size=(80, 60),
        cam_pairs=((0, 1), (2, 3)),
    )
    cams, imgs, masks = make_stereo_scene(
        image_size=(320, 240), span_deg=24.0, num_cameras=4)
    pairs = []
    for (a, b) in cfg.cam_pairs:
        pairs.append(PairInput(
            image0=imgs[a], image1=imgs[b], mask0=masks[a], mask1=masks[b],
            K0=np.asarray(cams[a].K), Rt0=np.asarray(cams[a].Rt),
            K1=np.asarray(cams[b].K), Rt1=np.asarray(cams[b].Rt)))
    out = str(tmp_path_factory.mktemp("out") / "mesh.ply")
    r = reconstruct(cfg, pairs, output_path=out)
    r.output_path = out
    return r


def test_mesh_nonempty(recon):
    assert len(recon.vertices) > 2000
    assert len(recon.faces) > 4000
    assert np.isfinite(recon.vertices).all()


def test_mesh_geometry(recon):
    v = recon.vertices
    sel = (np.abs(v[:, 0]) < 1.3) & (np.abs(v[:, 1]) < 1.3)
    assert sel.sum() > 1000
    dz = v[sel][:, 2] - surface_fn(v[sel][:, 0], v[sel][:, 1])
    rmse = float(np.sqrt((dz ** 2).mean()))
    # mesh-level accuracy after filtering+Poisson; 8-unit depth scene
    assert rmse < 0.06, f"mesh RMSE {rmse}"


def test_mesh_textured(recon):
    c = recon.colors
    assert c.shape == (len(recon.vertices), 3)
    # textured vertices should not be uniformly gray
    assert c.std() > 10.0


def test_output_ply_readable(recon):
    from reconstruction_tpu.io.ply import read_ply
    data = read_ply(recon.output_path)
    assert len(data.xyz) == len(recon.vertices)
    assert data.faces is not None and len(data.faces) == len(recon.faces)
