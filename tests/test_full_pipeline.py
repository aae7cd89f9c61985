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
        isoutput=True,
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
    art = str(tmp_path_factory.mktemp("tmp_artifacts"))
    r = reconstruct(cfg, pairs, output_path=out, artifact_dir=art)
    r.output_path = out
    r.artifact_dir = art
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


def test_texture_uses_both_cameras(recon):
    """`Demo/scans.txt` feeds TWO colored scans per pair into
    TextureStitcher (`CCloudOptimization.cpp:396`); the blend must see
    2 views per live pair with distinct projections and centers, and
    the second view must measurably color vertices the first view's
    mask misses."""
    from reconstruction_tpu.pipeline.reconstruct import texture_cameras
    from reconstruction_tpu.surface.texture import texture_vertices
    from reconstruction_tpu.pipeline.reconstruct import _vertex_normals

    cams = texture_cameras(recon.pair_results)
    assert len(cams) == 2 * len(recon.pair_results)
    for i in range(0, len(cams), 2):
        P0, _, _, c0 = cams[i]
        P1, _, _, c1 = cams[i + 1]
        assert not np.allclose(P0, P1)
        assert not np.allclose(c0, c1)

    # Blank camera-0 masks: the cam1 views alone must reproduce
    # essentially the full blend's coverage (the closed Poisson shell
    # caps absolute coverage, so compare against the all-views number
    # rather than a fixed fraction).
    vnorm = _vertex_normals(recon.vertices, recon.faces)

    def coverage(cam_list):
        col = texture_vertices(recon.vertices, vnorm, cam_list)
        return (np.abs(col - 127.0).max(axis=1) > 1.0).mean()

    cov_all = coverage(cams)
    cams_cam1_only = [(P, img, (np.zeros_like(m) if i % 2 == 0 else m), c)
                      for i, (P, img, m, c) in enumerate(cams)]
    cov_cam1 = coverage(cams_cam1_only)
    assert cov_all > 0.15, cov_all
    assert cov_cam1 > 0.8 * cov_all, (cov_cam1, cov_all)


def test_dedup_production_path():
    """End-to-end run with the `isdelete` dedup stage ON, gated by the
    real eroded rectified masks (`CCloudOptimization.cpp:186-193,217`)
    — r2 wired dummy all-ones masks here.  The mask gate must actually
    reject points (kept < total) while the pipeline still produces a
    textured mesh."""
    import dataclasses
    cfg = preset("tiny").replace(
        pyramid_levels=2,
        lowest_level_size=(80, 60),
        cam_pairs=((0, 1), (2, 3)),
    )
    cfg = cfg.replace(cloud=dataclasses.replace(cfg.cloud, dedup=True))
    cams, imgs, masks = make_stereo_scene(
        image_size=(160, 120), span_deg=24.0, num_cameras=4)
    pairs = []
    for (a, b) in cfg.cam_pairs:
        pairs.append(PairInput(
            image0=imgs[a], image1=imgs[b], mask0=masks[a], mask1=masks[b],
            K0=np.asarray(cams[a].K), Rt0=np.asarray(cams[a].Rt),
            K1=np.asarray(cams[b].K), Rt1=np.asarray(cams[b].Rt)))
    r = reconstruct(cfg, pairs)
    assert len(r.vertices) > 500
    recs = {rec["stage"]: rec for rec in r.stats.records}
    total = sum(recs[f"pair{i}"]["kept_points"] for i in range(2))
    assert 0 < recs["dedup"]["kept"] < total, (recs["dedup"], total)


def test_resume_matches_fresh(tmp_path):
    """Checkpoint-resume parity (VERDICT r3 missing #3): a run restored
    from per-pair checkpoints must produce the SAME mesh as the fresh
    run — including texture (the reference's scans always feed the
    stitcher, `CCloudOptimization.cpp:127-143,396`) and dedup."""
    import dataclasses
    cfg = preset("tiny").replace(
        pyramid_levels=2,
        lowest_level_size=(80, 60),
        cam_pairs=((0, 1), (2, 3)),
    )
    cfg = cfg.replace(cloud=dataclasses.replace(cfg.cloud, dedup=True))
    cams, imgs, masks = make_stereo_scene(
        image_size=(160, 120), span_deg=24.0, num_cameras=4)
    pairs = []
    for (a, b) in cfg.cam_pairs:
        pairs.append(PairInput(
            image0=imgs[a], image1=imgs[b], mask0=masks[a], mask1=masks[b],
            K0=np.asarray(cams[a].K), Rt0=np.asarray(cams[a].Rt),
            K1=np.asarray(cams[b].K), Rt1=np.asarray(cams[b].Rt)))
    ckpt = str(tmp_path / "ckpt")
    fresh = reconstruct(cfg, pairs, checkpoint_dir=ckpt)
    resumed = reconstruct(cfg, pairs, checkpoint_dir=ckpt)
    # every pair restored: both runs consumed identical clouds
    np.testing.assert_array_equal(fresh.vertices, resumed.vertices)
    np.testing.assert_array_equal(fresh.faces, resumed.faces)
    # texture parity — r3's restored pairs fell back to untextured gray
    np.testing.assert_allclose(fresh.colors, resumed.colors,
                               atol=1e-3)
    assert resumed.colors.std() > 10.0  # not the 127-gray fallback
    # dedup parity: the restored run must have RUN dedup (not skipped)
    recs = {rec["stage"]: rec for rec in resumed.stats.records}
    fr = {rec["stage"]: rec for rec in fresh.stats.records}
    assert recs["dedup"]["kept"] == fr["dedup"]["kept"]


def test_per_pair_artifacts(recon):
    """isoutput artifact parity: per-pair filtered cloud `cloud<i>.ply`
    (`CStereoMatching.cpp:723-757`), per-camera recolored scan meshes
    `color_<i>_{0,1}.ply` (`CCloudOptimization.cpp:127-143`), and the
    rectified-image dumps `<pair>_<camID>.jpg` (`CStereoMatching.cpp:
    159-166`).  All must exist, parse, and be nonempty — the scan-mesh
    path is NOT fire-and-forget."""
    import os
    from reconstruction_tpu.io.ply import read_ply

    cam_pairs = ((0, 1), (2, 3))
    for pi, (a, b) in enumerate(cam_pairs):
        cloud = read_ply(os.path.join(recon.artifact_dir, f"cloud{pi}.ply"))
        assert len(cloud.xyz) > 500, (pi, len(cloud.xyz))
        assert cloud.colors is not None
        for side in (0, 1):
            scan = read_ply(os.path.join(recon.artifact_dir,
                                         f"color_{pi}_{side}.ply"))
            assert len(scan.xyz) > 100, (pi, side, len(scan.xyz))
            assert scan.faces is not None and len(scan.faces) > 100
            assert scan.colors is not None and scan.colors.std() > 1.0
        for cam_id in (a, b):
            path = os.path.join(recon.artifact_dir, f"{pi}_{cam_id}.jpg")
            assert os.path.exists(path), path
            assert os.path.getsize(path) > 1000
