"""End-to-end stereo milestone test (SURVEY.md section 7, milestone #1):
one rectified pair -> disparity -> world point cloud on a synthetic scene
with analytically known geometry."""

import numpy as np
import pytest

from reconstruction_tpu.config import preset
from reconstruction_tpu.stereo.pipeline import match_pair
from synthetic import make_stereo_scene, point_to_surface_rmse, surface_fn


@pytest.fixture(scope="module")
def pair_result():
    cfg = preset("tiny").replace(
        pyramid_levels=3,
        lowest_level_size=(80, 60),
    )
    cams, imgs, masks = make_stereo_scene(image_size=(320, 240), span_deg=7.0)
    res = match_pair(
        cfg, imgs[0], imgs[1], masks[0], masks[1],
        np.asarray(cams[0].K), np.asarray(cams[0].Rt),
        np.asarray(cams[1].K), np.asarray(cams[1].Rt),
    )
    return res


def test_disparity_coverage(pair_result):
    d = pair_result.disparity
    valid = d != -10000.0
    assert valid.sum() > 5000, f"too few matches: {valid.sum()}"


def test_cloud_geometry_rmse(pair_result):
    """Raw triangulated cloud accuracy.  Outlier matches are expected at
    this stage — the reference removes them in the SOR cloud filter that
    follows (`CCloudOptimization.cpp:82-86`); the full-pipeline test
    checks post-filter RMSE.  Here: the inlier body must be accurate and
    the outlier fraction small."""
    cloud = pair_result.cloud.compact()
    assert len(cloud.xyz) > 5000
    pts = cloud.xyz
    sel = (np.abs(pts[:, 0]) < 1.6) & (np.abs(pts[:, 1]) < 1.6)
    dz = np.abs(pts[sel][:, 2] - surface_fn(pts[sel][:, 0], pts[sel][:, 1]))
    outlier_frac = (dz > 0.15).mean()
    inlier_rmse = np.sqrt((dz[dz <= 0.15] ** 2).mean())
    # scene: 8-unit camera distance, ~0.35-unit relief
    assert outlier_frac < 0.02, f"too many gross outliers: {outlier_frac}"
    assert inlier_rmse < 0.05, f"inlier RMSE too high: {inlier_rmse}"


def test_cloud_covers_surface(pair_result):
    cloud = pair_result.cloud.compact()
    xy = cloud.xyz[:, :2]
    sel = (np.abs(xy[:, 0]) < 1.2) & (np.abs(xy[:, 1]) < 1.2)
    assert sel.sum() > 3000
    span_x = np.ptp(xy[sel][:, 0])
    span_y = np.ptp(xy[sel][:, 1])
    assert span_x > 1.5 and span_y > 1.5
