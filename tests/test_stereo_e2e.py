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


def test_disp_quantizer_roundtrip():
    """Range-adaptive int16 disparity encoding (the per-pair fetch
    payload): NOMATCH survives exactly, values roundtrip within the
    |d|max/32000 step, including large-disparity captures."""
    import jax.numpy as jnp
    from reconstruction_tpu.config import NOMATCH
    from reconstruction_tpu.stereo.pipeline import _quantize_disp
    rng = np.random.default_rng(0)
    for dmax_true in (3.0, 65.0, 900.0):
        d = rng.uniform(-dmax_true, dmax_true, (64, 96)).astype(np.float32)
        d[rng.uniform(size=d.shape) < 0.3] = NOMATCH
        q, dmax = _quantize_disp(jnp.asarray(d))
        q = np.asarray(q)
        dec = np.where(q == -32768, np.float32(NOMATCH),
                       q.astype(np.float32) * (float(dmax) / 32000.0))
        nm = d == NOMATCH
        np.testing.assert_array_equal(dec == NOMATCH, nm)
        step = float(dmax) / 32000.0
        assert np.abs(dec[~nm] - d[~nm]).max() <= 0.51 * step + 1e-7
    # all-NOMATCH map: dmax floors at 1, everything stays NOMATCH
    d = np.full((8, 8), NOMATCH, np.float32)
    q, dmax = _quantize_disp(jnp.asarray(d))
    assert float(dmax) == 1.0
    assert (np.asarray(q) == -32768).all()


def test_fetch_packed_casts():
    """fetch_packed's in-packer u8 casts match the eager to_u8."""
    import jax.numpy as jnp
    from reconstruction_tpu.utils.transfer import fetch_packed
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(-5, 300, (17, 9)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))
    out_a, out_b = fetch_packed([a, b], casts=["u8", None])
    want = np.clip(np.asarray(a), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out_a, want)
    np.testing.assert_allclose(out_b, np.asarray(b))
