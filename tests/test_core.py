"""Core layer tests: camera, rectification (vs OpenCV oracle), remap,
pyramid, morphology, PLY and OpenCV-YAML I/O."""

import numpy as np
import jax.numpy as jnp
import pytest

from reconstruction_tpu.config import preset
from reconstruction_tpu.core.camera import (
    Camera, make_camera, relative_pose, synthetic_rig)
from reconstruction_tpu.core.rectify import (
    rodrigues_mat, rodrigues_vec, stereo_rectify, rectify_pair)
from reconstruction_tpu.core.remap import rectify_map, remap_bilinear
from reconstruction_tpu.core.pyramid import pyr_down, build_pyramid
from reconstruction_tpu.core.morphology import ellipse_kernel, erode_mask
from reconstruction_tpu.io.ply import read_ply, write_ply
from reconstruction_tpu.io.opencv_yaml import load_opencv_yaml, save_opencv_yaml

cv2 = pytest.importorskip("cv2")


def test_rodrigues_roundtrip(rng):
    for _ in range(20):
        w = rng.normal(size=3)
        R = rodrigues_mat(w)
        Rcv, _ = cv2.Rodrigues(w)
        np.testing.assert_allclose(R, Rcv, atol=1e-10)
        w2 = rodrigues_vec(R)
        np.testing.assert_allclose(rodrigues_mat(w2), R, atol=1e-9)


def test_camera_center_and_projection(rng):
    cams = synthetic_rig(3)
    c = cams[0]
    # center projects to principal-ish point; x_cam of center is 0
    ctr = np.asarray(c.center)
    x_cam = np.asarray(c.R) @ ctr + np.asarray(c.t)
    np.testing.assert_allclose(x_cam, 0.0, atol=1e-5)
    # project a point on the optical axis
    pts = jnp.asarray(ctr + np.asarray(c.R)[2] * 5.0)[None]
    uv = np.asarray(c.project(pts))[0]
    np.testing.assert_allclose(uv, [320.0, 240.0], atol=1e-3)


def test_stereo_rectify_matches_opencv(rng):
    cams = synthetic_rig(2, span_deg=12)
    R, T = relative_pose(cams[0], cams[1])
    R, T = np.asarray(R, np.float64), np.asarray(T, np.float64)
    K0 = np.asarray(cams[0].K, np.float64)
    K1 = np.asarray(cams[1].K, np.float64)
    size = (640, 480)
    d = np.zeros(4)
    R1cv, R2cv, P1cv, P2cv, Qcv, _, _ = cv2.stereoRectify(
        K0, d, K1, d, size, R, T.reshape(3, 1), flags=0, alpha=-1,
        newImageSize=size)
    R1, R2, P1, P2, Q, idx = stereo_rectify(K0, K1, size, R, T)
    np.testing.assert_allclose(R1, R1cv, atol=1e-8)
    np.testing.assert_allclose(R2, R2cv, atol=1e-8)
    np.testing.assert_allclose(P1, P1cv, atol=1e-6)
    np.testing.assert_allclose(P2, P2cv, atol=1e-6)
    np.testing.assert_allclose(Q, Qcv, atol=1e-6)


def test_rectify_pair_epipolar_alignment(rng):
    """Corresponding rectified pixels of any 3D point share a row."""
    cams = synthetic_rig(2, span_deg=15)
    res = rectify_pair(np.asarray(cams[0].K), np.asarray(cams[0].Rt),
                       np.asarray(cams[1].K), np.asarray(cams[1].Rt),
                       (640, 480), (640, 480))
    pts = rng.normal(scale=1.5, size=(50, 3))
    for P, cam, Rr in ((res.P1, cams[0], res.R1), (res.P2, cams[1], res.R2)):
        pass
    # project world points into each rectified view:
    # x_rect = P_k [R_rect_k (R_k X + t_k); 1]  for P with zero translation
    def rect_proj(P, Rrect, cam):
        # rectified view pixel = K_new @ (R_rect @ x_cam); the baseline
        # lives in x_cam for view 2 (P2's 4th column is for points given
        # in rectified-cam-1 coordinates, not used here)
        xc = (np.asarray(cam.R, np.float64) @ pts.T).T + np.asarray(cam.t, np.float64)
        xr = (Rrect @ xc.T).T
        uv = (P[:, :3] @ xr.T).T
        return uv[:, :2] / uv[:, 2:3]

    uv0 = rect_proj(res.P1, res.R1, cams[0])
    uv1 = rect_proj(res.P2, res.R2, cams[1])
    np.testing.assert_allclose(uv0[:, 1], uv1[:, 1], atol=1e-6)


def test_rectify_triangulate_roundtrip(rng):
    """Q-based reprojection with the reference's sign conventions recovers
    world points: checks R_final/T_final + flipped Q together."""
    cams = synthetic_rig(2, span_deg=15)
    res = rectify_pair(np.asarray(cams[0].K), np.asarray(cams[0].Rt),
                       np.asarray(cams[1].K), np.asarray(cams[1].Rt),
                       (640, 480), (640, 480))
    pts = rng.normal(scale=1.0, size=(30, 3))

    def rect_proj(P, Rrect, cam):
        # rectified view pixel = K_new @ (R_rect @ x_cam); the baseline
        # lives in x_cam for view 2 (P2's 4th column is for points given
        # in rectified-cam-1 coordinates, not used here)
        xc = (np.asarray(cam.R, np.float64) @ pts.T).T + np.asarray(cam.t, np.float64)
        xr = (Rrect @ xc.T).T
        uv = (P[:, :3] @ xr.T).T
        return uv[:, :2] / uv[:, 2:3]

    uv0 = rect_proj(res.P1, res.R1, cams[0])
    uv1 = rect_proj(res.P2, res.R2, cams[1])
    disparity = uv1[:, 0] - uv0[:, 0]  # reference convention d = x_r - x_l

    # Reference triangulation (`CStereoMatching.cpp:745-749`):
    q = res.Q
    iW = 1.0 / (q[3, 3] + q[3, 2] * disparity)
    X = (q[0, 3] + uv0[:, 0]) * iW
    Y = (uv0[:, 1] + q[1, 3]) * iW
    Z = q[2, 3] * iW
    F = np.stack([X, Y, Z], axis=1)
    world = (res.R_final @ F.T).T + res.T_final
    np.testing.assert_allclose(world, pts, atol=1e-5)


def test_remap_matches_opencv(rng):
    cams = synthetic_rig(2, span_deg=10)
    res = rectify_pair(np.asarray(cams[0].K), np.asarray(cams[0].Rt),
                       np.asarray(cams[1].K), np.asarray(cams[1].Rt),
                       (320, 240), (320, 240))
    img = rng.uniform(0, 255, size=(240, 320, 3)).astype(np.float32)
    mx, my = rectify_map(np.asarray(cams[0].K), res.R1, res.P1, (320, 240))
    mxcv, mycv = cv2.initUndistortRectifyMap(
        np.asarray(cams[0].K, np.float64), np.zeros(4), res.R1,
        res.P1, (320, 240), cv2.CV_32FC1)
    np.testing.assert_allclose(mx, mxcv, atol=2e-2)
    np.testing.assert_allclose(my, mycv, atol=2e-2)
    ours = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    ref = cv2.remap(img, mxcv, mycv, cv2.INTER_LINEAR)
    inner = (my > 1) & (my < 238) & (mx > 1) & (mx < 318)
    np.testing.assert_allclose(ours[inner], ref[inner], atol=0.75)


def test_pyr_down_matches_opencv(rng):
    img = rng.uniform(0, 255, size=(64, 96)).astype(np.float32)
    ours = np.asarray(pyr_down(jnp.asarray(img)))
    ref = cv2.pyrDown(img)
    np.testing.assert_allclose(ours, ref, atol=1e-3)
    # color
    img3 = rng.uniform(0, 255, size=(64, 96, 3)).astype(np.float32)
    ours3 = np.asarray(pyr_down(jnp.asarray(img3)))
    ref3 = cv2.pyrDown(img3)
    np.testing.assert_allclose(ours3, ref3, atol=1e-3)


def test_build_pyramid_shapes():
    img = jnp.zeros((240, 160, 3))
    pyr = build_pyramid(img, 4)
    assert len(pyr) == 4
    assert pyr[3].shape == (240, 160, 3)
    assert pyr[0].shape == (30, 20, 3)


def test_ellipse_kernel_matches_opencv():
    for size in [(3, 3), (5, 5), (24, 24), (7, 9)]:
        ours = ellipse_kernel(size[0], size[1])
        ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, size)
        np.testing.assert_array_equal(ours, ref.astype(np.float32))


def test_erode_matches_opencv(rng):
    mask = (rng.uniform(size=(60, 80)) > 0.3).astype(np.uint8) * 255
    for k in (3, 5, 9):
        ours = np.asarray(erode_mask(jnp.asarray(mask.astype(np.float32)), k))
        se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        ref = cv2.erode(mask, se)
        np.testing.assert_array_equal(ours.astype(np.uint8), ref)


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    col = rng.integers(0, 256, size=(100, 3)).astype(np.uint8)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "t.ply")
    write_ply(p, xyz, colors=col, normals=nrm)
    data = read_ply(p)
    np.testing.assert_allclose(data.xyz, xyz, atol=1e-6)
    np.testing.assert_array_equal(data.colors, col)
    np.testing.assert_allclose(data.normals, nrm, atol=1e-6)
    # reference BGR order files
    p2 = str(tmp_path / "t2.ply")
    write_ply(p2, xyz, colors=col, color_order="bgr")
    d2 = read_ply(p2)
    np.testing.assert_array_equal(d2.colors, col)
    # mesh + ascii
    faces = rng.integers(0, 100, size=(40, 3)).astype(np.int32)
    p3 = str(tmp_path / "t3.ply")
    write_ply(p3, xyz, faces=faces, binary=False)
    d3 = read_ply(p3)
    np.testing.assert_array_equal(d3.faces, faces)
    np.testing.assert_allclose(d3.xyz, xyz, atol=1e-5)


def test_opencv_yaml_roundtrip(tmp_path):
    calib = {
        "intrinsic-0": np.array([[800.0, 0, 320], [0, 800, 240], [0, 0, 1]]),
        "extrinsic-0": np.hstack([np.eye(3), np.zeros((3, 1))]),
        "imagelist": ["a.jpg", "b.jpg"],
        "PyrmNum": 4,
        "filepath": "/data/in",
    }
    p = str(tmp_path / "c.yml")
    save_opencv_yaml(p, calib)
    out = load_opencv_yaml(p)
    np.testing.assert_allclose(out["intrinsic-0"], calib["intrinsic-0"])
    assert out["PyrmNum"] == 4
    assert out["imagelist"] == ["a.jpg", "b.jpg"]


def test_opencv_yaml_reads_filestorage_output(tmp_path):
    """Files written by cv::FileStorage itself parse correctly."""
    p = str(tmp_path / "fs.yml")
    fs = cv2.FileStorage(p, cv2.FILE_STORAGE_WRITE)
    fs.write("PyrmNum", 4)
    fs.write("intrinsic-3", np.array([[1.0, 2, 3], [4, 5, 6], [7, 8, 9]]))
    fs.write("filepath", "somewhere")
    fs.release()
    out = load_opencv_yaml(p)
    assert out["PyrmNum"] == 4
    assert out["filepath"] == "somewhere"
    np.testing.assert_allclose(
        out["intrinsic-3"], np.arange(1.0, 10.0).reshape(3, 3))


def test_config_presets():
    cfg = preset("myself")
    assert cfg.finest_size == (1280, 1920)
    assert cfg.refine_iterations(3) == 120
    assert cfg.num_pairs == 4
    eth = preset("ETH")
    assert eth.cloud.sor_std_thresh == 0.5


def test_erode_host_twin_matches_device():
    """erode_mask_np / pack+unpack round trip == the device conv-erode,
    including EVEN structuring-element sizes (asymmetric anchor)."""
    import jax.numpy as jnp
    from reconstruction_tpu.core.morphology import (
        erode_mask, erode_mask_np, pack_mask_bits, unpack_mask_bits)
    rng = np.random.default_rng(5)
    for (H, W, se) in [(60, 77, 3), (64, 80, 24), (50, 41, 8)]:
        m = (rng.uniform(size=(H, W)) > 0.3).astype(np.float32) * 255.0
        m[10:30, 5:30] = 255.0
        dev = np.asarray(erode_mask(jnp.asarray(m), se))
        host = erode_mask_np(m, se)
        np.testing.assert_array_equal(dev == 255.0, host)
        up = np.asarray(unpack_mask_bits(
            jnp.asarray(pack_mask_bits(host)), W))
        np.testing.assert_array_equal(up, host.astype(np.float32) * 255.0)
