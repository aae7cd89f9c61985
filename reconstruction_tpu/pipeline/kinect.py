"""Kinect depth-map -> point-cloud converter.

Replaces `Kinect2Cloud/CKinect2Cloud.cpp:13-82`: per-device intrinsics
(fx, fy, cx, cy), background-depth gating (skip when
bg - depth <= 500 or bg < 100, `:62`), pinhole back-projection (`:64-69`),
rigid transform by the precomputed `R1t_times_R` (`:73`), binary PLY out
(`:74-81`).  The conversion is one jitted map per frame.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reconstruction_tpu.io.opencv_yaml import load_opencv_yaml
from reconstruction_tpu.io.ply import write_ply


@partial(jax.jit, static_argnames=())
def depth_to_points(
    depth: jnp.ndarray,
    background: jnp.ndarray,
    intrinsics: jnp.ndarray,
    bbox: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Back-project a depth map.  Returns ((H*W, 4) homogeneous points,
    (H*W,) validity) — fixed shape, masked."""
    H, W = depth.shape
    fx, fy, cx, cy = (intrinsics[0], intrinsics[1],
                      intrinsics[2], intrinsics[3])
    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    d = depth.astype(jnp.float32)
    bg = background.astype(jnp.float32)
    ok = ((d != 0) & (bg - d > 500) & (bg >= 100)
          & (x >= bbox[0]) & (x < bbox[1])
          & (y >= bbox[2]) & (y < bbox[3]))
    Z = d
    X = (x - cx) * Z / fx
    Y = (y - cy) * Z / fy
    pts = jnp.stack([X, Y, Z, jnp.ones_like(Z)], axis=-1).reshape(-1, 4)
    return pts, ok.reshape(-1)


def kinect_to_cloud(filelist_yml: str) -> None:
    """Full converter driver (`CKinect2Cloud::run`, `:13-46`)."""
    from reconstruction_tpu.io.images import imread
    cfg = load_opencv_yaml(filelist_yml)
    calib = load_opencv_yaml(cfg["kinect_info"])
    bbox = jnp.asarray(np.asarray(cfg["boundingbox"], np.float32))
    for sn in cfg["kinect_sn"]:
        params = jnp.asarray(np.asarray(
            calib[f"DepthCameraIntrinsic-{sn}"], np.float32).ravel())
        R1tR = np.asarray(calib[f"R1t_times_R-{sn}"], np.float64)
        files = cfg[f"imagelist-{sn}"]
        bks = cfg[f"masklist-{sn}"]
        outs = cfg[f"outlist-{sn}"]
        for fdepth, fbk, fout in zip(files, bks, outs):
            depth = imread(fdepth, grayscale=True)
            bk = imread(fbk, grayscale=True)
            pts, ok = depth_to_points(jnp.asarray(depth), jnp.asarray(bk),
                                      params, bbox)
            okn = np.asarray(ok)
            cloud = np.asarray(pts)[okn] @ R1tR  # (N, 4) x (4, ...) -> 3
            write_ply(fout, cloud[:, :3].astype(np.float32))
