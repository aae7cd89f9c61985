"""Per-frame video reconstruction with a temporal pose graph.

North-star configs[4] (BASELINE.json): "64-view video sequence ...
per-frame reconstruction with temporal pose-graph + distributed BA".
Driver shape: per frame, run the rig reconstruction (frames are the
`frame` mesh axis for multi-host scale-out); track features
frame-to-frame on an anchor camera to estimate relative rig motion
(useful for handheld/unsynchronized rigs); optimize the frame-pose chain
with loop closures via the pose graph; emit per-frame meshes in a common
temporal frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from reconstruction_tpu.ba.features import describe, harris_corners
from reconstruction_tpu.ba.tracks import match_descriptors, _triangulate_midpoint
from reconstruction_tpu.ba.pose_graph import pose_graph_optimize
from reconstruction_tpu.config import ReconstructionConfig
from reconstruction_tpu.utils.logging import get_logger

log = get_logger(__name__)


@dataclass
class FrameResult:
    index: int
    mesh_vertices: np.ndarray
    mesh_faces: np.ndarray
    rig_pose: np.ndarray  # 4x4 frame -> world


def _estimate_relative_pose(
    prev_gray: np.ndarray,
    cur_gray: np.ndarray,
    K: np.ndarray,
    Rt: np.ndarray,
    depth_hint: float,
) -> np.ndarray:
    """Coarse frame-to-frame rig motion from anchor-camera feature flow.

    Approximates small inter-frame motion as a rigid transform fitted to
    back-projected matched features at the scene depth."""
    pg = jnp.asarray(prev_gray)
    cg = jnp.asarray(cur_gray)
    ones = jnp.ones(pg.shape, bool)
    f0 = harris_corners(pg, ones, max_features=256)
    f1 = harris_corners(cg, ones, max_features=256)
    d0 = describe(pg, f0, radius=4)
    d1 = describe(cg, f1, radius=4)
    m = np.asarray(match_descriptors(d0, f0.ok, d1, f1.ok, 0.8))
    xy0 = np.asarray(f0.xy)
    xy1 = np.asarray(f1.xy)
    src, dst = [], []
    R, t = np.asarray(Rt)[:, :3], np.asarray(Rt)[:, 3]
    Kinv = np.linalg.inv(np.asarray(K))
    C = -R.T @ t
    for i, j in enumerate(m):
        if j < 0:
            continue
        for xy, acc in ((xy0[i], src), (xy1[int(j)], dst)):
            ray = R.T @ Kinv @ np.array([xy[0], xy[1], 1.0])
            acc.append(C + ray / np.linalg.norm(ray) * depth_hint)
    if len(src) < 4:
        return np.eye(4)
    src = np.asarray(src)
    dst = np.asarray(dst)
    # Umeyama (rotation + translation, no scale)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    H = (src - mu_s).T @ (dst - mu_d)
    U, _, Vt = np.linalg.svd(H)
    S = np.diag([1, 1, np.sign(np.linalg.det(Vt.T @ U.T))])
    Rrel = Vt.T @ S @ U.T
    trel = mu_d - Rrel @ mu_s
    T = np.eye(4)
    T[:3, :3] = Rrel
    T[:3, 3] = trel
    return T


def reconstruct_video(
    cfg: ReconstructionConfig,
    frame_loader: Callable[[int], Sequence],
    num_frames: int,
    reconstruct_frame: Optional[Callable] = None,
    anchor_cam: int = 0,
    depth_hint: float = 10.0,
    loop_closure_stride: int = 0,
) -> List[FrameResult]:
    """Sequence driver.

    frame_loader(i) returns the PairInput list of frame i;
    reconstruct_frame(cfg, pairs) defaults to pipeline.reconstruct.
    """
    if reconstruct_frame is None:
        from reconstruction_tpu.pipeline.reconstruct import reconstruct as _r
        reconstruct_frame = lambda c, p: _r(c, p)  # noqa: E731

    results: List[FrameResult] = []
    rel: List[np.ndarray] = []
    anchors: List[np.ndarray] = []
    meshes = []
    K = Rt = None
    for fi in range(num_frames):
        pairs = frame_loader(fi)
        anchor_img = pairs[0].image0.mean(-1)
        K = pairs[0].K0
        Rt = pairs[0].Rt0
        if anchors:
            rel.append(_estimate_relative_pose(
                anchors[-1], anchor_img, K, Rt, depth_hint))
        anchors.append(anchor_img)
        log.info("video frame %d/%d", fi + 1, num_frames)
        r = reconstruct_frame(cfg, pairs)
        meshes.append((r.vertices, r.faces))

    # Pose-graph over the frame chain (+ optional loop closures).
    N = num_frames
    T_init = [np.eye(4)]
    for Trel in rel:
        T_init.append(Trel @ T_init[-1])
    edges, Z = [], []
    for i in range(N - 1):
        edges.append([i, i + 1])
        Z.append(np.linalg.inv(T_init[i]) @ T_init[i + 1])
    if loop_closure_stride:
        # Loop closures are INDEPENDENT measurements: re-match features
        # between the two anchor frames directly (a closure derived from
        # the integrated chain would carry no new information and could
        # never correct drift).  M is the measured i->j rig motion in the
        # same convention as the per-step estimates (T_j ~ M @ T_i), so
        # the edge measurement mirrors the consecutive-edge construction.
        for i in range(0, N - loop_closure_stride, loop_closure_stride):
            j = i + loop_closure_stride
            M = _estimate_relative_pose(anchors[i], anchors[j], K, Rt,
                                        depth_hint)
            edges.append([i, j])
            Z.append(np.linalg.inv(T_init[i]) @ M @ T_init[i])
    if len(edges) >= 1 and N >= 2:
        T_opt, _ = pose_graph_optimize(
            jnp.asarray(np.asarray(edges, np.int32)),
            jnp.asarray(np.stack(Z).astype(np.float32)),
            jnp.asarray(np.stack(T_init).astype(np.float32)), N,
            iterations=10)
        T_opt = np.asarray(T_opt)
    else:
        T_opt = np.stack(T_init)

    for fi, (v, f) in enumerate(meshes):
        results.append(FrameResult(index=fi, mesh_vertices=v, mesh_faces=f,
                                   rig_pose=T_opt[fi]))
    return results
