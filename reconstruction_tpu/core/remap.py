"""Rectification remap: map computation (host) + bilinear gather (device).

Replaces `cv::initUndistortRectifyMap` + `cv::remap(CV_INTER_LINEAR)`
(`reconstruction/CStereoMatching.cpp:144-156`).  Distortion is zero in the
reference (`CStereoMatching.cpp:127`), so the map is a pure projective warp:

    [x, y, w]^T = (A' R)^{-1} [u, v, 1]^T,   src = K [x/w, y/w, 1]^T
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rectify_map(
    K: np.ndarray,
    R_rect: np.ndarray,
    P_new: np.ndarray,
    out_size: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Compute the dst->src sampling map for one camera.

    Args:
      K: original 3x3 intrinsics.
      R_rect: rectifying rotation for this camera.
      P_new: new projection (3x4 or 3x3); only the left 3x3 block is used,
        matching `initUndistortRectifyMap` fed with a scaled P
        (`CStereoMatching.cpp:143-144`).
      out_size: (width, height) of the rectified output.

    Returns:
      (map_x, map_y) float32 arrays of shape (height, width): source pixel
      coordinates in the original image for every rectified pixel.
    """
    K = np.asarray(K, np.float64)
    A = np.asarray(P_new, np.float64)[:, :3]
    M_inv = np.linalg.inv(A @ np.asarray(R_rect, np.float64))
    w, h = out_size
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    ones = np.ones_like(u)
    xyw = np.einsum("ij,jhw->ihw", M_inv, np.stack([u, v, ones]))
    x = xyw[0] / xyw[2]
    y = xyw[1] / xyw[2]
    map_x = K[0, 0] * x + K[0, 1] * y + K[0, 2]
    map_y = K[1, 1] * y + K[1, 2]
    return map_x.astype(np.float32), map_y.astype(np.float32)


@partial(jax.jit, static_argnames=("fill",))
def remap_bilinear(img: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray,
                   fill: float = 0.0) -> jnp.ndarray:
    """Bilinear sampling of ``img`` at (map_x, map_y), out-of-bounds -> fill.

    Matches `cv::remap` with `CV_INTER_LINEAR` + `BORDER_CONSTANT(0)`.

    Args:
      img: (H, W) or (H, W, C) float or uint8 array.
      map_x, map_y: (Ho, Wo) source coordinates.
    """
    H, W = img.shape[0], img.shape[1]
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    imgf = img.astype(jnp.float32)

    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = (map_x - x0)[..., None]
    fy = (map_y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        vals = imgf[yc, xc]
        return jnp.where(valid[..., None], vals, fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    if squeeze:
        out = out[..., 0]
    return out
