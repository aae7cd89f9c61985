"""Feature detection + description for the BA front end.

Harris corners with fixed-capacity top-K + grid NMS (static shapes), and
zero-mean normalized window descriptors reusing the stereo NCC machinery
(`reconstruction_tpu.stereo.ncc`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from reconstruction_tpu.stereo.ncc import shifted, window_descriptors


class Features(NamedTuple):
    xy: jnp.ndarray      # (N, 2) pixel coords (x, y)
    score: jnp.ndarray   # (N,)
    ok: jnp.ndarray      # (N,) valid flags (padding)


def _gauss_blur(x: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    r = max(1, int(3 * sigma))
    k = jnp.exp(-0.5 * (jnp.arange(-r, r + 1) / sigma) ** 2)
    k = k / k.sum()
    out = sum(k[i + r] * shifted(x, 0, i) for i in range(-r, r + 1))
    out = sum(k[i + r] * shifted(out, i, 0) for i in range(-r, r + 1))
    return out


@partial(jax.jit, static_argnames=("max_features", "nms_cell"))
def harris_corners(
    gray: jnp.ndarray,
    valid: jnp.ndarray,
    max_features: int = 1024,
    k: float = 0.04,
    nms_cell: int = 8,
) -> Features:
    """Harris response + per-cell NMS + global top-K (fixed capacity)."""
    H, W = gray.shape
    g = gray.astype(jnp.float32)
    ix = 0.5 * (shifted(g, 0, 1) - shifted(g, 0, -1))
    iy = 0.5 * (shifted(g, 1, 0) - shifted(g, -1, 0))
    sxx = _gauss_blur(ix * ix)
    syy = _gauss_blur(iy * iy)
    sxy = _gauss_blur(ix * iy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    R = det - k * tr * tr
    R = jnp.where(valid, R, -jnp.inf)

    # NMS: keep per-cell argmax only.
    Hc, Wc = H // nms_cell, W // nms_cell
    Rc = R[: Hc * nms_cell, : Wc * nms_cell].reshape(
        Hc, nms_cell, Wc, nms_cell).transpose(0, 2, 1, 3).reshape(
        Hc, Wc, nms_cell * nms_cell)
    best = Rc.max(-1)
    arg = Rc.argmax(-1)
    cy = jnp.arange(Hc)[:, None] * nms_cell + arg // nms_cell
    cx = jnp.arange(Wc)[None, :] * nms_cell + arg % nms_cell

    flat_score = best.reshape(-1)
    flat_x = cx.reshape(-1)
    flat_y = cy.reshape(-1)
    kk = min(max_features, flat_score.shape[0])
    top, idx = jax.lax.top_k(flat_score, kk)
    xy = jnp.stack([flat_x[idx], flat_y[idx]], axis=1).astype(jnp.float32)
    ok = jnp.isfinite(top) & (top > 0)
    n_pad = max_features - kk
    if n_pad:
        xy = jnp.pad(xy, ((0, n_pad), (0, 0)))
        top = jnp.pad(top, (0, n_pad))
        ok = jnp.pad(ok, (0, n_pad))
    return Features(xy=xy, score=top, ok=ok)


@partial(jax.jit, static_argnames=("radius",))
def describe(img: jnp.ndarray, feats: Features, radius: int = 4) -> jnp.ndarray:
    """Normalized window descriptors at feature locations (N, K)."""
    desc_map, _ = window_descriptors(
        img if img.ndim == 3 else img[..., None], radius)
    xi = feats.xy[:, 0].astype(jnp.int32)
    yi = feats.xy[:, 1].astype(jnp.int32)
    return desc_map[jnp.clip(yi, 0, desc_map.shape[0] - 1),
                    jnp.clip(xi, 0, desc_map.shape[1] - 1)]
