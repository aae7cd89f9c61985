"""Binary morphology on masks.

Replaces `cv::getStructuringElement(MORPH_ELLIPSE)` + `cv::erode`
(`reconstruction/CStereoMatching.cpp:157-158,704-705`).  Erosion with an
arbitrary binary structuring element is expressed as a single XLA
convolution (MXU-friendly): a pixel survives iff no invalid pixel falls
under the SE footprint.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def ellipse_kernel(width: int, height: int) -> np.ndarray:
    """OpenCV-compatible ellipse structuring element
    (cv::getStructuringElement(MORPH_ELLIPSE, Size(width, height)))."""
    r, c = height // 2, width // 2
    inv_r2 = 1.0 / (r * r) if r else 0.0
    se = np.zeros((height, width), np.float32)
    for i in range(height):
        dy = i - r
        if abs(dy) <= r:
            dx = int(round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, width)
            se[i, j1:j2] = 1.0
    return se


@partial(jax.jit, static_argnames=("se_w", "se_h"))
def _erode(valid: jnp.ndarray, se_w: int, se_h: int) -> jnp.ndarray:
    se = jnp.asarray(ellipse_kernel(se_w, se_h))
    inv = 1.0 - valid.astype(jnp.float32)
    # Outside the image counts as valid (OpenCV erode's default border
    # value is +inf for min-filter semantics): pad the invalid-indicator
    # with zeros.
    hits = jax.lax.conv_general_dilated(
        inv[None, None],
        se[None, None],
        window_strides=(1, 1),
        padding=((se_h // 2, se_h - 1 - se_h // 2),
                 (se_w // 2, se_w - 1 - se_w // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return hits < 0.5


def erode_mask(mask: jnp.ndarray, se_size: int, threshold: float = 254.5) -> jnp.ndarray:
    """Erode a [0,255] mask with an ellipse SE of diameter ``se_size``.

    Returns a float32 mask that is exactly 255.0 where every SE-covered
    pixel was >= threshold (the reference tests masks with `== 255`,
    `CStereoMatching.cpp:200`), else 0.0.
    """
    valid = mask >= threshold
    out = _erode(valid, se_size, se_size)
    return out.astype(jnp.float32) * 255.0


def valid_mask(mask: jnp.ndarray, threshold: float = 254.5) -> jnp.ndarray:
    """Boolean validity from a [0,255] mask (reference: `mask == 255`)."""
    return mask >= threshold
