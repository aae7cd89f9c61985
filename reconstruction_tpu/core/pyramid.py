"""Gaussian image pyramids.

Replaces the `cv::pyrDown` chain in `ConstructPyrm`
(`reconstruction/CStereoMatching.cpp:1040-1053`): 5-tap binomial blur
[1,4,6,4,1]/16 (separable), reflect-101 borders, then 2x decimation keeping
even rows/columns.  Levels are ordered coarse->fine like the reference's
`imagePyrm[0..PyrmNum-1]` (level 0 = coarsest).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

_KERNEL = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0  # numpy: no backend init at import


@jax.jit
def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """One pyramid step: blur + 2x decimate.  (H, W) or (H, W, C) float32."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    x = img.astype(jnp.float32)
    # Separable blur with reflect-101 padding (jnp 'reflect' == BORDER_REFLECT_101).
    x = jnp.pad(x, ((2, 2), (0, 0), (0, 0)), mode="reflect")
    x = sum(_KERNEL[i] * x[i : i + img.shape[0]] for i in range(5))
    x = jnp.pad(x, ((0, 0), (2, 2), (0, 0)), mode="reflect")
    x = sum(_KERNEL[i] * x[:, i : i + img.shape[1]] for i in range(5))
    out = x[::2, ::2]
    if squeeze:
        out = out[..., 0]
    return out


def build_pyramid(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """Full pyramid, coarse->fine list of length ``levels``.

    ``img`` is the finest level (index levels-1), exactly like
    `ConstructPyrm` seeding `imagePyrm[PyrmNum-1]` and running `pyrDown`
    down to level 0 (`CStereoMatching.cpp:1045-1051`).
    """
    pyr = [img]
    cur = img
    for _ in range(levels - 1):
        cur = pyr_down(cur)
        pyr.insert(0, cur)
    return pyr


def quantize_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Round to the uint8 grid (value domain stays float32).

    The reference stores pyramid images as uint8 `cv::Mat`s; exact-255 mask
    tests (`CStereoMatching.cpp:200` etc.) rely on integer quantization.
    """
    return jnp.clip(jnp.round(img), 0.0, 255.0)
