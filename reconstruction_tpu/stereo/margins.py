"""Mask bounding-box margins.

Replaces `CStereoMatching::FindMargin` (`CStereoMatching.cpp:1011-1038`):
the bounding box of valid mask pixels over the interior band
[radius, size-radius), used to clamp candidate search intervals.  Margins
are data-dependent *values* (traced scalars), never shapes — every kernel
processes the full fixed-shape grid and gates on masks, so jit sees static
shapes (SURVEY.md section 7 hard part (e)).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Margins(NamedTuple):
    """Valid-region bounding box, inclusive (reference `Boundary` struct,
    `CManageData.h:10-14`)."""

    YL: jnp.ndarray
    YR: jnp.ndarray
    XL: jnp.ndarray
    XR: jnp.ndarray


@partial(jax.jit, static_argnames=("radius",))
def find_margin(valid: jnp.ndarray, radius: int) -> Margins:
    """Bounding box of valid pixels in the interior band.

    Args:
      valid: (H, W) boolean mask.
      radius: matching block radius (band inset).

    Returns Margins of int32 scalars.  For an empty mask the reference's
    degenerate initial values are returned (YL > YR), which downstream
    stages treat as "no valid region".
    """
    H, W = valid.shape
    band = jnp.zeros_like(valid)
    band = band.at[radius : H - radius, radius : W - radius].set(
        valid[radius : H - radius, radius : W - radius]
    )
    rows = band.any(axis=1)
    cols = band.any(axis=0)
    ridx = jnp.arange(H, dtype=jnp.int32)
    cidx = jnp.arange(W, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    YL = jnp.min(jnp.where(rows, ridx, big))
    YR = jnp.max(jnp.where(rows, ridx, -big))
    XL = jnp.min(jnp.where(cols, cidx, big))
    XR = jnp.max(jnp.where(cols, cidx, -big))
    empty = ~rows.any()
    # Reference degenerate init (`CStereoMatching.cpp:1014-1017`).
    YL = jnp.where(empty, jnp.int32(H - 1 - radius), YL)
    YR = jnp.where(empty, jnp.int32(radius), YR)
    XL = jnp.where(empty, jnp.int32(W - 1 - radius), XL)
    XR = jnp.where(empty, jnp.int32(radius), XR)
    return Margins(YL=YL, YR=YR, XL=XL, XR=XR)


def inner_box(m: Margins, H: int, W: int, inset: int = 0) -> jnp.ndarray:
    """(H, W) boolean: inside [YL+inset..YR-inset] x [XL+inset..XR-inset]."""
    y = jnp.arange(H, dtype=jnp.int32)[:, None]
    x = jnp.arange(W, dtype=jnp.int32)[None, :]
    return ((y >= m.YL + inset) & (y <= m.YR - inset)
            & (x >= m.XL + inset) & (x <= m.XR - inset))
