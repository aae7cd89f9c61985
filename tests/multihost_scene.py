"""Shared per-frame take used by both the multihost worker processes and
the sequential reference run in test_multihost.py — one tiny stereo
level per frame, deterministic in the frame index."""

import numpy as np
import jax.numpy as jnp


def frame_take(frame: int) -> np.ndarray:
    """Match one tiny stereo level for this frame; returns disparity."""
    from reconstruction_tpu.stereo.pipeline import match_one_level

    rng = np.random.default_rng(1000 + frame)
    H, W = 28, 36
    imgL = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    shift = 2 + frame
    imgR = np.roll(imgL, -shift, axis=1)
    mask = np.zeros((H, W), np.float32)
    mask[4:-4, 4:-4] = 255.0
    state = match_one_level(
        jnp.asarray(imgL), jnp.asarray(imgR),
        jnp.asarray(mask), jnp.asarray(mask), None, 0,
        radius=2, offset=2, ws=0.03, refine_iters=3)
    return np.asarray(state.disp0)
