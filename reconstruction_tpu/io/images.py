"""Host-side image loading.

Replaces `cv::imread` (`reconstruction/CStereoMatching.cpp:146,155`).
Images are returned as float32 arrays in the reference's BGR channel order
so downstream color plumbing matches the reference's PLY outputs
(`CStereoMatching.cpp:728`).
"""

from __future__ import annotations

import numpy as np


def imread(path: str, grayscale: bool = False) -> np.ndarray:
    """Load an image as float32 (H, W, 3) BGR or (H, W) grayscale."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PIL is required for image loading") from e
    img = Image.open(path)
    if grayscale:
        return np.asarray(img.convert("L"), np.float32)
    arr = np.asarray(img.convert("RGB"), np.float32)
    return arr[..., ::-1].copy()  # BGR, like cv::imread


def imwrite(path: str, img: np.ndarray) -> None:
    from PIL import Image
    arr = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
    if arr.ndim == 3:
        arr = arr[..., ::-1]  # BGR -> RGB
    Image.fromarray(arr).save(path)
