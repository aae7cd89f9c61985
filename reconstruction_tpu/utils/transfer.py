"""Batched device->host transfer.

On the tunneled relay every fetch pays ~0.4-0.5 s of fixed latency on
top of ~15-20 MB/s (r3, tools/profile_pair.py) — eight separate
np.asarray calls per stereo pair cost more in latency than in bytes.
fetch_packed bitcasts every array to uint8 on device, concatenates, and
fetches ONE buffer, reconstructing the originals host-side by view.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def fetch_packed(arrays: Sequence) -> List[np.ndarray]:
    """Fetch a list of jax arrays as one device->host transfer.

    Returns numpy arrays with the original shapes/dtypes (bool included).
    Numpy inputs pass through untouched.
    """
    import jax
    import jax.numpy as jnp

    parts, metas = [], []
    for a in arrays:
        if isinstance(a, np.ndarray):
            metas.append(("np", a, None, 0))
            continue
        dt = np.dtype(a.dtype)
        if dt == np.uint8:
            b = a.reshape(-1)
        elif dt == np.bool_:
            b = a.astype(jnp.uint8).reshape(-1)
        else:
            b = jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)
        metas.append(("jax", a.shape, dt, int(b.size)))
        parts.append(b)
    if not parts:
        return [m[1] for m in metas]
    buf = np.asarray(jnp.concatenate(parts))
    out, off = [], 0
    for kind, shape, dt, nbytes in metas:
        if kind == "np":
            out.append(shape)  # the passthrough array itself
            continue
        raw = buf[off:off + nbytes]
        off += nbytes
        if dt == np.bool_:
            out.append(raw.astype(bool).reshape(shape))
        else:
            out.append(np.frombuffer(raw.tobytes(), dtype=dt).reshape(shape))
    return out
