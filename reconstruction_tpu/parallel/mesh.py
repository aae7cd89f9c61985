"""Device mesh construction.

The scale-out axes (SURVEY.md section 2 "parallelism strategies"):

  frame — data parallelism over captures/frames (the reference's
          BatchProcess loop, `BatchProcess/main.cpp:74-75`, serialized
          there; here a mesh axis),
  pair  — camera-pair parallelism (the reference processes pairs
          sequentially, `CStereoMatching.cpp:17`; here the primary
          scale-out axis),
  tile  — row/tile parallelism inside one pair with halo exchange (the
          CP/sequence-parallel analogue; reference has OpenMP scanlines).

Collectives ride ICI within a slice; the frame axis is the natural DCN
axis for multi-host jobs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mesh_axes() -> Tuple[str, str, str]:
    return ("frame", "pair", "tile")


def make_mesh(
    devices: Optional[Sequence] = None,
    frame: int = 1,
    pair: Optional[int] = None,
    tile: int = 1,
) -> Mesh:
    """Build a (frame, pair, tile) mesh.  With pair=None, all remaining
    devices go to the pair axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if pair is None:
        assert n % (frame * tile) == 0, (n, frame, tile)
        pair = n // (frame * tile)
    assert frame * pair * tile == n, (frame, pair, tile, n)
    arr = np.asarray(devices).reshape(frame, pair, tile)
    return Mesh(arr, axis_names=mesh_axes())


def pair_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the pair axis."""
    return NamedSharding(mesh, P("pair"))


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the tile axis (row blocks)."""
    return NamedSharding(mesh, P("tile"))
