"""Distributed cloud fusion.

The reference fuses per-pair clouds by accumulating into one global PCL
cloud in-process (`CCloudOptimization.cpp:123`, `*cloud_normals +=
*cloud_normal`).  Pair-sharded execution fuses with collectives:

  * `all_gather_clouds`: pair-sharded padded clouds -> replicated global
    cloud (GSPMD resharding; XLA inserts the all-gather),
  * `distributed_splat`: point-sharded Poisson splatting, `psum` over the
    pair axis — the depth-fusion collective of BASELINE.json's dome
    config ("partitioned camera pairs + distributed depth fusion").
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reconstruction_tpu.stereo.triangulate import PointCloud


def all_gather_clouds(mesh: Mesh, cloud: PointCloud) -> PointCloud:
    """Gather pair-sharded padded clouds into a replicated global cloud.

    Args: cloud fields with leading axis (num_pairs, N, ...) sharded over
    the mesh 'pair' axis.  Returns the flattened (num_pairs*N, ...) cloud
    replicated on every device (XLA lowers the reshard to one
    all-gather over the pair axis).
    """
    shard = NamedSharding(mesh, P("pair"))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def gather(c: PointCloud) -> PointCloud:
        c = jax.lax.with_sharding_constraint(c, shard)
        n = c.xyz.shape[0] * c.xyz.shape[1]
        out = PointCloud(xyz=c.xyz.reshape(n, 3),
                         colors=c.colors.reshape(n, 3),
                         valid=c.valid.reshape(n))
        return jax.lax.with_sharding_constraint(out, rep)

    return gather(cloud)


@partial(jax.jit, static_argnames=("mesh", "resolution"))
def distributed_splat(
    mesh: Mesh,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    valid: jnp.ndarray,
    origin: jnp.ndarray,
    spacing: jnp.ndarray,
    resolution: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Point-sharded Poisson splatting: each shard splats its points into
    a local grid; `psum` over the pair axis yields the global normal
    field + density.  Points have leading axis sharded over 'pair'."""
    from reconstruction_tpu.surface.poisson import _splat3
    axis = "pair"
    R = resolution

    def local(pts, nrm, val):
        pts = pts.reshape(-1, 3)     # local block keeps the sharded axis
        nrm = nrm.reshape(-1, 3)
        val = val.reshape(-1)
        gp = (pts - origin) / spacing
        w = val.astype(jnp.float32)
        V = _splat3(jnp.zeros((R, R, R, 3), jnp.float32), gp, w, nrm)
        D = _splat3(jnp.zeros((R, R, R), jnp.float32), gp, w,
                    jnp.ones_like(w))
        return jax.lax.psum(V, axis), jax.lax.psum(D, axis)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )
    return fn(points, normals, valid)
