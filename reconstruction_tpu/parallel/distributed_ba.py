"""Distributed bundle adjustment: point-sharded Schur reduction.

The north-star distributed-BA recipe (BASELINE.json): points (and their
observations, grouped per point) shard across devices; every shard
assembles its partial reduced camera system; `psum` over the point axis
yields the global Schur complement; the small 6C x 6C solve is
replicated; point back-substitution is shard-local.  One collective pair
(psum of S and b) per GN step.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from reconstruction_tpu.ba.bundle_adjust import BAProblem, ba_blocks


@partial(jax.jit, static_argnames=("mesh", "num_cameras", "fix_gauge"))
def ba_step_sharded(
    mesh: Mesh,
    problem: BAProblem,
    poses: jnp.ndarray,
    points: jnp.ndarray,
    num_cameras: int,
    damping: float = 1e-3,
    huber_delta: float = 2.0,
    fix_gauge: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One GN step with the point axis sharded over mesh axis 'pair'.

    (The pair axis doubles as the generic data axis for BA; on a larger
    mesh the product of axes can be used.)  Returns (poses', points',
    cost) with points sharded as input.
    """
    C = num_cameras
    axis = "pair"

    def local(prob_shard: BAProblem, poses_rep, points_shard):
        from reconstruction_tpu.ba.bundle_adjust import _sym3_inv_comps
        S, b, hpp, b_p, W_t, cost = ba_blocks(prob_shard, poses_rep,
                                              points_shard, C, huber_delta)
        S = jax.lax.psum(S, axis)
        b = jax.lax.psum(b, axis)
        cost = jax.lax.psum(cost, axis)
        S = S + damping * jnp.eye(C * 6)
        if fix_gauge:
            mask = jnp.arange(C * 6) >= 6
            S = jnp.where(mask[:, None] & mask[None, :], S, 0.0)
            S = S + jnp.diag(jnp.where(mask, 0.0, 1.0))
            b = jnp.where(mask, b, 0.0)
        dc = jnp.linalg.solve(S, b).reshape(C, 6)
        # shard-local back-substitution in component form (see ba_step)
        rhs = []
        for k in range(3):
            Wk = W_t[np.asarray([i * 3 + k for i in range(6)])]       # (6, C, Mloc)
            rhs.append(b_p[k] - (Wk * dc.T[:, :, None]).sum((0, 1)))
        Hinv = _sym3_inv_comps(hpp)
        dp = jnp.stack([Hinv[3 * i] * rhs[0] + Hinv[3 * i + 1] * rhs[1]
                        + Hinv[3 * i + 2] * rhs[2] for i in range(3)],
                       axis=1)
        return poses_rep + dc, points_shard + dp, cost

    shard = P(axis)
    rep = P()
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(BAProblem(K=rep, Rt0=rep, points0=shard, obs_uv=shard,
                            obs_cam=shard, obs_ok=shard),
                  rep, shard),
        out_specs=(rep, shard, rep),
    )
    return fn(problem, poses, points)
