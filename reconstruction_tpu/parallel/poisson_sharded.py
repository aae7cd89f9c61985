"""Z-block-sharded screened-Poisson multigrid.

The single-chip solver (surface/poisson.py) is spectral — one global
FFT, which is undesirable across chips.  For distributed operation the
multigrid V-cycle runs with the grid sharded along the leading z axis
over the mesh `tile` axis; every 7-point stencil application exchanges
one boundary PLANE with each z-neighbor via `ppermute` — the same
halo-exchange pattern as the tiled refinement (parallel/sharded.py),
scaled from rows to planes.  Restriction is halo-free (full-weighting
averages 2x2x2 children, never crossing a shard boundary when the local
extent is even); prolongation needs the +-1 coarse plane, i.e. one halo
exchange per level.

At 512^3 (the reference's octree depth-9 effective resolution,
`Demo/mesh.bat:1`) a single f32 field is 512 MB; z-sharding over 4-8
chips keeps every per-chip block plus its pipeline temporaries in HBM
comfortably, and all collectives are nearest-neighbor ICI traffic.

Verified == the dense V-cycle (surface/poisson._vcycle) on the 8-device
CPU mesh in tests/test_parallel.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_AXIS = "tile"


def _halo_z(x: jnp.ndarray) -> jnp.ndarray:
    """Append one plane of halo on each z side of the local block.

    Wraparound shards receive zeros (the dense solver's `_shift3` also
    zero-pads the global boundary)."""
    n = jax.lax.axis_size(_AXIS)
    idx = jax.lax.axis_index(_AXIS)
    up = jax.lax.ppermute(x[-1:], _AXIS, [(i, (i + 1) % n) for i in range(n)])
    dn = jax.lax.ppermute(x[:1], _AXIS, [(i, (i - 1) % n) for i in range(n)])
    up = jnp.where(idx == 0, 0.0, up)
    dn = jnp.where(idx == n - 1, 0.0, dn)
    return jnp.concatenate([up, x, dn], axis=0)


def _shift_xy(a: jnp.ndarray, axis: int, d: int) -> jnp.ndarray:
    """Zero-padded shift along a local (non-sharded) axis."""
    pads = [(0, 0)] * 3
    pads[axis] = (max(-d, 0), max(d, 0))
    ap = jnp.pad(a, pads)
    sl = [slice(None)] * 3
    start = max(d, 0)
    sl[axis] = slice(start, start + a.shape[axis])
    return ap[tuple(sl)]


def _neighbor_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of the six face neighbors, z via halo exchange."""
    xh = _halo_z(x)
    nb = xh[:-2] + xh[2:]
    for ax in (1, 2):
        nb = nb + _shift_xy(x, ax, 1) + _shift_xy(x, ax, -1)
    return nb


def _jacobi_sharded(x, f, screen, n_iter):
    omega = 2.0 / 3.0
    diag = -6.0 - screen

    def body(_, x):
        x_new = (f - _neighbor_sum(x)) / diag
        return x + omega * (x_new - x)

    return jax.lax.fori_loop(0, n_iter, body, x)


def _restrict_local(x):
    """Full-weighting 2x restriction — purely within 2^3 blocks, so no
    halo is needed as long as the local z extent is even."""
    Z, Y, X = x.shape
    return x.reshape(Z // 2, 2, Y // 2, 2, X // 2, 2).mean(axis=(1, 3, 5))


def _prolong_sharded(x):
    """Cell-centered trilinear prolongation; the z axis needs the +-1
    COARSE plane from the neighboring shard (one halo exchange)."""
    xh = _halo_z(x)                      # (z+2, y, x)
    lo = 0.75 * x + 0.25 * xh[:-2]       # fine 2i   <- 0.75 c_i + 0.25 c_{i-1}
    hi = 0.75 * x + 0.25 * xh[2:]        # fine 2i+1 <- 0.75 c_i + 0.25 c_{i+1}
    x = jnp.stack([lo, hi], axis=1).reshape(2 * x.shape[0], *x.shape[1:])
    for ax in (1, 2):
        lo = 0.75 * x + 0.25 * _shift_xy(x, ax, -1)
        hi = 0.75 * x + 0.25 * _shift_xy(x, ax, 1)
        stacked = jnp.stack([lo, hi], axis=ax + 1)
        shape = list(x.shape)
        shape[ax] *= 2
        x = stacked.reshape(shape)
    return x


def _vcycle_sharded(x, f, screen, levels, pre, post):
    # Local z extent must stay >= 2 and even through `levels` coarsenings;
    # the caller picks `levels` accordingly (static).
    if levels == 0 or x.shape[0] <= 2:
        return _jacobi_sharded(x, f, screen, 40)
    x = _jacobi_sharded(x, f, screen, pre)
    r = f - (_neighbor_sum(x) - 6.0 * x - screen * x)
    r2 = _restrict_local(r) * 4.0
    e2 = jnp.zeros_like(r2)
    e2 = _vcycle_sharded(e2, r2, _restrict_local(screen) * 4.0,
                         levels - 1, pre, post)
    x = x + _prolong_sharded(e2)
    x = _jacobi_sharded(x, f, screen, post)
    return x


@partial(jax.jit, static_argnames=("mesh", "levels", "cycles", "pre", "post"))
def poisson_vcycle_sharded(
    mesh: Mesh,
    f: jnp.ndarray,
    screen: jnp.ndarray,
    levels: int = 3,
    cycles: int = 8,
    pre: int = 2,
    post: int = 2,
) -> jnp.ndarray:
    """Solve (Delta - screen) chi = f with the grid z-sharded over `tile`.

    Args: f, screen (R, R, R) with R divisible by tile * 2^levels.
    Returns chi replicated on every device holder (sharded output spec,
    gather on read)."""
    ntile = mesh.shape[_AXIS]
    R = f.shape[0]
    assert R % (ntile * (1 << levels)) == 0, (R, ntile, levels)

    def shard_fn(f_blk, s_blk):
        x = jnp.zeros_like(f_blk)

        def one_cycle(_, x):
            return _vcycle_sharded(x, f_blk, s_blk, levels, pre, post)

        return jax.lax.fori_loop(0, cycles, one_cycle, x)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(_AXIS), P(_AXIS)),
                   out_specs=P(_AXIS))
    return fn(f, screen)
