"""SPMD execution of the stereo core over the device mesh.

Two sharding strategies (SURVEY.md section 2 "parallelism strategies"):

  * pair-sharding: the reference iterates camera pairs sequentially
    (`CStereoMatching.cpp:17`); here all pairs of a frame run as one
    SPMD program, one (or more) pairs per device along the `pair` axis.
    No cross-pair communication is needed until cloud fusion
    (all_gather at the end).

  * tile-sharding with halo exchange: the refinement sweep couples
    +-1 rows per iteration (`CStereoMatching.cpp:597-599`), so row-block
    shards exchange one boundary row per iteration via `ppermute` —
    structurally the ring/blockwise-attention pattern (the CP analogue
    for this workload).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reconstruction_tpu.config import NOMATCH
from reconstruction_tpu.stereo.margins import Margins, find_margin
from reconstruction_tpu.stereo.pipeline import LevelState, match_one_level
from reconstruction_tpu.stereo.refine import _banded_cost_volume
from reconstruction_tpu.stereo.ncc import shifted


def match_level_pairs_sharded(
    mesh: Mesh,
    imgs0: jnp.ndarray,
    imgs1: jnp.ndarray,
    masks0: jnp.ndarray,
    masks1: jnp.ndarray,
    coarse: Optional[LevelState],
    level: int,
    axis: str = "pair",
    **kw,
) -> LevelState:
    """All camera pairs of one level as a single SPMD program.

    Args: imgs* (Npair, H, W, C), masks* (Npair, H, W); the leading axis
    is sharded over the mesh's ``axis`` (default `pair`; a video batch
    passes `frame` to shard frames — SURVEY section 2 parallelism table:
    the frame axis is the DP analogue of `BatchProcess/main.cpp:74-75`'s
    sequential per-take loop).
    """
    pair_shard = NamedSharding(mesh, P(axis))

    def local(i0, i1, m0, m1, c0, c1):
        cs = None if coarse is None else LevelState(disp0=c0, disp1=c1)
        out = match_one_level(i0, i1, m0, m1, cs, level, **kw)
        return (out.disp0, out.disp1,
                out.refine_drift0, out.refine_drift1)

    vm = jax.vmap(local)
    if coarse is None:
        Hc = imgs0.shape[1] // 2
        Wc = imgs0.shape[2] // 2
        c0 = jnp.zeros((imgs0.shape[0], Hc, Wc), jnp.float32)
        c1 = c0
    else:
        c0, c1 = coarse.disp0, coarse.disp1

    args = [imgs0, imgs1, masks0, masks1, c0, c1]
    args = [jax.device_put(a, pair_shard) for a in args]
    d0, d1, r0, r1 = jax.jit(vm)(*args)
    return LevelState(disp0=d0, disp1=d1,
                      refine_drift0=r0, refine_drift1=r1)


@partial(jax.jit, static_argnames=("mesh", "iterations", "s_cap", "band"))
def refine_tiled(
    mesh: Mesh,
    disp: jnp.ndarray,
    imgL: jnp.ndarray,
    imgR: jnp.ndarray,
    m: Margins,
    iterations: int,
    ws: float = 0.03,
    s_cap: int = 64,
    band: int = 16,
) -> jnp.ndarray:
    """Row-block-sharded subpixel refinement with per-iteration halo
    exchange over the `tile` axis.

    Semantics match `stereo.refine.disparity_refine` exactly: each Jacobi
    sweep reads N/S neighbor rows, so each shard sends its edge rows to
    its neighbors (ppermute up + down) before computing.
    """
    H, W = disp.shape
    ntile = mesh.shape["tile"]
    assert H % ntile == 0, (H, ntile)
    rows = H // ntile

    # Cost volume is row-local: build it unsharded here (each shard's
    # bands are independent); the iteration loop runs inside shard_map.
    cv, base = _banded_cost_volume(imgL, imgR, disp, s_cap, min(band, rows))
    inner_y = (jnp.arange(H) > m.YL) & (jnp.arange(H) < m.YR)
    inner_x = (jnp.arange(W) > m.XL) & (jnp.arange(W) < m.XR)
    ws_f = jnp.float32(ws)

    def shard_fn(d_blk, cv_blk, base_blk, iy_blk, ix):
        """d_blk (rows, W); runs on one tile shard."""
        axis = "tile"
        idx = jax.lax.axis_index(axis)
        n = jax.lax.axis_size(axis)

        def one_iter(d, _):
            # halo exchange: receive last row of upper neighbor and first
            # row of lower neighbor
            up_row = jax.lax.ppermute(d[-1:], axis,
                                      [(i, (i + 1) % n) for i in range(n)])
            dn_row = jax.lax.ppermute(d[:1], axis,
                                      [(i, (i - 1) % n) for i in range(n)])
            # wraparound shards get NOMATCH halos (image border)
            up_row = jnp.where(idx == 0, jnp.float32(NOMATCH), up_row)
            dn_row = jnp.where(idx == n - 1, jnp.float32(NOMATCH), dn_row)

            dN = jnp.concatenate([up_row, d[:-1]], axis=0)
            dS = jnp.concatenate([d[1:], dn_row], axis=0)
            dE = shifted(d, 0, 1)
            dW = shifted(d, 0, -1)
            valid = d != NOMATCH
            mode_x = (dE != NOMATCH) & (dW != NOMATCH)
            mode_y = (dS != NOMATCH) & (dN != NOMATCH)

            c0 = jnp.trunc(d - 1.5).astype(jnp.int32)
            j = c0 + 2 - base_blk[:, None]
            xs = []
            for i in (-1, 0, 1):
                ji = jnp.clip(j + i, 0, s_cap - 1)
                in_range = (j + i >= 0) & (j + i < s_cap)
                v = jnp.take_along_axis(cv_blk, ji[..., None], axis=2)[..., 0]
                xs.append(jnp.where(in_range, v, 0.5))
            xi0, xi1, xi2 = xs
            idx2 = (xi0 >= xi1).astype(jnp.int32)
            xi_at = jnp.where(idx2 == 0, xi0, xi1)
            idx2 = jnp.where(xi_at > xi2, 2, idx2)
            denom = xi0 + xi2 - 2.0 * xi1
            pwp1 = 0.5 * (xi0 + xi2) - xi1
            pdp1 = d + 0.5 * (xi0 - xi2) / jnp.where(denom == 0, 1.0, denom)
            pdp1 = jnp.where(pwp1 == 0, 0.0, pdp1)
            pwp = jnp.where(idx2 == 0, xi1 - xi0,
                            jnp.where(idx2 == 1, pwp1, xi1 - xi2))
            pdp = jnp.where(idx2 == 0, d - 0.5,
                            jnp.where(idx2 == 1, pdp1, d + 0.5))

            ex = jnp.exp(-jnp.square(jnp.abs(dE - d) - jnp.abs(dW - d)))
            ey = jnp.exp(-jnp.square(jnp.abs(dS - d) - jnp.abs(dN - d)))
            wsum = ex + ey
            ds_both = jnp.where(
                wsum == 0, (dE + dW + dS + dN) * 0.25,
                (ex * (dE + dW) + ey * (dN + dS))
                / (2.0 * jnp.where(wsum == 0, 1.0, wsum)))
            ds = jnp.where(mode_x & mode_y, ds_both,
                           jnp.where(mode_x, (dE + dW) * 0.5,
                                     (dN + dS) * 0.5))
            blended = (pdp * pwp + ws_f * ds) / (pwp + ws_f)
            new_d = jnp.where(mode_x | mode_y, blended, d)
            inner = iy_blk[:, None] & ix[None, :]
            return jnp.where(valid & inner, new_d, d), None

        out, _ = jax.lax.scan(one_iter, d_blk, None, length=iterations)
        return out

    from jax import shard_map
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("tile", None), P("tile", None, None), P("tile"),
                  P("tile"), P(None)),
        out_specs=P("tile", None),
    )
    return fn(disp.astype(jnp.float32), cv, base, inner_y, inner_x)
