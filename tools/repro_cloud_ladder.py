"""Fine-grained on-chip ladder for the 2.45M-point cloud stage (r3).

repro_cloud_stage.py died ~10 min into `sor_filter cold` with the whole
chain in one step — indistinguishable between a hung kernel and the
chip-grant time-box eating a slow cold compile.  This ladder splits the
chain into the smallest separately-jitted steps, in cost order, so (a)
the last printed line identifies where the time goes and (b) every
completed step lands in the persistent compile cache, ratcheting across
sessions.

Usage: python tools/tpu_run.py tools/repro_cloud_ladder.py [budget_s]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[ladder +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 480.0
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    d = jax.devices()[0]
    log(f"backend ready: {d.device_kind}")
    t_ready = time.time()

    def left():
        return budget - (time.time() - t_ready)

    def step(name, fn, need=45.0):
        if left() < need:
            log(f"SKIP {name}: {left():.0f}s budget left")
            return None
        t = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        log(f"{name}: ok ({time.perf_counter() - t:.2f}s)")
        return out

    # Same cloud as repro_cloud_stage.py (bench pair shape).
    H, W = 1920, 1280
    N = H * W
    rng = np.random.default_rng(3)
    yy, xx = np.meshgrid(np.linspace(-1.6, 1.6, H),
                         np.linspace(-1.1, 1.1, W), indexing="ij")
    zz = 0.35 * np.sin(2.1 * xx) * np.cos(1.7 * yy)
    pts = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    pts += rng.normal(0, 2e-4, pts.shape).astype(np.float32)
    valid = rng.random(N) < 0.8
    n_out = N // 200
    oi = rng.choice(N, n_out, replace=False)
    pts[oi] = rng.uniform(-60, 60, (n_out, 3)).astype(np.float32)
    pts[~valid] = rng.uniform(-1e4, 1e4, ((~valid).sum(), 3)).astype(np.float32)

    from reconstruction_tpu.cloud.filters import (_knn_stat, _mean_spacing,
                                                  _sor_gate)
    from reconstruction_tpu.cloud.neighbors import (
        build_dense_grid, host_grid_geometry, neighbor_map_dense)

    spacing = _mean_spacing(pts, valid)
    cell = spacing * float(np.sqrt(100)) * 0.6 + 1e-6
    origin, dims, cell = host_grid_geometry(pts, valid, cell)
    G = dims[0] * dims[1] * dims[2]
    log(f"N={N} dims={dims} G={G} cell={cell:.5f}")

    pj = jnp.asarray(pts)
    vj = jnp.asarray(valid)
    cj = jnp.float32(cell)

    grid = step("build_dense_grid", lambda: build_dense_grid(
        pj, vj, origin, cj, dims, pad=32), need=90.0)
    if grid is None:
        return 0

    def run_map(fn, pc=32):
        return neighbor_map_dense(grid, pj, vj, cj, fn, dims,
                                  per_cell=pc, chunk=4096,
                                  exclude_self=True)

    step("map count", lambda: run_map(
        lambda q, cand, cpts, d2, ok: ok.sum(-1)), need=120.0)
    step("map meandist", lambda: run_map(
        lambda q, cand, cpts, d2, ok:
        jnp.where(ok, jnp.sqrt(jnp.where(ok, d2, 0.0)), 0.0).sum(-1)
        / jnp.maximum(ok.sum(-1), 1)), need=120.0)
    out = None
    for nb in (8, 16, 32):
        o = step(f"map knn_stat bins={nb}",
                 lambda nb=nb: run_map(_knn_stat(100, nb)), need=120.0)
        if o is not None:
            out = o
    if out is not None:
        mean_d, has = out
        keep = step("sor gate", lambda: _sor_gate(
            mean_d, has, vj, cj, jnp.float32(1.0)), need=30.0)
        if keep is not None:
            log(f"kept {np.asarray(keep).mean():.3f}")
    # warm rep of whichever map is production
    step("map knn_stat bins=32 warm",
         lambda: run_map(_knn_stat(100, 32)), need=30.0)
    log("LADDER DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
