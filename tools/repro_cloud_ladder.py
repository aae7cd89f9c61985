"""Fine-grained on-chip ladder for the 2.45M-point cloud stage (r3).

Round-3 findings so far: every cloud kernel (grid build, count map,
histogram k-NN, gate) completes in seconds on-chip, and ALL raw
device->host transfers (f32/int32/uint8/bool up to 2.45M) succeed in a
clean session (tools/repro_transfer.py) — yet fetching the SOR result
after running the maps killed the worker.  This ladder therefore
FETCHES after every step: the first fetch that dies identifies which
producer poisons the worker/buffer.  Covers SOR, normals and MLS at the
exact bench pair shape.

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

    def fetch(name, arr):
        if arr is None:
            return None
        t = time.perf_counter()
        host = jax.tree_util.tree_map(np.asarray, arr)
        first = jax.tree_util.tree_leaves(host)[0]
        log(f"fetch {name}: ok ({time.perf_counter() - t:.2f}s) "
            f"mean={np.asarray(first, np.float64).mean():.4g}")
        return host

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
    log(f"N={N} spacing={spacing:.5f} dims={dims} G={G} cell={cell:.5f}")

    pj = jnp.asarray(pts)
    vj = jnp.asarray(valid)
    cj = jnp.float32(cell)

    grid = step("build_dense_grid", lambda: build_dense_grid(
        pj, vj, origin, cj, dims, pad=32), need=90.0)
    if grid is None:
        return 0
    fetch("grid.starts[:4]", grid.starts[:4])

    def run_map(fn, pc=32):
        return neighbor_map_dense(grid, pj, vj, cj, fn, dims,
                                  per_cell=pc, chunk=4096,
                                  exclude_self=True)

    cnt = step("map count", lambda: run_map(
        lambda q, cand, cpts, d2, ok: ok.sum(-1)), need=120.0)
    fetch("count", cnt)

    out = step("map knn_stat bins=32",
               lambda: run_map(_knn_stat(100, 32)), need=120.0)
    if out is not None:
        fetch("knn mean_d", out[0])
        fetch("knn has (bool)", out[1])
        keep = step("sor gate", lambda: _sor_gate(
            out[0], out[1], vj, cj, jnp.float32(1.0)), need=30.0)
        kh = fetch("keep (bool)", keep)
        if kh is not None:
            log(f"kept {kh.mean():.3f}")
    else:
        keep = vj

    # normals + mls at the bench radius
    from reconstruction_tpu.cloud.normals import estimate_normals
    from reconstruction_tpu.cloud.mls import mls_smooth
    center = jnp.asarray([0.0, 0.0, 8.0], jnp.float32)
    nrm = step("estimate_normals", lambda: estimate_normals(
        pj, keep, radius=0.02, viewpoint=center,
        host_points=pts, host_valid=valid), need=120.0)
    nh = fetch("normals", nrm)
    if nrm is not None:
        sm = step("mls_smooth", lambda: mls_smooth(
            pj, keep, 0.02, nrm, host_points=pts, host_valid=valid),
            need=120.0)
        fetch("mls (pts, nrm, ok)", sm)
    log("LADDER DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
