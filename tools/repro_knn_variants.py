"""Isolate WHICH structure of the SOR k-NN statistic faults the TPU.

The single-reduction count callback runs fine (0.37 s warm at 2.4M);
both the bisection and histogram k-NN stats kill the device.  This runs
a ladder of callbacks from count upward, at two sizes, with and without
an optimization_barrier between the candidate gather and the reduction,
printing after each — the last line printed identifies the boundary.

Usage: python tools/tpu_run.py tools/repro_knn_variants.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step(name, fn):
    import jax
    t0 = time.perf_counter()
    try:
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001 — print and stop at the fault
        print(f"[repro] {name}: FAILED {type(e).__name__}: {e}", flush=True)
        raise SystemExit(1)
    print(f"[repro] {name}: ok ({time.perf_counter() - t0:.2f}s)", flush=True)
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from reconstruction_tpu.cloud.neighbors import (
        build_dense_grid, host_grid_geometry, neighbor_map_dense)
    from reconstruction_tpu.cloud.filters import _mean_spacing
    from reconstruction_tpu.cloud.normals import _cov_stat

    def make(N):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1.7, 1.7, size=(N, 3)).astype(np.float32)
        pts[:, 2] *= 0.25
        valid = np.ones(N, bool)
        spacing = _mean_spacing(pts, valid)
        cell = spacing * np.sqrt(100.0) * 0.6 + 1e-6
        origin, dims, cell = host_grid_geometry(pts, valid, float(cell))
        pj, vj = jnp.asarray(pts), jnp.asarray(valid)
        grid = build_dense_grid(pj, vj, jnp.asarray(origin),
                                jnp.float32(cell), dims, pad=32)
        return grid, pj, vj, jnp.float32(cell), dims

    # --- callbacks, simplest to fullest ------------------------------------
    def cb_count(q, cand, cpts, d2, ok):
        return ok.sum(-1)

    def cb_meandist(q, cand, cpts, d2, ok):  # 2 reductions + sqrt
        s = jnp.where(ok, jnp.sqrt(jnp.where(ok, d2, 0.0)), 0.0).sum(-1)
        m = jnp.maximum(ok.sum(-1), 1)
        return s / m

    def cb_maxd(q, cand, cpts, d2, ok):  # adds the max reduction
        s = jnp.where(ok, jnp.sqrt(jnp.where(ok, d2, 0.0)), 0.0).sum(-1)
        hi = jnp.max(jnp.where(ok, d2, 0.0), axis=-1)
        return s + hi

    def cb_hist4(q, cand, cpts, d2, ok):  # 4-bin histogram
        dist = jnp.sqrt(jnp.where(ok, d2, 0.0))
        w = jnp.max(dist, axis=-1) + 1e-12
        bi = jnp.clip((dist / w[..., None] * 4).astype(jnp.int32), 0, 3)
        acc = 0.0
        for b in range(4):
            mb = ok & (bi == b)
            acc = acc + jnp.where(mb, dist, 0.0).sum(-1) * (b + 1)
        return acc

    def barrier_wrap(cb):
        def fn(q, cand, cpts, d2, ok):
            q, cpts, d2, ok = jax.lax.optimization_barrier((q, cpts, d2, ok))
            return cb(q, cand, cpts, d2, ok)
        return fn

    for N in (300_000, 2_400_000):
        grid, pj, vj, cell, dims = make(N)
        print(f"[repro] ---- N={N} dims={dims}", flush=True)
        step(f"count N={N}", lambda: neighbor_map_dense(
            grid, pj, vj, cell, cb_count, dims, per_cell=32, chunk=4096,
            exclude_self=True))
        step(f"meandist N={N}", lambda: neighbor_map_dense(
            grid, pj, vj, cell, cb_meandist, dims, per_cell=32, chunk=4096,
            exclude_self=True))
        step(f"maxd N={N}", lambda: neighbor_map_dense(
            grid, pj, vj, cell, cb_maxd, dims, per_cell=32, chunk=4096,
            exclude_self=True))
        step(f"hist4 N={N}", lambda: neighbor_map_dense(
            grid, pj, vj, cell, cb_hist4, dims, per_cell=32, chunk=4096,
            exclude_self=True))
        step(f"hist4+barrier N={N}", lambda: neighbor_map_dense(
            grid, pj, vj, cell, barrier_wrap(cb_hist4), dims, per_cell=32,
            chunk=4096, exclude_self=True))
        step(f"cov(normals) N={N}", lambda: neighbor_map_dense(
            grid, pj, vj, cell, _cov_stat, dims, per_cell=8, chunk=4096))
        from reconstruction_tpu.cloud.filters import _knn_stat, sor_filter
        for nb in (8, 16, 32):
            step(f"knn_stat bins={nb} N={N}", lambda nb=nb: neighbor_map_dense(
                grid, pj, vj, cell, _knn_stat(100, nb), dims, per_cell=32,
                chunk=4096, exclude_self=True))
        step(f"sor_filter e2e N={N}", lambda: sor_filter(pj, vj))
    print("[repro] ALL OK", flush=True)


if __name__ == "__main__":
    main()
