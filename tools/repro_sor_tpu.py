"""Stepwise TPU repro for the sor_filter worker crash (r2 bench).

Runs each building block of the dense-grid SOR on a synthetic
2.4M-point slab, blocking and printing after every step so the faulting
kernel is identified by the last line printed.

Usage: python tools/tpu_run.py tools/repro_sor_tpu.py [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step(name, fn):
    import jax
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    print(f"[repro] {name}: ok ({time.perf_counter() - t0:.2f}s)",
          flush=True)
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from reconstruction_tpu.cloud.neighbors import (
        build_dense_grid, host_grid_geometry, neighbor_map_dense)
    from reconstruction_tpu.cloud.filters import (
        _knn_stat, _mean_spacing, sor_filter)

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.7, 1.7, size=(N, 3)).astype(np.float32)
    pts[:, 2] *= 0.25
    valid = np.ones(N, bool)
    print(f"[repro] N={N}", flush=True)

    spacing = _mean_spacing(pts, valid)
    cell = spacing * np.sqrt(100.0) * 0.6 + 1e-6
    origin, dims, cell = host_grid_geometry(pts, valid, float(cell))
    G = dims[0] * dims[1] * dims[2]
    print(f"[repro] dims={dims} G={G} cell={cell:.5f}", flush=True)

    pj = jnp.asarray(pts)
    vj = jnp.asarray(valid)
    oj = jnp.asarray(origin)

    dims_arr = np.asarray(dims, np.int32)
    ci = np.clip(((pts - origin) / cell).astype(np.int32), 0, dims_arr - 1)
    ids_np = (ci[:, 0] * dims[1] + ci[:, 1]) * dims[2] + ci[:, 2]
    ids = jnp.asarray(ids_np)

    step("argsort 2.4M", lambda: jax.jit(jnp.argsort)(ids))
    step("scatter counts G",
         lambda: jax.jit(
             lambda i: jnp.zeros(G + 2, jnp.int32).at[i].add(1))(ids))
    counts = jnp.zeros(G + 2, jnp.int32).at[ids].add(1)
    step("cumsum G", lambda: jax.jit(
        lambda c: jnp.cumsum(c, dtype=jnp.int32))(counts))

    grid = step("build_dense_grid", lambda: build_dense_grid(
        pj, vj, oj, jnp.float32(cell), dims, pad=32))

    counts2 = step("neighbor_map_dense count", lambda: neighbor_map_dense(
        grid, pj, vj, jnp.float32(cell),
        lambda q, cand, cpts, d2, ok: ok.sum(-1),
        dims, per_cell=32, chunk=4096, exclude_self=True))
    print(f"[repro] mean neighbor count {np.asarray(counts2).mean():.1f}",
          flush=True)

    stat = step("neighbor_map_dense knn_stat", lambda: neighbor_map_dense(
        grid, pj, vj, jnp.float32(cell), _knn_stat(100),
        dims, per_cell=32, chunk=4096, exclude_self=True))

    keep = step("sor_filter end-to-end", lambda: sor_filter(pj, vj))
    print(f"[repro] kept {np.asarray(keep).mean():.3f}", flush=True)


if __name__ == "__main__":
    main()
