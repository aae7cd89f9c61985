"""Micro-isolation: which cloud-grid sub-op breaks the NEXT fetch?

r3 evidence: in a clean session every transfer works; after
build_dense_grid (argsort + big gather + scatter-add + cumsum) a
subsequent 4-element fetch hangs, and after the neighbor maps a bool
fetch kills the worker.  Stereo programs (scans/selects/reduce_window)
never do this.  This ladder runs each suspect op alone, fetching a tiny
slice right after — the first fetch that hangs or dies names the op.

Usage: python tools/tpu_run.py tools/repro_grid_ops.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[gridops +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    d = jax.devices()[0]
    log(f"backend ready: {d.device_kind}")

    N = 2_457_600
    G = 4_128_768
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, G, N).astype(np.int32)
    pts_np = rng.uniform(-2, 2, (N, 3)).astype(np.float32)

    def probe(name, fn):
        t = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        tb = time.perf_counter() - t
        t = time.perf_counter()
        leaf = jax.tree_util.tree_leaves(out)[0]
        val = np.asarray(leaf.reshape(-1)[:4])
        log(f"{name}: run {tb:.2f}s, fetch {time.perf_counter() - t:.2f}s "
            f"-> {val.tolist()}")
        return out

    # session health control (probe showed these pass clean)
    probe("control iota+1", lambda: jnp.arange(N, dtype=jnp.int32) + 1)

    ids = jnp.asarray(ids_np)
    pts = jnp.asarray(pts_np)

    order = probe("argsort 2.45M", lambda: jax.jit(jnp.argsort)(ids))
    probe("big gather pts[order]", lambda: jax.jit(lambda p, o: p[o])(pts, order))
    counts = probe("scatter-add G", lambda: jax.jit(
        lambda i: jnp.zeros(G + 2, jnp.int32).at[i].add(1))(ids))
    probe("cumsum G", lambda: jax.jit(
        lambda c: jnp.cumsum(c, dtype=jnp.int32))(counts))

    # vmapped dynamic_slice block (the candidate gather in the maps)
    s = jnp.asarray(rng.integers(0, N - 40, 4096 * 27).astype(np.int32))
    big = jnp.asarray(rng.uniform(0, 1, (N + 32, 3)).astype(np.float32))

    def sl(si):
        return jax.lax.dynamic_slice(big, (si, 0), (32, 3))

    probe("vmap dynamic_slice 110k x (32,3)",
          lambda: jax.jit(jax.vmap(sl))(s))

    # small lax.map with the slices inside
    def chunk_fn(ss):
        return jax.vmap(sl)(ss).sum(axis=(1, 2))

    s2 = s.reshape(27, 4096)
    probe("lax.map of slice-chunks", lambda: jax.jit(
        lambda x: jax.lax.map(chunk_fn, x))(s2))

    log("ALL GRID OPS OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
