"""Cross-process persistent-cache behavior of a Pallas-bearing program
(BENCH_NOTES known issue: identical source produced distinct cache keys,
forcing a ~350 s level-3 recompile in every new process).

Runs the SAME small pallas-refine jit twice in-process and reports
compile time; run this script twice (two processes) and compare the
second process's first-compile time — a cache hit should make it ~1 s.

Usage: python tools/tpu_run.py tools/repro_pallas_cache.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[pcache +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # Surface cache hits/misses in the log.
    os.environ.setdefault("JAX_EXPLAIN_CACHE_MISSES", "true")
    import jax.numpy as jnp
    from reconstruction_tpu.config import NOMATCH
    from reconstruction_tpu.ops.refine_pallas import disparity_refine_pallas
    from reconstruction_tpu.stereo.margins import find_margin

    log(f"backend ready: {jax.devices()[0].device_kind}")
    H, W = 256, 640
    rng = np.random.default_rng(3)
    disp = np.where(rng.uniform(size=(H, W)) > 0.1, 10.0, NOMATCH)
    valid = np.ones((H, W), bool)
    m = find_margin(jnp.asarray(valid), 2)
    iL = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    iR = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))

    t0 = time.perf_counter()
    out = disparity_refine_pallas(jnp.asarray(disp, jnp.float32), iL, iR,
                                  m, 12, 0.03, 64, 64)
    np.asarray(out)
    log(f"first compile+run: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    out = disparity_refine_pallas(jnp.asarray(disp, jnp.float32), iL, iR,
                                  m, 12, 0.03, 64, 64)
    np.asarray(out)
    log(f"second (in-process cached) run: {time.perf_counter() - t0:.2f}s")
    log("DONE — run me again in a NEW process; if 'first compile+run' "
        "stays slow, the persistent cache missed (capture the "
        "JAX_EXPLAIN_CACHE_MISSES output above for the upstream report)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
