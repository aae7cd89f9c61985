"""Minimal escalating repro for the r4 jax-cloud-backend worker crash:
count-map + SOR at 100k then 400k then 830k points, fetch after every
step, stop at the first failure (run via tools/tpu_run.py).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[small +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from synthetic import surface_fn
    from reconstruction_tpu.cloud.filters import sor_filter

    log(f"backend ready: {jax.devices()[0].device_kind}")
    np.asarray(jnp.zeros((1 << 20,), jnp.float32) + 1.0)
    log("pre-pay fetch ok")
    rng = np.random.default_rng(0)
    for n in (100_000, 400_000, 830_000):
        xy = rng.uniform(-1.8, 1.8, size=(n, 2)).astype(np.float32)
        z = surface_fn(xy[:, 0], xy[:, 1]).astype(np.float32)
        xyz = np.column_stack(
            [xy, z + rng.normal(scale=2e-3, size=n).astype(np.float32)])
        v = np.ones(n, bool)
        t0 = time.perf_counter()
        keep = sor_filter(jnp.asarray(xyz), jnp.asarray(v), mean_k=100,
                          std_thresh=1.0, host_points=xyz, host_valid=v,
                          backend="jax")
        kh = np.asarray(keep)
        log(f"sor n={n}: ok {time.perf_counter() - t0:.1f}s "
            f"kept={int(kh.sum())}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
