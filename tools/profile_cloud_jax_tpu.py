"""On-chip bench-scale run of the JAX (device) cloud backend
(VERDICT r3 #5): the auto->jax default on real (non-relay) TPUs rested
on CPU tests only — this measures sor/normals at the per-pair shape
(830k points, as the pipeline calls them) and MLS at the fused 3.3M
shape, fetch-fenced, on the actual chip.

Usage: python tools/tpu_run.py tools/profile_cloud_jax_tpu.py [budget_s]
Self-bounded: skips remaining steps when the budget runs out.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[cloudjax +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from synthetic import surface_fn
    from reconstruction_tpu.cloud.filters import sor_filter
    from reconstruction_tpu.cloud.normals import estimate_normals
    from reconstruction_tpu.cloud.mls import mls_smooth

    d = jax.devices()[0]
    log(f"backend ready: {d.device_kind}")
    t_ready = time.time()

    # Pre-pay the session's first-fetch stall.
    t0 = time.perf_counter()
    np.asarray(jnp.zeros((4 << 20,), jnp.float32) + 1.0)
    log(f"stall pre-pay fetch: {time.perf_counter() - t0:.1f}s")

    def left():
        return budget - (time.time() - t_ready)

    rng = np.random.default_rng(0)

    def make_cloud(n):
        xy = rng.uniform(-1.8, 1.8, size=(n, 2)).astype(np.float32)
        z = surface_fn(xy[:, 0], xy[:, 1]).astype(np.float32)
        xyz = np.column_stack(
            [xy, z + rng.normal(scale=2e-3, size=n).astype(np.float32)])
        nrm = np.tile(np.array([0, 0, 1], np.float32), (n, 1))
        return xyz, nrm

    radius = 0.02
    results = {}

    def step(name, fn, need=120.0):
        if left() < need:
            log(f"SKIP {name}: only {left():.0f}s budget left")
            return None
        t0 = time.perf_counter()
        out = fn()
        out = np.asarray(out)  # fetch fence
        dt = time.perf_counter() - t0
        results[name] = round(dt, 2)
        log(f"{name}: {dt:.2f}s (shape {out.shape})")
        return out

    # Per-pair shapes (sor + normals run per pair in the pipeline).
    xyz_p, _ = make_cloud(830_000)
    vp = np.ones(len(xyz_p), bool)
    keep = step("sor_830k_cold", lambda: sor_filter(
        jnp.asarray(xyz_p), jnp.asarray(vp), mean_k=100, std_thresh=1.0,
        host_points=xyz_p, host_valid=vp, backend="jax"))
    if keep is not None:
        step("sor_830k_warm", lambda: sor_filter(
            jnp.asarray(xyz_p), jnp.asarray(vp), mean_k=100,
            std_thresh=1.0, host_points=xyz_p, host_valid=vp,
            backend="jax"))
        step("normals_830k", lambda: estimate_normals(
            jnp.asarray(xyz_p), jnp.asarray(keep), radius=radius,
            viewpoint=jnp.asarray(np.array([0, 0, 8], np.float32)),
            host_points=xyz_p, host_valid=vp, backend="jax"))

    # Fused-cloud MLS at 3.3M.
    xyz_g, nrm_g = make_cloud(3_300_000)
    vg = np.ones(len(xyz_g), bool)
    out = step("mls_3.3M_cold", lambda: mls_smooth(
        jnp.asarray(xyz_g), jnp.asarray(vg), radius, jnp.asarray(nrm_g),
        host_points=xyz_g, host_valid=vg, backend="jax")[0], need=240.0)
    if out is not None:
        step("mls_3.3M_warm", lambda: mls_smooth(
            jnp.asarray(xyz_g), jnp.asarray(vg), radius,
            jnp.asarray(nrm_g), host_points=xyz_g, host_valid=vg,
            backend="jax")[0], need=180.0)

    log(f"RESULTS {results}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
