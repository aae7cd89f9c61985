"""Bounded on-chip isolation of the full cloud stage (r3).

The r2 bench died in pair 1's cloud stage with "TPU worker process
crashed" — either a genuine kernel fault in the histogram k-NN or the
~12-15 min chip-grant time-box expiring mid-run (r2 observed sessions
dying at that age regardless of workload).  This payload answers which:
it runs sor_filter -> estimate_normals -> mls_smooth standalone on a
synthetic cloud with the EXACT bench pair shape (1920x1280 grid ->
2,457,600 points, bench radii), printing a wall-clock timestamp after
every step so the log shows both per-step cost and total session age at
any failure.

Self-bounding: steps are skipped once the session budget (default 540 s
from backend-ready) is spent — the process then exits cleanly, releasing
the grant.  Each session ratchets the persistent compile cache, so rerun
until all steps report warm timings.

Usage: python tools/tpu_run.py tools/repro_cloud_stage.py [budget_s]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[repro +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 540.0
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    log("importing done; touching backend...")
    d = jax.devices()[0]
    log(f"backend ready: {d.device_kind} ({d.platform})")
    t_ready = time.time()

    def left():
        return budget - (time.time() - t_ready)

    # Bench-shaped cloud: (H*W, 3) with ~80% valid, surface ~3.2 units
    # across at ~0.0016 spacing, plus 0.5% triangulation-outlier spikes.
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
    log(f"cloud built: N={N} valid={valid.sum()} outliers={n_out}")

    from reconstruction_tpu.cloud.filters import sor_filter
    from reconstruction_tpu.cloud.normals import estimate_normals
    from reconstruction_tpu.cloud.mls import mls_smooth

    pj = jnp.asarray(pts)
    vj = jnp.asarray(valid)
    mls_radius = 0.02  # bench_config value

    def step(name, fn, need=60.0):
        if left() < need:
            log(f"SKIP {name}: only {left():.0f}s budget left")
            return None
        t = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        log(f"{name}: ok ({time.perf_counter() - t:.2f}s)")
        return out

    keep = step("sor_filter cold", lambda: sor_filter(pj, vj), need=120.0)
    if keep is None:
        return 0
    log(f"  kept {np.asarray(keep).mean():.3f} of all, "
        f"{(np.asarray(keep)[valid]).mean():.3f} of valid")

    center = jnp.asarray([0.0, 0.0, 8.0], jnp.float32)
    nrm = step("estimate_normals cold",
               lambda: estimate_normals(pj, keep, radius=mls_radius,
                                        viewpoint=center), need=120.0)
    if nrm is None:
        return 0

    sm = step("mls_smooth cold",
              lambda: mls_smooth(pj, keep, mls_radius, nrm), need=120.0)
    if sm is None:
        return 0

    # Warm reps — per-stage steady-state numbers for BENCH_NOTES.
    for rep in range(2):
        step(f"sor_filter warm{rep}", lambda: sor_filter(pj, vj), need=45.0)
        step(f"normals warm{rep}",
             lambda: estimate_normals(pj, keep, radius=mls_radius,
                                      viewpoint=center), need=45.0)
        step(f"mls warm{rep}",
             lambda: mls_smooth(pj, keep, mls_radius, nrm), need=45.0)
    log("ALL STEPS DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
