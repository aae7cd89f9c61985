"""Deviation distribution of the bf16-window refine vs the f32 path
(tools/tune_refine_block.py measured 40.5 vs 63.0 ms/30-sweeps; this
decides whether the 1.56x is safe to adopt).

Usage: python tools/tpu_run.py tools/check_refine_bf16.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[bf16 +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench as benchmod
    from reconstruction_tpu.config import NOMATCH
    from reconstruction_tpu.ops.refine_pallas import disparity_refine_pallas
    from reconstruction_tpu.stereo.margins import find_margin

    log(f"backend ready: {jax.devices()[0].device_kind}")
    H, W = 1920, 1280
    rng = np.random.default_rng(7)
    imgL, imgR, mask = benchmod.synth_pair(H, W, rng)
    valid = mask > 127
    m = find_margin(jnp.asarray(valid), 2)
    disp0 = jnp.asarray(np.where(valid, 40.0, NOMATCH).astype(np.float32))
    iL, iR = jnp.asarray(imgL), jnp.asarray(imgR)

    # 120 sweeps: the production finest-level budget, where drift
    # accumulates most.
    for iters in (30, 120):
        a = np.asarray(disparity_refine_pallas(
            disp0, iL, iR, m, iters, 0.03, 128, 64, T=6, block=24,
            recenter_every=-1))
        b = np.asarray(disparity_refine_pallas(
            disp0, iL, iR, m, iters, 0.03, 128, 64, T=6, block=32,
            cv_dtype="bfloat16", recenter_every=-1))
        vb = (a != NOMATCH) & (b != NOMATCH)
        agree_valid = float(((a != NOMATCH) == (b != NOMATCH)).mean())
        diff = np.abs(np.where(vb, a - b, 0.0))
        q = np.percentile(diff, [50, 90, 99, 99.9])
        log(f"iters={iters}: valid-agree={agree_valid:.6f} "
            f"p50={q[0]:.4f} p90={q[1]:.4f} p99={q[2]:.4f} "
            f"p99.9={q[3]:.4f} max={diff.max():.3f} "
            f"frac>0.25={float((diff > 0.25).mean()):.5f}")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
