"""Kernel-level roofline benchmark (BASELINE.md: NCC cost-volume and BA
Schur kernels reported against speed-of-light HBM bandwidth).

Prints one JSON line per kernel with achieved GFLOP/s, HBM GB/s, and
utilization vs the v5e roofline.  Run via tools/tpu_run.py.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _time(fn, reps=5):
    out = fn()
    import jax
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from reconstruction_tpu.stereo.matching import ncc_sweep_match
    from reconstruction_tpu.ba.bundle_adjust import BAProblem, ba_blocks
    from reconstruction_tpu.utils.profiling import (
        ncc_sweep_cost, schur_cost)

    rng = np.random.default_rng(0)

    # --- NCC sweep at the finest myself shape, 128-shift range
    H, W, S = 1920, 1280, 128
    imgL = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    imgR = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    validR = jnp.asarray(np.ones((H, W), bool))
    active = jnp.asarray(np.ones((H, W), bool))
    x = np.arange(W, dtype=np.int32)[None, :].repeat(H, 0)
    lo = jnp.asarray(np.maximum(x - S // 2, 0))
    hi = jnp.asarray(np.minimum(x + S // 2 - 1, W - 1))

    dt = _time(lambda: ncc_sweep_match(imgL, imgR, validR, active, lo, hi,
                                       radius=2).disparity)
    cost = ncc_sweep_cost(H, W, 3, 2, S)
    util = cost.utilization(dt, "v5e")
    print(json.dumps({"kernel": "ncc_sweep", "seconds": round(dt, 4),
                      "shifts": S, **{k: round(v, 3) if isinstance(v, float)
                                      else v for k, v in util.items()}}))

    # --- BA Schur block assembly + reduction
    C, M, O = 32, 20000, 6
    K = np.tile(np.array([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]],
                         np.float32), (C, 1, 1))
    Rt0 = np.tile(np.hstack([np.eye(3), [[0], [0], [10.0]]]).astype(np.float32),
                  (C, 1, 1))
    prob = BAProblem(
        K=jnp.asarray(K), Rt0=jnp.asarray(Rt0),
        points0=jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32)),
        obs_uv=jnp.asarray(rng.uniform(0, 1000, (M, O, 2)).astype(np.float32)),
        obs_cam=jnp.asarray(rng.integers(0, C, (M, O)).astype(np.int32)),
        obs_ok=jnp.asarray(np.ones((M, O), bool)),
    )
    poses = jnp.zeros((C, 6))
    dt = _time(lambda: ba_blocks(prob, poses, prob.points0, C)[0])
    cost = schur_cost(M, O, C)
    util = cost.utilization(dt, "v5e")
    gflops = cost.flops / dt / 1e9
    print(json.dumps({"kernel": "ba_schur", "seconds": round(dt, 4),
                      "points": M, "cams": C,
                      "gflops_per_s": round(gflops, 1),
                      **{k: round(v, 3) if isinstance(v, float) else v
                         for k, v in util.items()}}))


if __name__ == "__main__":
    main()
