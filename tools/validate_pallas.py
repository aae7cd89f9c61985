"""TPU validation + micro-benchmark of the Pallas refine kernel.

Runs refine XLA vs Pallas on a mid-size case: checks numerical agreement
and reports per-implementation wall time at the finest-level workload
shape.  Run via tools/tpu_run.py (single TPU client at a time).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from reconstruction_tpu.config import NOMATCH
    from reconstruction_tpu.ops.refine_pallas import disparity_refine_pallas
    from reconstruction_tpu.stereo.margins import find_margin
    from reconstruction_tpu.stereo.refine import disparity_refine

    rng = np.random.default_rng(0)

    # small correctness case
    H, W = 128, 256
    imgL = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    imgR = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    disp = rng.integers(-2, 3, (H, W)).astype(np.float32)
    valid = np.zeros((H, W), bool)
    valid[4:-4, 4:-4] = True
    disp[~valid] = NOMATCH
    m = find_margin(jnp.asarray(valid), 2)
    a = np.asarray(disparity_refine(jnp.asarray(disp), jnp.asarray(imgL),
                                    jnp.asarray(imgR), m, iterations=30,
                                    s_cap=64, band=32))
    b = np.asarray(disparity_refine_pallas(
        jnp.asarray(disp), jnp.asarray(imgL), jnp.asarray(imgR), m,
        iterations=30, s_cap=64, band=32, T=6, block=32))
    close = np.isclose(a, b, atol=1e-4)
    print(f"[validate] agreement: {close.mean():.6f}", flush=True)
    assert close.mean() > 0.999, "Pallas kernel disagrees with XLA path"

    # finest-level-shape timing
    H, W = 1920, 1280
    imgL = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    imgR = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    disp = (40 + 10 * rng.standard_normal((H, W))).astype(np.float32)
    valid = np.zeros((H, W), bool)
    valid[8:-8, 8:-8] = True
    disp[~valid] = NOMATCH
    m = find_margin(jnp.asarray(valid), 2)
    dj = jnp.asarray(disp)
    iL = jnp.asarray(imgL)
    iR = jnp.asarray(imgR)

    for name, fn in (
        ("xla", lambda: disparity_refine(dj, iL, iR, m, 120)),
        ("pallas", lambda: disparity_refine_pallas(dj, iL, iR, m, 120)),
    ):
        out = fn()
        out.block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(f"[validate] refine_{name} 120 iters @1920x1280: "
              f"min {min(ts):.3f}s (all {['%.2f' % t for t in ts]})",
              flush=True)


if __name__ == "__main__":
    main()
