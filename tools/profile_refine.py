"""Fine-grained refine profiling: cost-volume build vs window gather vs
per-iteration loop cost, at the finest-level workload shape.

Run via tools/tpu_run.py (single TPU client at a time).
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
    from reconstruction_tpu.stereo.margins import find_margin
    from reconstruction_tpu.stereo.refine import (_banded_cost_volume,
                                                  disparity_refine)

    rng = np.random.default_rng(0)
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

    def t(name, fn, reps=3):
        out = fn()
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        leaf = jax.tree_util.tree_leaves(out)[0]
        print(f"{name:<28} min {min(ts)*1e3:8.1f} ms   "
              f"(checksum {float(jnp.asarray(leaf).astype(jnp.float32).sum()):.3e})",
              flush=True)
        return out

    print("devices:", jax.devices(), flush=True)

    t("banded_cost_volume", lambda: _banded_cost_volume(iL, iR, dj, 128, 64))
    for iters in (6, 30, 120):
        t(f"refine_xla_{iters}",
          lambda n=iters: disparity_refine(dj, iL, iR, m, n))
    # slope: per-iteration cost = (t120 - t6) / 114


if __name__ == "__main__":
    main()
