"""Cross-process persistent-cache repro for a FULL stereo level program
(the standalone pallas refine kernel HITS across processes — 58.5 s ->
1.4 s, tools/repro_pallas_cache.py — yet the bench's level programs
recompile in every child).

Usage: run twice via tools/tpu_run.py; compare first-call times.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[lcache +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    os.environ.setdefault("JAX_EXPLAIN_CACHE_MISSES", "true")
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench as benchmod
    from reconstruction_tpu.config import preset
    from reconstruction_tpu.core.pyramid import build_pyramid, quantize_u8
    from reconstruction_tpu.stereo.pipeline import match_one_level

    log(f"backend ready: {jax.devices()[0].device_kind}")
    cfg = preset("myself")
    W, H = cfg.finest_size
    rng = np.random.default_rng(0)
    imgL, imgR, mask = benchmod.synth_pair(H, W, rng)
    pyrL = build_pyramid(jnp.asarray(imgL), cfg.pyramid_levels)
    pyrR = build_pyramid(jnp.asarray(imgR), cfg.pyramid_levels)
    pyrM = [quantize_u8(m) for m in build_pyramid(jnp.asarray(mask),
                                                  cfg.pyramid_levels)]
    state = None
    for level in range(2):  # levels 0-1 keep the repro short
        t0 = time.perf_counter()
        state = match_one_level(
            quantize_u8(pyrL[level]), quantize_u8(pyrR[level]),
            pyrM[level], pyrM[level], state, level,
            radius=cfg.stereo.block_radius,
            offset=cfg.stereo.disparity_offset,
            ws=cfg.stereo.refine_ws,
            refine_iters=cfg.refine_iterations(level))
        float(jnp.ravel(state.disp0)[0].astype(jnp.float32))
        log(f"level {level} first-call (compile+run): "
            f"{time.perf_counter() - t0:.2f}s")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
