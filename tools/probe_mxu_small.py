"""Small-shape on-chip probe of the MXU sweep kernel — fast compile
round trips for Mosaic lowering iteration (full-shape timing lives in
tools/validate_mxu_sweep.py).

    python tools/tpu_run.py tools/probe_mxu_small.py
"""

from __future__ import annotations

import os
import sys
import time
os.environ["JAX_TRACEBACK_FILTERING"] = "off"

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from reconstruction_tpu.stereo.matching import ncc_sweep_match
    from reconstruction_tpu.ops.ncc_sweep_mxu import ncc_sweep_match_mxu
    from reconstruction_tpu.core.pyramid import quantize_u8

    print(f"backend: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(3)
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iL = quantize_u8(jnp.asarray(
        rng.uniform(0, 255, (H, W, 3)).astype(np.float32)))
    iR = quantize_u8(jnp.asarray(
        rng.uniform(0, 255, (H, W, 3)).astype(np.float32)))
    vR = jnp.asarray(rng.uniform(size=(H, W)) > 0.1)
    act = jnp.asarray(rng.uniform(size=(H, W)) > 0.3)
    x = np.arange(W)[None, :]
    lo = jnp.asarray(np.clip(x + rng.integers(-9, 0, (H, W)), 0,
                             W - 1).astype(np.int32))
    hi = jnp.asarray(np.clip(np.asarray(lo) + rng.integers(0, 13, (H, W)),
                             0, W - 1).astype(np.int32))

    ref = ncc_sweep_match(iL, iR, vR, act, lo, hi, 2)
    d_ref = np.asarray(ref.disparity)
    print("xla ok", flush=True)
    t0 = time.perf_counter()
    try:
        got = ncc_sweep_match_mxu(iL, iR, vR, act, lo, hi, 2)
    except Exception as e:
        import traceback
        print(f"mxu FAILED ({time.perf_counter()-t0:.1f}s): "
              f"{type(e).__name__}: {str(e)[:2000]}", flush=True)
        traceback.print_exc()
        return 1
    print(f"mxu compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
    eq = np.array_equal(d_ref, np.asarray(got.disparity))
    print(f"equal: {eq}", flush=True)
    if not eq:
        diff = d_ref != np.asarray(got.disparity)
        print(f"mismatch frac {diff.mean():.3e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
