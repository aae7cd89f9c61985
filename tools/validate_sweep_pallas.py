"""On-chip validation + timing of the fused Pallas NCC sweep.

Compares against the XLA sweep at the kernels-phase shape (1920x1280,
64 uniform shifts) and times both via chained two-point differencing.

Usage: python tools/tpu_run.py tools/validate_sweep_pallas.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[sweep +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench as benchmod
    from reconstruction_tpu.stereo.matching import ncc_sweep_match
    from reconstruction_tpu.ops.ncc_sweep_pallas import ncc_sweep_match_pallas

    d = jax.devices()[0]
    log(f"backend ready: {d.device_kind}")

    H, W = 1920, 1280
    rng = np.random.default_rng(7)
    imgL, imgR, mask = benchmod.synth_pair(H, W, rng)
    valid = mask > 127
    nsh = 64
    xg = jnp.arange(W, dtype=jnp.int32)[None, :]
    lo = jnp.broadcast_to(xg, (H, W))
    hi = jnp.minimum(lo + nsh - 1, W - 1)
    iL, iR = jnp.asarray(imgL), jnp.asarray(imgR)
    vj = jnp.asarray(valid)

    t = time.perf_counter()
    ref = ncc_sweep_match(iL, iR, vj, vj, lo, hi, 2)
    rd = np.asarray(ref.disparity)
    log(f"xla sweep + fetch: {time.perf_counter() - t:.2f}s")

    t = time.perf_counter()
    out = ncc_sweep_match_pallas(iL, iR, vj, vj, lo, hi, 2,
                                 pad_shift=128, block=16)
    od = np.asarray(out.disparity)
    log(f"pallas sweep + fetch: {time.perf_counter() - t:.2f}s")
    eq = (rd == od).mean()
    sc = np.isclose(np.asarray(ref.score), np.asarray(out.score),
                    atol=1e-3).mean()
    log(f"disp equal: {eq:.6f}  score close: {sc:.6f}")

    def make_loop(fn):
        def make(n):
            @jax.jit
            def f():
                def body(i, acc):
                    r = fn(iL + acc * 1e-30, iR, vj, vj, lo, hi, 2)
                    return acc + r.disparity[0, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return f
        return make

    t_x = benchmod._time_chained(make_loop(ncc_sweep_match), 1, 5)
    log(f"xla sweep chained: {t_x*1e3:.1f} ms")
    t_p = benchmod._time_chained(make_loop(
        lambda *a: ncc_sweep_match_pallas(*a, pad_shift=128, block=16)),
        1, 5)
    log(f"pallas sweep chained: {t_p*1e3:.1f} ms  (speedup {t_x/t_p:.1f}x)")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
