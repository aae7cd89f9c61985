"""On-chip A/B of the Pallas NCC sweep shift modes at the bench shape
(1920x1280, 64 shifts): "dynamic" (per-shift dynamic rotates, ~log2(P)
conditional rotate stages per plane per shift) vs "increment" (carried
planes + static roll-by-1; ONE dynamic rotate per plane at loop entry).

Both the XLA sweep and the dynamic Pallas kernel measured 7.2-7.6 ms /
64 shifts (tools/validate_mxu_sweep.py r5) — consistent with the rotate
stages dominating the op stream; this measures how much of that the
static-roll formulation recovers.

Run: python tools/tpu_run.py tools/ab_sweep_increment.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(msg):
    print(f"[abinc +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from reconstruction_tpu.stereo.matching import ncc_sweep_match
    from reconstruction_tpu.ops.ncc_sweep_pallas import ncc_sweep_match_pallas
    from reconstruction_tpu.core.pyramid import quantize_u8
    from reconstruction_tpu.utils.timing import block_ready
    import bench as benchmod

    log(f"backend ready: {jax.devices()[0].device_kind}")
    H, W = 1280, 1920
    S = 64
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H // 8, W // 8, 3))
    up = np.kron(base, np.ones((8, 8, 1))) + rng.uniform(0, 30, (H, W, 3))
    iL = quantize_u8(jnp.asarray(np.clip(up, 0, 255).astype(np.float32)))
    up2 = np.roll(np.asarray(iL), 7, axis=1) + rng.uniform(0, 5, (H, W, 3))
    iR = quantize_u8(jnp.asarray(np.clip(up2, 0, 255).astype(np.float32)))
    vR = jnp.ones((H, W), bool)
    act = jnp.ones((H, W), bool)
    x = np.arange(W, dtype=np.int32)[None, :]
    lo = jnp.asarray(np.clip(np.broadcast_to(x, (H, W)), 0, W - 1))
    hi = jnp.asarray(np.clip(x + S - 1, 0, W - 1) * np.ones((H, 1), np.int32))
    rest = (iR, vR, act, lo, hi, 2)

    def timed(tag, fn, reps=3):
        out = fn(jnp.float32(0))
        block_ready(out.disparity)
        d = np.asarray(out.disparity)

        def make_loop(n):
            @jax.jit
            def f():
                def body(i, acc):
                    o = fn(acc * 1e-30)
                    return acc + o.disparity[0, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return f

        t = benchmod._time_chained(make_loop, 1, reps)
        log(f"{tag}: {t * 1e3:.2f} ms")
        return d, t

    d_ref, t_ref = timed("xla depth-1",
                         lambda eps: ncc_sweep_match(iL + eps, *rest))
    for mode in ("dynamic", "increment"):
        try:
            d, t = timed(f"pallas {mode}",
                         lambda eps, m=mode: ncc_sweep_match_pallas(
                             iL + eps, *rest, shift_mode=m))
            eq = np.array_equal(d_ref, d)
            log(f"pallas {mode} equal: {eq}"
                + ("" if eq else f"  mismatch {np.mean(d_ref != d):.2e}"))
        except Exception as e:  # noqa: BLE001 — Mosaic lowering risk
            log(f"pallas {mode} FAILED {type(e).__name__}: {str(e)[:300]}")
    log("DONE")


if __name__ == "__main__":
    main()
