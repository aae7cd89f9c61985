"""On-chip validation + timing of the MXU NCC sweep
(ops/ncc_sweep_mxu.py) against the XLA sweep and the VPU Pallas
kernel at the bench shape (1920x1280, 64 shifts).

Run via the serialized launcher:  python tools/tpu_run.py tools/validate_mxu_sweep.py

Also times the K-shift-blocked XLA sweep (sblock) at several K.
All timings use the chained two-point protocol (bench._time_chained
pattern) so relay dispatch/fence costs cancel.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from reconstruction_tpu.stereo.matching import ncc_sweep_match
    from reconstruction_tpu.ops.ncc_sweep_pallas import ncc_sweep_match_pallas
    from reconstruction_tpu.ops.ncc_sweep_mxu import ncc_sweep_match_mxu
    from reconstruction_tpu.core.pyramid import quantize_u8
    from reconstruction_tpu.utils.timing import block_ready

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

    import bench as benchmod

    def timed(tag, fn, reps=3):
        """fn(eps) must fold eps into an operand so chained iterations
        depend on each other (nothing hoists/elides)."""
        # correctness first
        out = fn(jnp.float32(0))
        block_ready(out.disparity)
        d = np.asarray(out.disparity)

        # chained on-device loop (bench._time_chained): two-point
        # differencing cancels relay dispatch + fence costs.
        def make_loop(n):
            @jax.jit
            def f():
                def body(i, acc):
                    o = fn(acc * 1e-30)
                    return acc + o.disparity[0, 0]
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))
            return f

        t = benchmod._time_chained(make_loop, 1, reps)
        print(f"{tag}: {t * 1e3:.2f} ms", flush=True)
        return d, t

    rest = (iR, vR, act, lo, hi, 2)
    d_ref, t_ref = timed(
        "xla depth-1 (sblock=1)",
        lambda eps: ncc_sweep_match(iL + eps, *rest, sblock=1))
    for K in (4, 8, 16):
        d_k, t_k = timed(
            f"xla sblock={K}",
            lambda eps, K=K: ncc_sweep_match(iL + eps, *rest, sblock=K))
        assert np.array_equal(d_ref, d_k), f"sblock={K} mismatch"
    d_p, t_p = timed(
        "pallas vpu",
        lambda eps: ncc_sweep_match_pallas(iL + eps, *rest))
    assert np.array_equal(d_ref, d_p), "pallas mismatch"
    try:
        d_m, t_m = timed(
            "pallas mxu",
            lambda eps: ncc_sweep_match_mxu(iL + eps, *rest))
        eq = np.array_equal(d_ref, d_m)
        print(f"mxu equal: {eq}", flush=True)
        if not eq:
            diff = (d_ref != d_m)
            print(f"  mismatch frac {diff.mean():.2e}", flush=True)
    except Exception as e:  # Mosaic lowering issues surface here
        print(f"mxu FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
