"""On-chip A/B of the BA W_t coupling formulations at the bench shape
(16 cams / 64k pts / 8 obs): XLA fused broadcast-reduce vs the M-tiled
Pallas contraction (ops/ba_coupling_pallas) — full ba_step chained
timing plus output parity.

Run: python tools/tpu_run.py tools/ab_ba_coupling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()


def log(msg):
    print(f"[abba +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import bench as benchmod
    import importlib

    log(f"backend ready: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    C, M, O = 16, 1 << 16, 8
    K = np.tile(np.array([[1000.0, 0, 640], [0, 1000, 960], [0, 0, 1]],
                         np.float32), (C, 1, 1))
    Rt0 = np.tile(np.hstack([np.eye(3), [[0], [0], [8.0]]]).astype(np.float32),
                  (C, 1, 1))

    pts_np = rng.normal(size=(M, 3)).astype(np.float32)
    uv_np = rng.uniform(0, 1000, (M, O, 2)).astype(np.float32)
    cam_np = rng.integers(0, C, (M, O)).astype(np.int32)

    results = {}
    for mode in ("xla", "pallas"):
        os.environ["RECON_BA_COUPLING"] = mode
        import reconstruction_tpu.ba.bundle_adjust as BA
        importlib.reload(BA)  # fresh jit cache: the knob reads at trace
        prob = BA.BAProblem(
            K=jnp.asarray(K), Rt0=jnp.asarray(Rt0),
            points0=jnp.asarray(pts_np),
            obs_uv=jnp.asarray(uv_np),
            obs_cam=jnp.asarray(cam_np),
            obs_ok=jnp.asarray(np.ones((M, O), bool)))
        poses0 = jnp.zeros((C, 6), jnp.float32)
        try:
            p1, x1, cost = BA.ba_step(prob, poses0, prob.points0, C)
            results[mode] = (np.asarray(p1), np.asarray(x1),
                             float(cost))
            log(f"{mode}: step ok, cost {float(cost):.6e}")

            def make(n):
                @jax.jit
                def f():
                    def it(i, carry):
                        poses, pts = carry
                        p, x, c = BA.ba_step(prob, poses, pts, C)
                        return (p + c * 1e-30, x)
                    p, x = jax.lax.fori_loop(0, n, it,
                                             (poses0, prob.points0))
                    return p[0, 0]
                return f

            t = benchmod._time_chained(make, 1, 5)
            log(f"{mode}: ba_step {t * 1e3:.2f} ms")
        except Exception as e:  # noqa: BLE001 — Mosaic lowering risk
            log(f"{mode} FAILED {type(e).__name__}: {str(e)[:300]}")

    if len(results) == 2:
        px, pp = results["xla"][0], results["pallas"][0]
        xx, xp = results["xla"][1], results["pallas"][1]
        log(f"pose delta max {np.abs(px - pp).max():.3e}; "
            f"point delta max {np.abs(xx - xp).max():.3e}; "
            f"cost xla {results['xla'][2]:.6e} "
            f"pallas {results['pallas'][2]:.6e}")
    log("DONE")


if __name__ == "__main__":
    main()
