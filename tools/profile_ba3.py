"""Incremental-stage timing of the REAL ba_blocks body (the parts sum
to ~8 ms standalone but the full program runs ~32 ms — find the
boundary that inflates).

Usage: python tools/tpu_run.py tools/profile_ba3.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[ba3 +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import importlib

    sys.path.insert(0, "/root/repo")
    import bench as benchmod
    BA = importlib.import_module('reconstruction_tpu.ba.bundle_adjust')

    log(f"backend ready: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    C, M, O = 16, 1 << 16, 8
    N = M * O
    K = np.tile(np.array([[1000.0, 0, 640], [0, 1000, 960], [0, 0, 1]],
                         np.float32), (C, 1, 1))
    Rt0 = np.tile(np.hstack([np.eye(3), [[0], [0], [8.0]]]).astype(np.float32),
                  (C, 1, 1))
    prob = BA.BAProblem(
        K=jnp.asarray(K), Rt0=jnp.asarray(Rt0),
        points0=jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32)),
        obs_uv=jnp.asarray(rng.uniform(0, 1000, (M, O, 2)).astype(np.float32)),
        obs_cam=jnp.asarray(rng.integers(0, C, (M, O)).astype(np.int32)),
        obs_ok=jnp.asarray(np.ones((M, O), bool)))
    poses0 = jnp.zeros((C, 6), jnp.float32)
    pts0 = prob.points0

    def blocks_upto(stage):
        def body(points):
            poses = poses0
            huber_delta = 2.0
            cam = prob.obs_cam.reshape(N)
            ok = prob.obs_ok.reshape(N).astype(poses.dtype)
            uv = prob.obs_uv.reshape(N, 2)
            oh, K_o, Rt_o, pose_o = BA._gather_obs_params(
                prob, poses, cam, C)
            X_o = jnp.broadcast_to(points[:, None, :],
                                   (M, O, 3)).reshape(N, 3)
            r, Jc, Jp = jax.vmap(BA._obs_jacobians)(K_o, Rt_o, pose_o,
                                                    X_o, uv)
            w = jax.vmap(BA._huber_weight,
                         in_axes=(0, None))(r, huber_delta) * ok
            r = r * w[:, None]
            Jc = Jc * w[:, None, None]
            Jp = Jp * w[:, None, None]
            acc = r.sum() * 1e-20
            if stage >= 1:
                Jp_m = Jp.reshape(M, O * 2, 3)
                r_m = r.reshape(M, O * 2)
                Hpp = jnp.einsum("mai,maj->mij", Jp_m, Jp_m)
                b_p = -jnp.einsum("mai,ma->mi", Jp_m, r_m)
                acc = acc + Hpp.sum() * 1e-20 + b_p.sum() * 1e-20
            if stage >= 2:
                Gcc = jnp.einsum("nki,nkj->nij", Jc, Jc).reshape(N, 36)
                Hcc = (oh.T @ Gcc).reshape(C, 6, 6)
                gc = jnp.einsum("nki,nk->ni", Jc, r)
                b_c = -(oh.T @ gc).reshape(C, 6)
                acc = acc + Hcc.sum() * 1e-20 + b_c.sum() * 1e-20
            if stage >= 3:
                Hcp = jnp.einsum("nki,nkj->nij", Jc, Jp).reshape(M, O, 18)
                oh_m = oh.reshape(M, O, C)
                W = jnp.einsum("moc,moe->mce", oh_m, Hcp).reshape(
                    M, C, 6, 3)
                acc = acc + W.sum() * 1e-20
            if stage >= 4:
                Hpp_reg = Hpp + 1e-6 * jnp.eye(3)
                Hpp_inv = BA._inv3x3(Hpp_reg)
                WHinv = jnp.einsum("mcij,mjk->mcik", W, Hpp_inv)
                A2 = WHinv.transpose(0, 3, 1, 2).reshape(M * 3, C * 6)
                B2 = W.transpose(0, 3, 1, 2).reshape(M * 3, C * 6)
                S = A2.T @ B2
                b_red = jnp.einsum("mcik,mk->ci", WHinv, b_p)
                acc = acc + S[0, 0] * 1e-20 + b_red.sum() * 1e-20
            return points + acc
        return body

    for stage in range(5):
        def make(n, stage=stage):
            body = blocks_upto(stage)

            @jax.jit
            def f():
                def it(i, x):
                    return body(x)
                return jax.lax.fori_loop(0, n, it, pts0)[0, 0]
            return f
        t = benchmod._time_chained(make, 1, 5)
        log(f"upto_stage_{stage}: {t * 1e3:.1f} ms")
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
