"""Second-level BA breakdown: Jacobian stage vs one-hot reductions vs
the Schur contraction, chained on-chip.

Usage: python tools/tpu_run.py tools/profile_ba2.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[ba2 +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench as benchmod
    import importlib
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

    cam = prob.obs_cam.reshape(N)
    uv = prob.obs_uv.reshape(N, 2)
    ok = prob.obs_ok.reshape(N).astype(jnp.float32)

    def chain(name, body):
        def make(n):
            @jax.jit
            def f():
                def it(i, x):
                    return body(x)
                return jax.lax.fori_loop(0, n, it, pts0)[0, 0]
            return f
        t = benchmod._time_chained(make, 1, 5)
        log(f"{name}: {t * 1e3:.1f} ms")

    def jac_stage(points):
        oh, K_o, Rt_o, pose_o = BA._gather_obs_params(
            prob, poses0, cam, C)
        X_o = jnp.broadcast_to(points[:, None, :], (M, O, 3)).reshape(N, 3)
        r = jax.vmap(BA._residual)(K_o, Rt_o, pose_o, X_o, uv)
        Jc = jax.vmap(BA._jac_pose)(K_o, Rt_o, pose_o, X_o, uv)
        Jp = jax.vmap(BA._jac_point)(K_o, Rt_o, pose_o, X_o, uv)
        return points + (r.sum() + Jc.sum() + Jp.sum()) * 1e-20

    chain("gather+jacobians", jac_stage)

    def gather_only(points):
        oh, K_o, Rt_o, pose_o = BA._gather_obs_params(
            prob, poses0, cam, C)
        return points + (K_o.sum() + Rt_o.sum() + pose_o.sum()) * 1e-20

    chain("gather_only", gather_only)

    def resid_only(points):
        oh, K_o, Rt_o, pose_o = BA._gather_obs_params(
            prob, poses0, cam, C)
        X_o = jnp.broadcast_to(points[:, None, :], (M, O, 3)).reshape(N, 3)
        r = jax.vmap(BA._residual)(K_o, Rt_o, pose_o, X_o, uv)
        return points + r.sum() * 1e-20

    chain("gather+residual", resid_only)

    # assembly from fixed jacobians
    rng2 = np.random.default_rng(1)
    Jc0 = jnp.asarray(rng2.normal(size=(N, 2, 6)).astype(np.float32))
    Jp0 = jnp.asarray(rng2.normal(size=(N, 2, 3)).astype(np.float32))
    r0 = jnp.asarray(rng2.normal(size=(N, 2)).astype(np.float32))
    oh0 = jax.jit(lambda: jax.nn.one_hot(cam, C, dtype=jnp.float32))()

    def assembly(points):
        Jp_m = Jp0.reshape(M, O * 2, 3)
        r_m = r0.reshape(M, O * 2)
        Hpp = jnp.einsum("mai,maj->mij", Jp_m, Jp_m)
        b_p = -jnp.einsum("mai,ma->mi", Jp_m, r_m)
        Gcc = jnp.einsum("nki,nkj->nij", Jc0, Jc0).reshape(N, 36)
        Hcc = (oh0.T @ Gcc).reshape(C, 6, 6)
        gc = jnp.einsum("nki,nk->ni", Jc0, r0)
        b_c = -(oh0.T @ gc).reshape(C, 6)
        Hcp = jnp.einsum("nki,nkj->nij", Jc0, Jp0).reshape(M, O, 18)
        oh_m = oh0.reshape(M, O, C)
        W = jnp.einsum("moc,moe->mce", oh_m, Hcp).reshape(M, C, 6, 3)
        Hpp_reg = Hpp + 1e-6 * jnp.eye(3)
        Hpp_inv = BA._inv3x3(Hpp_reg)
        WHinv = jnp.einsum("mcij,mjk->mcik", W, Hpp_inv)
        A = WHinv.transpose(0, 3, 1, 2).reshape(M * 3, C * 6)
        Bm = W.transpose(0, 3, 1, 2).reshape(M * 3, C * 6)
        S = A.T @ Bm
        b_red = jnp.einsum("mcik,mk->ci", WHinv, b_p)
        return points + (S[0, 0] + b_red.sum() + Hcc.sum()
                         + b_c.sum()) * 1e-20

    chain("assembly_from_fixed_J", assembly)

    def w_only(points):
        Hcp = jnp.einsum("nki,nkj->nij", Jc0, Jp0).reshape(M, O, 18)
        oh_m = oh0.reshape(M, O, C)
        W = jnp.einsum("moc,moe->mce", oh_m, Hcp).reshape(M, C, 6, 3)
        return points + W.sum() * 1e-20

    chain("W_build_only", w_only)

    def schur_only(points):
        W = jnp.broadcast_to(points[0, 0] * 0 + 1.0, ()) * jnp.ones(
            (M, C, 6, 3), jnp.float32)
        A = W.transpose(0, 3, 1, 2).reshape(M * 3, C * 6)
        S = A.T @ A
        return points + S[0, 0] * 1e-20

    chain("schur_matmul_only", schur_only)
    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
