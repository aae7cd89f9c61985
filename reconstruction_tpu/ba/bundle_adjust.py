"""Bundle adjustment with Schur-complement reduction.

New first-class capability (absent in the reference, which reads
calibration from file, `CManageData.cpp:45-64`; required by the
BASELINE.json north star: "pose-graph + bundle-adjustment stage ...
distributed bundle adjustment via Schur-complement reduction of
camera/point blocks over psum/all-gather collectives").

Formulation:
  * cameras: fixed K; pose perturbation (omega, tau) about a base [R|t]
    (left-multiplied SE(3) increment), 6 DoF per camera.
  * points: 3 DoF each.
  * residuals: Huber-weighted reprojection errors.
  * Gauss-Newton step: per-observation Jacobians from forward-mode
    autodiff (vmapped), assembled into 6x6 camera blocks H_cc, 3x3 point
    blocks H_pp and 6x3 couplings; the reduced camera system
      S = H_cc - sum_j H_cp,j H_pp,j^-1 H_pc,j
    is a small dense SPD matrix (6C x 6C) solved by Cholesky; point
    updates back-substitute in closed form (batched 3x3 solves).

Observations are stored grouped by point, so sharding the point axis
makes H_pp shard-local and S a pure psum reduction — the distributed
path (parallel/distributed_ba.py) reuses the same block assembly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BAProblem(NamedTuple):
    """Observations grouped by point (padded).

    K: (C, 3, 3) intrinsics.  Rt0: (C, 3, 4) base extrinsics.
    points0: (M, 3) initial points.
    obs_uv: (M, O, 2) observed pixels (O = max obs per point).
    obs_cam: (M, O) camera index per observation.
    obs_ok: (M, O) validity.
    """

    K: jnp.ndarray
    Rt0: jnp.ndarray
    points0: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_cam: jnp.ndarray
    obs_ok: jnp.ndarray


def _rodrigues(w: jnp.ndarray) -> jnp.ndarray:
    """exp of so(3), autodiff-safe at w = 0 (poses start there): uses the
    unnormalized skew matrix with smooth sinc coefficients — no division
    by ||w|| whose derivative is undefined at the origin."""
    # eps sized so denominator^2 terms in the autodiff tangents stay
    # representable in f32 (1e-24 underflows when squared).
    th2 = jnp.dot(w, w)
    th = jnp.sqrt(th2 + 1e-12)
    A = jnp.sin(th) / th
    B = (1.0 - jnp.cos(th)) / (th2 + 1e-12)
    W = jnp.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    return jnp.eye(3) + A * W + B * (W @ W)


def _project(K, Rt0, pose6, X):
    """Project point X through camera with pose perturbation pose6."""
    w, tau = pose6[:3], pose6[3:]
    R = _rodrigues(w) @ Rt0[:, :3]
    t = _rodrigues(w) @ Rt0[:, 3] + tau
    xc = R @ X + t
    uvw = K @ xc
    return uvw[:2] / uvw[2]


def _residual(K, Rt0, pose6, X, uv):
    return _project(K, Rt0, pose6, X) - uv


# Per-observation Jacobians via forward-mode autodiff.
_jac_pose = jax.jacfwd(_residual, argnums=2)
_jac_point = jax.jacfwd(_residual, argnums=3)


def _huber_weight(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    nrm = jnp.linalg.norm(r) + 1e-12
    return jnp.minimum(1.0, delta / nrm)


@partial(jax.jit, static_argnames=("num_cameras",))
def ba_blocks(
    problem: BAProblem,
    poses: jnp.ndarray,
    points: jnp.ndarray,
    num_cameras: int,
    huber_delta: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assemble GN blocks.

    Returns (S_partial (6C, 6C), b_c (6C,), Hpp (M, 3, 3), b_p (M, 3),
             Hcp (M, O, 6, 3) premultiplied terms, cost (scalar)).
    The caller psums S_partial / b_c / cost across point shards.
    """
    C = num_cameras
    M, O = problem.obs_cam.shape

    def per_obs(pid, oid):
        cam = problem.obs_cam[pid, oid]
        ok = problem.obs_ok[pid, oid]
        K = problem.K[cam]
        Rt0 = problem.Rt0[cam]
        pose = poses[cam]
        X = points[pid]
        uv = problem.obs_uv[pid, oid]
        r = _residual(K, Rt0, pose, X, uv)
        Jc = _jac_pose(K, Rt0, pose, X, uv)      # (2, 6)
        Jp = _jac_point(K, Rt0, pose, X, uv)     # (2, 3)
        w = _huber_weight(r, huber_delta) * ok
        return r * w, Jc * w, Jp * w, cam, ok

    pids = jnp.arange(M)[:, None].repeat(O, 1)
    oids = jnp.arange(O)[None, :].repeat(M, 0)
    r, Jc, Jp, cam, ok = jax.vmap(jax.vmap(per_obs))(pids, oids)
    # r (M, O, 2), Jc (M, O, 2, 6), Jp (M, O, 2, 3)

    cost = 0.5 * jnp.sum(r ** 2)

    Hpp = jnp.einsum("moki,mokj->mij", Jp, Jp)               # (M, 3, 3)
    b_p = -jnp.einsum("moki,mok->mi", Jp, r)                 # (M, 3)
    Hcp_obs = jnp.einsum("moki,mokj->moij", Jc, Jp)          # (M, O, 6, 3)

    # scatter camera blocks
    cam_oh = jax.nn.one_hot(cam, C, dtype=r.dtype)           # (M, O, C)
    Hcc = jnp.einsum("moki,mokj,moc->cij", Jc, Jc, cam_oh)   # (C, 6, 6)
    b_c = -jnp.einsum("moki,mok,moc->ci", Jc, r, cam_oh)     # (C, 6)

    # Schur reduction: S = Hcc_block_diag - sum_m W_m Hpp_m^-1 W_m^T
    # where W_m (6C, 3) stacks per-camera couplings of point m.
    lam = 1e-6
    Hpp_reg = Hpp + lam * jnp.eye(3)
    Hpp_inv = jnp.linalg.inv(Hpp_reg)

    # W per point across cameras: (M, C, 6, 3)
    W = jnp.einsum("moij,moc->mcij", Hcp_obs, cam_oh)
    WHinv = jnp.einsum("mcij,mjk->mcik", W, Hpp_inv)         # (M, C, 6, 3)
    S_red = jnp.einsum("mcik,mdjk->cidj", WHinv, W)          # (C,6,C,6)
    S = _blockdiag(Hcc) - S_red.reshape(C * 6, C * 6)
    b_red = jnp.einsum("mcik,mk->ci", WHinv, b_p)            # (C, 6)
    b = (b_c - b_red).reshape(C * 6)
    return S, b, Hpp_reg, b_p, W, cost


def _blockdiag(blocks: jnp.ndarray) -> jnp.ndarray:
    C = blocks.shape[0]
    out = jnp.zeros((C * 6, C * 6), blocks.dtype)
    for i in range(C):
        out = out.at[i * 6:(i + 1) * 6, i * 6:(i + 1) * 6].set(blocks[i])
    return out


@partial(jax.jit, static_argnames=("num_cameras", "fix_gauge",
                                   "fix_cameras"))
def ba_step(
    problem: BAProblem,
    poses: jnp.ndarray,
    points: jnp.ndarray,
    num_cameras: int,
    damping: float = 1e-3,
    huber_delta: float = 2.0,
    fix_gauge: bool = True,
    fix_cameras: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One Gauss-Newton/LM step.  Returns (poses', points', cost).

    fix_cameras=True freezes all poses (structure-only refinement —
    useful when calibration is trusted, as in the reference rig).
    """
    C = num_cameras
    S, b, Hpp, b_p, W, cost = ba_blocks(problem, poses, points, C,
                                        huber_delta)
    if fix_cameras:
        dp = jnp.linalg.solve(
            Hpp + damping * jnp.eye(3), b_p[..., None])[..., 0]
        return poses, points + dp, cost
    S = S + damping * jnp.eye(C * 6)
    if fix_gauge:
        # pin camera 0 (gauge freedom): zero its rows/cols, identity diag
        mask = jnp.arange(C * 6) >= 6
        S = jnp.where(mask[:, None] & mask[None, :], S, 0.0)
        S = S + jnp.diag(jnp.where(mask, 0.0, 1.0))
        b = jnp.where(mask, b, 0.0)
    dc = jnp.linalg.solve(S, b).reshape(C, 6)

    # Back-substitute points: Hpp dp = b_p - W^T dc(summed over cams)
    Wt_dc = jnp.einsum("mcik,ci->mk", W, dc)
    dp = jnp.linalg.solve(Hpp, (b_p - Wt_dc)[..., None])[..., 0]
    return poses + dc, points + dp, cost


@partial(jax.jit, static_argnames=("num_cameras",))
def ba_cost(problem: BAProblem, poses: jnp.ndarray, points: jnp.ndarray,
            num_cameras: int, huber_delta: float = 2.0) -> jnp.ndarray:
    M, O = problem.obs_cam.shape

    def per_obs(pid, oid):
        cam = problem.obs_cam[pid, oid]
        r = _residual(problem.K[cam], problem.Rt0[cam], poses[cam],
                      points[pid], problem.obs_uv[pid, oid])
        w = _huber_weight(r, huber_delta) * problem.obs_ok[pid, oid]
        return jnp.sum((r * w) ** 2)

    pids = jnp.arange(M)[:, None].repeat(O, 1)
    oids = jnp.arange(O)[None, :].repeat(M, 0)
    return 0.5 * jnp.sum(jax.vmap(jax.vmap(per_obs))(pids, oids))


def bundle_adjust(
    problem: BAProblem,
    iterations: int = 10,
    damping: float = 1e-3,
    huber_delta: float = 2.0,
    fix_cameras: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Levenberg-Marquardt driver: adaptive damping with accept/reject.

    Returns (poses (C, 6), points (M, 3), accepted costs)."""
    C = problem.K.shape[0]
    poses = jnp.zeros((C, 6), problem.points0.dtype)
    points = problem.points0
    lam = damping
    cost = float(ba_cost(problem, poses, points, C, huber_delta))
    costs = [cost]
    for _ in range(iterations):
        accepted = False
        for _try in range(6):
            p2, x2, _ = ba_step(problem, poses, points, C, lam, huber_delta,
                                fix_cameras=fix_cameras)
            c2 = float(ba_cost(problem, p2, x2, C, huber_delta))
            if np.isfinite(c2) and c2 < cost:
                poses, points, cost = p2, x2, c2
                lam = max(lam * 0.5, 1e-8)
                accepted = True
                break
            lam *= 10.0
        costs.append(cost)
        if not accepted and lam > 1e8:
            break
    return poses, points, jnp.asarray(costs)


def apply_pose(Rt0: np.ndarray, pose6: np.ndarray) -> np.ndarray:
    """Compose the optimized perturbation with the base extrinsics."""
    from reconstruction_tpu.core.rectify import rodrigues_mat
    R = rodrigues_mat(np.asarray(pose6[:3], np.float64))
    out = np.zeros((3, 4))
    out[:, :3] = R @ np.asarray(Rt0)[:, :3]
    out[:, 3] = R @ np.asarray(Rt0)[:, 3] + np.asarray(pose6[3:])
    return out
