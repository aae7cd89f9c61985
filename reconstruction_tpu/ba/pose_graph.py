"""Temporal pose-graph optimization for video sequences.

North-star capability ("64-view video sequence ... per-frame
reconstruction with temporal pose-graph", BASELINE.json configs[4]):
nodes are per-frame rig poses, edges are relative SE(3) measurements
(odometry between consecutive frames and loop closures); Gauss-Newton on
the residual  r_ij = Log( Z_ij^-1 (T_i^-1 T_j) )  with small-angle
right-perturbation Jacobians from autodiff.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """xi = (omega, tau) -> 4x4 transform.

    Autodiff-safe at xi = 0 (GN linearizes there): built from the
    unnormalized skew matrix with smooth sinc-style coefficients, no
    ||omega|| normalization (cf. ba.bundle_adjust._rodrigues)."""
    w, v = xi[:3], xi[3:]
    th2 = jnp.dot(w, w)
    th = jnp.sqrt(th2 + 1e-12)
    Wx = jnp.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    A = jnp.sin(th) / th
    B = (1 - jnp.cos(th)) / (th2 + 1e-12)
    C = (1 - A) / (th2 + 1e-12)
    R = jnp.eye(3) + A * Wx + B * (Wx @ Wx)
    V = jnp.eye(3) + B * Wx + C * (Wx @ Wx)
    T = jnp.eye(4)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(V @ v)
    return T


def _log_so3(R: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip((jnp.trace(R) - 1) / 2, -1 + 1e-7, 1 - 1e-7)
    th = jnp.arccos(c)
    w = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return w * th / (2 * jnp.sin(th) + 1e-12)


def _residual(Ti, Tj, Zij):
    """6-vector error of edge (i, j)."""
    E = jnp.linalg.inv(Zij) @ jnp.linalg.inv(Ti) @ Tj
    rw = _log_so3(E[:3, :3])
    rt = E[:3, 3]
    return jnp.concatenate([rw, rt])


class PoseGraph(NamedTuple):
    """edges_ij: (E, 2) int32 node indices; Z: (E, 4, 4) measurements."""

    edges: jnp.ndarray
    Z: jnp.ndarray
    num_nodes: int


@partial(jax.jit, static_argnames=("num_nodes", "iterations"))
def pose_graph_optimize(
    edges: jnp.ndarray,
    Z: jnp.ndarray,
    T_init: jnp.ndarray,
    num_nodes: int,
    iterations: int = 20,
    damping: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GN over all node poses (node 0 pinned).  Returns (T (N,4,4), costs)."""
    N = num_nodes

    def edge_res(xi_all, e, Zij):
        Ti = _exp_se3(xi_all[e[0]]) @ T_init[e[0]]
        Tj = _exp_se3(xi_all[e[1]]) @ T_init[e[1]]
        return _residual(Ti, Tj, Zij)

    def total(xi_all):
        r = jax.vmap(lambda e, z: edge_res(xi_all, e, z))(edges, Z)
        return r.reshape(-1)

    xi = jnp.zeros((N, 6))
    costs = []
    for _ in range(iterations):
        r = total(xi)
        J = jax.jacfwd(total)(xi).reshape(r.shape[0], N * 6)
        H = J.T @ J + damping * jnp.eye(N * 6)
        g = -J.T @ r
        # pin node 0 (gauge)
        mask = jnp.arange(N * 6) >= 6
        H = jnp.where(mask[:, None] & mask[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(mask, 0.0, 1.0))
        g = jnp.where(mask, g, 0.0)
        dx = jnp.linalg.solve(H, g).reshape(N, 6)
        xi = xi + dx
        costs.append(0.5 * jnp.sum(r ** 2))
    T_out = jax.vmap(lambda x, T0: _exp_se3(x) @ T0)(xi, T_init)
    return T_out, jnp.stack(costs)
