"""Cloud-layer tests: neighbor search vs brute force, SOR, normals, MLS."""

import numpy as np
import jax.numpy as jnp

from reconstruction_tpu.cloud.neighbors import build_grid, gather_neighbors
from reconstruction_tpu.cloud.filters import sor_filter
from reconstruction_tpu.cloud.normals import (
    estimate_normals, smallest_eigenvector_3x3)
from reconstruction_tpu.cloud.mls import mls_smooth


def _surface_cloud(rng, n=3000, noise=0.0):
    """Points on a paraboloid z = 0.1(x^2+y^2) with optional noise."""
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 0.1 * (xy[:, 0] ** 2 + xy[:, 1] ** 2)
    pts = np.column_stack([xy, z + rng.normal(scale=noise, size=n)])
    return pts.astype(np.float32)


def test_gather_neighbors_vs_bruteforce(rng):
    pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    valid = np.ones(500, bool)
    radius = 0.25
    grid = build_grid(jnp.asarray(pts), jnp.asarray(valid), jnp.float32(radius))
    nb = gather_neighbors(grid, jnp.asarray(pts), jnp.asarray(valid),
                          radius=radius, per_cell=32, chunk=128,
                          exclude_self=True)
    ok = np.asarray(nb.ok)
    idx = np.asarray(nb.idx)
    d2 = pts[:, None, :] - pts[None, :, :]
    D2 = (d2 ** 2).sum(-1)
    for i in range(0, 500, 37):
        want = set(np.nonzero((D2[i] <= radius ** 2))[0]) - {i}
        got = set(idx[i][ok[i]].tolist())
        assert got == want, (i, got ^ want)


def test_eigen3x3_matches_numpy(rng):
    for _ in range(50):
        M = rng.normal(size=(3, 3))
        A = (M @ M.T).astype(np.float32)
        lam, v = smallest_eigenvector_3x3(jnp.asarray(A)[None])
        w_np, v_np = np.linalg.eigh(A)
        np.testing.assert_allclose(float(lam[0]), w_np[0],
                                   atol=1e-3 * max(1, abs(w_np).max()))
        cosang = abs(float(np.dot(np.asarray(v)[0], v_np[:, 0])))
        assert cosang > 0.999, cosang


def test_sor_removes_outliers(rng):
    pts = _surface_cloud(rng, 4000, noise=0.005)
    outliers = rng.uniform(-2, 2, size=(40, 3)).astype(np.float32)
    outliers[:, 2] += 5.0  # far off the surface
    allp = np.vstack([pts, outliers])
    valid = np.ones(len(allp), bool)
    keep = np.asarray(sor_filter(jnp.asarray(allp), jnp.asarray(valid),
                                 mean_k=30, std_thresh=1.0, chunk=512))
    # most outliers killed, most surface kept
    assert keep[:4000].mean() > 0.9
    assert keep[4000:].mean() < 0.2


def test_normals_on_plane(rng):
    xy = rng.uniform(-1, 1, size=(2000, 2))
    pts = np.column_stack([xy, 0.2 * xy[:, 0] + 0.1 * xy[:, 1]]).astype(np.float32)
    valid = np.ones(2000, bool)
    vp = np.array([0.0, 0.0, 100.0], np.float32)
    n = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(valid),
                                    radius=0.3, viewpoint=jnp.asarray(vp),
                                    chunk=512))
    true_n = np.array([-0.2, -0.1, 1.0])
    true_n /= np.linalg.norm(true_n)
    cos = n @ true_n
    assert (cos > 0.99).mean() > 0.95
    assert (n[:, 2] > 0).all()  # flipped toward viewpoint


def test_mls_denoises(rng):
    pts = _surface_cloud(rng, 4000, noise=0.02)
    valid = np.ones(len(pts), bool)
    vp = jnp.asarray(np.array([0, 0, 100.0], np.float32))
    normals0 = estimate_normals(jnp.asarray(pts), jnp.asarray(valid),
                                radius=0.3, viewpoint=vp, chunk=512)
    sm, n, ok = mls_smooth(jnp.asarray(pts), jnp.asarray(valid), 0.3,
                           normals0, chunk=512)
    sm, ok = np.asarray(sm), np.asarray(ok)
    assert ok.mean() > 0.95
    def resid(p):
        return p[:, 2] - 0.1 * (p[:, 0] ** 2 + p[:, 1] ** 2)
    r_before = np.abs(resid(pts[ok])).mean()
    r_after = np.abs(resid(sm[ok])).mean()
    assert r_after < 0.6 * r_before, (r_before, r_after)
