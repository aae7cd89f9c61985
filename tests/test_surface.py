"""Surface-layer tests: Poisson + marching tets recover a sphere; trim,
island removal, hole closing, smoothing behave."""

import numpy as np
import jax.numpy as jnp

from reconstruction_tpu.surface.poisson import poisson_reconstruct
from reconstruction_tpu.surface.marching import marching_tetrahedra
from reconstruction_tpu.surface.mesh import (
    clean_mesh, close_holes, density_trim, laplacian_smooth,
    remove_small_components, vertex_density, boundary_loops)


def _sphere_cloud(rng, n=20000, r=1.0, noise=0.0):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v * (r + rng.normal(scale=noise, size=(n, 1)))
    return pts.astype(np.float32), v.astype(np.float32)


def test_marching_tets_sphere_sdf():
    """Extract a sphere from its analytic SDF; check radius accuracy and
    watertightness."""
    R = 48
    g = np.arange(R) - (R - 1) / 2
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - 15.0
    verts, faces = marching_tetrahedra(sdf, 0.0)
    assert len(verts) > 500 and len(faces) > 1000
    center = np.array([(R - 1) / 2] * 3)
    rad = np.linalg.norm(verts - center, axis=1)
    assert abs(rad.mean() - 15.0) < 0.1
    assert rad.std() < 0.1
    # watertight: no boundary edges
    assert len(boundary_loops(faces)) == 0


def test_poisson_sphere(rng):
    pts, nrm = _sphere_cloud(rng, n=20000)
    valid = np.ones(len(pts), bool)
    res = poisson_reconstruct(jnp.asarray(pts), jnp.asarray(nrm),
                              jnp.asarray(valid), resolution=64, cycles=6)
    chi = np.asarray(res.chi)
    assert np.isfinite(chi).all()
    verts, faces = marching_tetrahedra(chi, float(res.iso),
                                       origin=np.asarray(res.origin),
                                       spacing=float(res.spacing))
    assert len(verts) > 1000
    rad = np.linalg.norm(verts, axis=1)
    # keep the main shell (distant box-boundary artifacts may exist)
    shell = rad[(rad > 0.5) & (rad < 1.5)]
    assert len(shell) > 0.8 * len(rad)
    assert abs(np.median(shell) - 1.0) < 0.08
    assert shell.std() < 0.08


def test_density_trim_and_components(rng):
    pts, nrm = _sphere_cloud(rng, n=15000)
    valid = np.ones(len(pts), bool)
    res = poisson_reconstruct(jnp.asarray(pts), jnp.asarray(nrm),
                              jnp.asarray(valid), resolution=64, cycles=6)
    verts, faces = marching_tetrahedra(np.asarray(res.chi), float(res.iso),
                                       origin=np.asarray(res.origin),
                                       spacing=float(res.spacing))
    vg = (verts - np.asarray(res.origin)) / float(res.spacing)
    dens = vertex_density(np.asarray(res.density), vg)
    v2, f2 = density_trim(verts, faces, dens, quantile=0.05)
    assert len(f2) <= len(faces)
    v3, f3 = remove_small_components(v2, f2, min_diag_frac=0.2)
    rad = np.linalg.norm(v3, axis=1)
    assert (np.abs(rad - 1.0) < 0.3).mean() > 0.99  # only the shell remains


def test_clean_mesh_removes_dupes():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
    faces = np.array([[0, 1, 2], [2, 1, 0], [1, 2, 3], [1, 1, 2]], np.int32)
    v, f = clean_mesh(verts, faces)
    assert len(f) == 2


def test_close_holes_small_loop():
    # a square with one triangle missing -> one 3-edge hole? build a fan
    # with a missing wedge: hexagon around center, drop one face
    n = 6
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rim = np.column_stack([np.cos(ang), np.sin(ang), np.zeros(n)])
    verts = np.vstack([[0, 0, 0], rim])
    faces = np.array([[0, 1 + i, 1 + (i + 1) % n] for i in range(n)], np.int32)
    holey = faces[:-1]
    loops = boundary_loops(holey)
    v2, f2 = close_holes(verts, holey, max_edges=30)
    assert len(boundary_loops(f2)) < len(loops) or len(f2) > len(holey)


def test_laplacian_smooth_shrinks_noise(rng):
    pts, nrm = _sphere_cloud(rng, n=15000)
    valid = np.ones(len(pts), bool)
    res = poisson_reconstruct(jnp.asarray(pts), jnp.asarray(nrm),
                              jnp.asarray(valid), resolution=48, cycles=6)
    verts, faces = marching_tetrahedra(np.asarray(res.chi), float(res.iso),
                                       origin=np.asarray(res.origin),
                                       spacing=float(res.spacing))
    verts, faces = remove_small_components(verts, faces, 0.3)
    rad0 = np.linalg.norm(verts, axis=1)
    sm = laplacian_smooth(verts, faces, iterations=5, cotangent=True)
    rad1 = np.linalg.norm(sm, axis=1)
    assert rad1.std() <= rad0.std() * 1.05
    assert np.isfinite(sm).all()
