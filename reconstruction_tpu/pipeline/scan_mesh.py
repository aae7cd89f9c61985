"""Per-pair scan meshes (the reference's per-pair Poisson path).

`CCloudOptimization::filter` meshes EACH pair's filtered cloud
(`system("mesh.bat")`: Poisson depth 9 + SurfaceTrimmer + dedup,
`CCloudOptimization.cpp:125-126`) and recolors the trimmed mesh once per
camera of the pair (`:127-143`), producing `color_<pair>_{0,1}.ply` scan
files that feed TextureStitcher.  The in-process equivalent: per-pair
Poisson -> marching tets -> density trim -> cleanup -> single-view
recolor, written as BGR binary PLYs when `isoutput` is set.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from reconstruction_tpu.config import ReconstructionConfig
from reconstruction_tpu.io.ply import write_ply
from reconstruction_tpu.surface.marching import marching_tetrahedra
from reconstruction_tpu.surface.mesh import (
    clean_mesh, density_trim, remove_small_components, vertex_density)
from reconstruction_tpu.surface.poisson import poisson_reconstruct
from reconstruction_tpu.surface.texture import texture_single_view


def pair_scan_mesh(
    cfg: ReconstructionConfig,
    xyz: np.ndarray,
    normals: np.ndarray,
    pair_index: int,
    P0_world: np.ndarray,
    P1_world: np.ndarray,
    image0: np.ndarray,
    image1: np.ndarray,
    out_dir: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Mesh one pair's filtered cloud and recolor from both cameras.

    Returns (verts, faces, colors0, colors1); writes
    `color_<pair>_{0,1}.ply` under out_dir when given (the reference's
    `tmp/` scan artifacts)."""
    valid = jnp.asarray(np.ones(len(xyz), bool))
    pair_res = cfg.surface.pair_grid_resolution or cfg.surface.grid_resolution
    res = poisson_reconstruct(
        jnp.asarray(xyz, jnp.float32), jnp.asarray(normals, jnp.float32),
        valid, resolution=pair_res,
        cycles=cfg.surface.mg_cycles, point_weight=cfg.surface.point_weight)
    verts, faces = marching_tetrahedra(
        np.asarray(res.chi), float(res.iso),
        origin=np.asarray(res.origin), spacing=float(res.spacing))
    vg = (verts - np.asarray(res.origin)) / float(res.spacing)
    dens = vertex_density(np.asarray(res.density), vg)
    verts, faces = density_trim(verts, faces, dens,
                                quantile=cfg.surface.trim_quantile,
                                smooth_iters=cfg.surface.trim_smooth_iters)
    verts, faces = remove_small_components(
        verts, faces, cfg.surface.min_component_diag_frac)
    verts, faces = clean_mesh(verts, faces)

    colors0 = texture_single_view(verts, P0_world, image0)
    colors1 = texture_single_view(verts, P1_world, image1)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        write_ply(os.path.join(out_dir, f"color_{pair_index}_0.ply"),
                  verts, colors=colors0, faces=faces, color_order="bgr")
        write_ply(os.path.join(out_dir, f"color_{pair_index}_1.ply"),
                  verts, colors=colors1, faces=faces, color_order="bgr")
    return verts, faces, colors0, colors1
