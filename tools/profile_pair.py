"""On-chip breakdown of one warm match_pair: remap, per-level match,
triangulation, and every host fetch, separately fetch-fenced — the r3
bench's warm full run spent 8.4 s/pair in the stereo span vs ~2 s of
core level-loop work, and this names the difference.

Usage: python tools/tpu_run.py tools/profile_pair.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

T0 = time.time()


def log(msg):
    print(f"[pair +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench as benchmod
    from reconstruction_tpu.config import preset
    from reconstruction_tpu.core.morphology import erode_mask, valid_mask
    from reconstruction_tpu.core.pyramid import build_pyramid, quantize_u8
    from reconstruction_tpu.core.rectify import rectify_pair
    from reconstruction_tpu.core.remap import rectify_map, remap_bilinear
    from reconstruction_tpu.stereo.pipeline import match_one_level, match_pair

    d = jax.devices()[0]
    log(f"backend ready: {d.device_kind}")

    cfg = preset("myself")
    W, H = cfg.finest_size
    cams, imgs, masks = benchmod.build_rig((W, H))
    a, b = cfg.cam_pairs[0]
    image0, image1 = imgs[a].astype(np.float32), imgs[b].astype(np.float32)
    mask0, mask1 = masks[a].astype(np.float32), masks[b].astype(np.float32)
    K0, Rt0 = cams[a]["K"], cams[a]["Rt"]
    K1, Rt1 = cams[b]["K"], cams[b]["Rt"]

    def fence(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jnp.ravel(leaf)[0].astype(jnp.float32))

    def step(name, fn):
        t = time.perf_counter()
        out = fn()
        fence(out)
        log(f"{name}: {time.perf_counter() - t:.3f}s")
        return out

    # whole warm pair twice (the second is the honest number)
    def whole():
        t = time.perf_counter()
        res = match_pair(cfg, image0, image1, mask0, mask1, K0, Rt0, K1, Rt1)
        log(f"match_pair total: {time.perf_counter() - t:.2f}s")
        return res

    whole()
    whole()

    # piecewise
    origin_size = (image0.shape[1], image0.shape[0])
    rect = rectify_pair(K0, Rt0, K1, Rt1, origin_size, cfg.finest_size)
    se = cfg.stereo.mask_erode_base * (1 << (cfg.pyramid_levels - 1))
    t = time.perf_counter()
    mx, my = rectify_map(K0, rect.R1, rect.P1_scaled, cfg.finest_size)
    im0 = remap_bilinear(jnp.asarray(image0), jnp.asarray(mx), jnp.asarray(my))
    mk0 = remap_bilinear(jnp.asarray(mask0), jnp.asarray(mx), jnp.asarray(my))
    mx, my = rectify_map(K1, rect.R2, rect.P2_scaled, cfg.finest_size)
    im1 = remap_bilinear(jnp.asarray(image1), jnp.asarray(mx), jnp.asarray(my))
    mk1 = remap_bilinear(jnp.asarray(mask1), jnp.asarray(mx), jnp.asarray(my))
    fence((im0, im1, mk0, mk1))
    log(f"remap x4 (images+masks): {time.perf_counter() - t:.3f}s")

    t = time.perf_counter()
    em0, em1 = erode_mask(mk0, se), erode_mask(mk1, se)
    p0 = build_pyramid(quantize_u8(im0), cfg.pyramid_levels)
    p1 = build_pyramid(quantize_u8(im1), cfg.pyramid_levels)
    m0 = [quantize_u8(m) for m in build_pyramid(em0, cfg.pyramid_levels)]
    m1 = [quantize_u8(m) for m in build_pyramid(em1, cfg.pyramid_levels)]
    fence((p0[-1], p1[-1], m0[-1], m1[-1]))
    log(f"erode + pyramids: {time.perf_counter() - t:.3f}s")

    state = None
    for level in range(cfg.pyramid_levels):
        t = time.perf_counter()
        state = match_one_level(
            quantize_u8(p0[level]), quantize_u8(p1[level]),
            m0[level], m1[level], state, level,
            radius=cfg.stereo.block_radius,
            offset=cfg.stereo.disparity_offset, ws=cfg.stereo.refine_ws,
            refine_iters=cfg.refine_iterations(level),
            median_iters=cfg.stereo.median_iterations,
            refine_impl=cfg.stereo.refine_impl,
            recenter_every=cfg.stereo.refine_recenter_every)
        fence(state.disp0)
        log(f"level {level}: {time.perf_counter() - t:.3f}s")

    # fetch costs, one by one
    for name, arr in (("disparity f32 9.8MB", state.disp0),
                      ("rect img u8 7MB", quantize_u8(im0)),
                      ("rect mask u8 2.4MB", quantize_u8(mk0))):
        t = time.perf_counter()
        np.asarray(arr)
        log(f"fetch {name}: {time.perf_counter() - t:.3f}s")

    from reconstruction_tpu.stereo.triangulate import disparity_to_cloud
    from reconstruction_tpu.stereo.margins import find_margin
    finest = cfg.pyramid_levels - 1
    v0 = valid_mask(m0[finest])
    mg = find_margin(v0, cfg.stereo.block_radius)
    scale = cfg.lowest_level_size[0] / origin_size[0] * (1 << finest)
    t = time.perf_counter()
    cloud = disparity_to_cloud(state.disp0, m0[finest],
                               quantize_u8(p0[finest]), rect.Q,
                               rect.R_final, rect.T_final, mg, scale,
                               erode_frac=cfg.stereo.cloud_erode_frac)
    fence(cloud.xyz)
    log(f"triangulate: {time.perf_counter() - t:.3f}s")
    t = time.perf_counter()
    np.asarray(cloud.xyz)
    log(f"fetch xyz f32 28MB: {time.perf_counter() - t:.3f}s")
    t = time.perf_counter()
    np.asarray(cloud.colors)
    log(f"fetch colors f32 28MB: {time.perf_counter() - t:.3f}s")
    t = time.perf_counter()
    np.asarray(cloud.valid)
    log(f"fetch valid bool 2.4MB: {time.perf_counter() - t:.3f}s")
    log("PROFILE DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
