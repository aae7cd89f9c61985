"""Property tests: vectorized stereo stages vs the sequential oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from reconstruction_tpu.config import NOMATCH
from reconstruction_tpu.stereo.margins import Margins, find_margin
from reconstruction_tpu.stereo.matching import (
    brute_force_match, guided_search_bounds, ncc_sweep_match, rematch)
from reconstruction_tpu.stereo.constraints import (
    median_filter, ordering_constraint, propagate_bounds,
    smoothness_constraint, uniqueness_constraint)
from reconstruction_tpu.stereo.refine import disparity_refine


def _random_scene(rng, H=36, W=48, hole_p=0.25):
    """Random textured pair + blobby masks + structured disparity map."""
    imgL = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    imgR = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    def blobmask():
        m = np.zeros((H, W), bool)
        m[4:-4, 4:-4] = True
        holes = rng.uniform(size=(H, W)) < 0.05
        return m & ~holes
    vL, vR = blobmask(), blobmask()
    disp = rng.integers(-3, 4, size=(H, W)).astype(np.float64)
    disp[rng.uniform(size=(H, W)) < hole_p] = NOMATCH
    disp[~vL] = NOMATCH
    return imgL, imgR, vL, vR, disp


def _margins(valid, radius=2):
    m = oracle.find_margin(valid, radius)
    return m, Margins(*[jnp.int32(v) for v in m])


def test_find_margin_matches_oracle(rng):
    for _ in range(5):
        v = rng.uniform(size=(30, 40)) < 0.2
        mo = oracle.find_margin(v, 2)
        mj = find_margin(jnp.asarray(v), 2)
        assert mo == (int(mj.YL), int(mj.YR), int(mj.XL), int(mj.XR))


def test_brute_match_matches_oracle(rng):
    imgL, imgR, vL, vR, _ = _random_scene(rng, H=24, W=32)
    mo_L, mj_L = _margins(vL)
    mo_R, mj_R = _margins(vR)
    ours = np.asarray(brute_force_match(
        jnp.asarray(imgL), jnp.asarray(imgR), jnp.asarray(vL),
        jnp.asarray(vR), mj_L, mj_R, 2))
    ref = oracle.brute_match(imgL.astype(np.float64), imgR.astype(np.float64),
                             vL, vR, mo_L, mo_R, 2)
    # identical argmax except possible f32-vs-f64 near-ties
    mismatch = (ours != ref).sum()
    assert mismatch <= 0.01 * (ref != NOMATCH).sum() + 2, mismatch


def test_sweep_with_per_pixel_bounds(rng):
    """ncc_sweep_match with arbitrary per-pixel bounds == direct argmax."""
    imgL, imgR, vL, vR, _ = _random_scene(rng, H=20, W=28)
    H, W = vL.shape
    mo_L, mj_L = _margins(vL)
    lo = rng.integers(0, W // 2, size=(H, W))
    hi = lo + rng.integers(0, 6, size=(H, W))
    active = vL.copy()
    res = ncc_sweep_match(jnp.asarray(imgL), jnp.asarray(imgR),
                          jnp.asarray(vR), jnp.asarray(active),
                          jnp.asarray(lo, np.int32), jnp.asarray(hi, np.int32), 2)
    ours = np.asarray(res.disparity)
    bad = 0
    for y in range(H):
        for x in range(W):
            if not active[y, x]:
                assert ours[y, x] == NOMATCH
                continue
            best, bt = -1.0, -1
            for t in range(lo[y, x], min(hi[y, x], W - 1) + 1):
                if t < 0 or not vR[y, t]:
                    continue
                v = oracle.ncc(imgL.astype(np.float64),
                               imgR.astype(np.float64), y, x, t, 2)
                if v > best:
                    best, bt = v, t
            want = (bt - x) if bt != -1 else NOMATCH
            if ours[y, x] != want:
                bad += 1
    assert bad <= 3, bad


def test_guided_bounds_match_oracle(rng):
    H, W = 32, 44
    Hc, Wc = H // 2, W // 2
    coarse = rng.integers(-3, 4, size=(Hc, Wc)).astype(np.float64)
    coarse[rng.uniform(size=(Hc, Wc)) < 0.4] = NOMATCH
    vL = np.zeros((H, W), bool)
    vL[3:-3, 3:-3] = True
    vR = vL.copy()
    mo_L, mj_L = _margins(vL)
    mo_R, mj_R = _margins(vR)
    lo, hi = guided_search_bounds(jnp.asarray(coarse), mj_L, mj_R, H, W, 2)
    lo_o, hi_o = oracle.guided_bounds(coarse, vL, mo_L, mo_R, 2, H, W)
    YL, YR, XL, XR = mo_L
    box = np.zeros((H, W), bool)
    box[YL:YR + 1, XL:XR + 1] = True
    np.testing.assert_array_equal(np.asarray(lo)[box], lo_o[box])
    np.testing.assert_array_equal(np.asarray(hi)[box], hi_o[box])


def test_smoothness_matches_oracle(rng):
    _, _, vL, _, disp = _random_scene(rng)
    mo, mj = _margins(vL)
    ours = np.asarray(smoothness_constraint(jnp.asarray(disp, jnp.float32), mj))
    ref = oracle.smoothness(disp, mo)
    np.testing.assert_array_equal(ours, ref)


def test_ordering_matches_oracle(rng):
    for _ in range(3):
        _, _, vL, _, disp = _random_scene(rng, H=20, W=30)
        mo, mj = _margins(vL)
        ours = np.asarray(ordering_constraint(jnp.asarray(disp, jnp.float32), mj))
        ref = oracle.ordering(disp, mo)
        np.testing.assert_array_equal(ours, ref)


def test_uniqueness_matches_oracle(rng):
    _, _, vL, vR, d0 = _random_scene(rng)
    d1 = _random_scene(rng)[4]
    mo0, mj0 = _margins(vL)
    mo1, mj1 = _margins(vR)
    o0, o1 = uniqueness_constraint(
        jnp.asarray(d0, jnp.float32), jnp.asarray(d1, jnp.float32), mj0, mj1)
    r0 = oracle.uniqueness_pass(d0, d1, mo0, mo1)
    r1 = oracle.uniqueness_pass(d1, r0, mo1, mo0)
    r0 = oracle.uniqueness_pass(r0, r1, mo0, mo1)
    np.testing.assert_array_equal(np.asarray(o0), r0)
    np.testing.assert_array_equal(np.asarray(o1), r1)


def test_median_matches_oracle(rng):
    _, _, vL, _, disp = _random_scene(rng)
    mo, mj = _margins(vL)
    ours = np.asarray(median_filter(jnp.asarray(disp, jnp.float32),
                                    jnp.asarray(vL), mj, 1))
    ref = oracle.median6(disp, vL, mo)
    np.testing.assert_array_equal(ours, ref)


def test_propagate_bounds_matches_oracle(rng):
    _, _, vL, vR, disp = _random_scene(rng)
    mo0, mj0 = _margins(vL)
    mo1, mj1 = _margins(vR)
    BL, BR = propagate_bounds(jnp.asarray(disp, jnp.float32),
                              jnp.asarray(vL), mj0, mj1)
    BLo, BRo = oracle.set_boundary_smooth(disp, vL, mo0, mo1)
    YL, YR, XL, XR = mo0
    sel = np.zeros(vL.shape, bool)
    sel[YL:YR + 1, XL:XR + 1] = True
    sel &= vL  # meaningful only at mask-valid pixels
    np.testing.assert_allclose(np.asarray(BL)[sel], BLo[sel])
    np.testing.assert_allclose(np.asarray(BR)[sel], BRo[sel])


def test_refine_single_iteration_matches_oracle(rng):
    imgL, imgR, vL, _, disp = _random_scene(rng, H=24, W=32, hole_p=0.15)
    # keep disparities small so the 3x3 windows stay interior
    disp = np.where(disp == NOMATCH, NOMATCH, np.clip(disp, -2, 2))
    mo, mj = _margins(vL)
    ours = np.asarray(disparity_refine(
        jnp.asarray(disp, jnp.float32), jnp.asarray(imgL), jnp.asarray(imgR),
        mj, iterations=1, ws=0.03, s_cap=32, band=8))
    ref = oracle.refine_iteration(disp, imgL.astype(np.float64),
                                  imgR.astype(np.float64), mo, 0.03)
    # f32 NCC vs f64: allow small diffs; structure must match
    valid = disp != NOMATCH
    np.testing.assert_allclose(ours[valid], ref[valid], atol=2e-2)
    np.testing.assert_array_equal(ours[~valid], ref[~valid])


def test_refine_converges_on_smooth_scene(rng):
    """Multiple iterations keep disparities bounded and NOMATCH fixed."""
    imgL, imgR, vL, _, disp = _random_scene(rng, H=24, W=32)
    disp = np.where(disp == NOMATCH, NOMATCH, np.clip(disp, -2, 2))
    mo, mj = _margins(vL)
    out = np.asarray(disparity_refine(
        jnp.asarray(disp, jnp.float32), jnp.asarray(imgL), jnp.asarray(imgR),
        mj, iterations=30, ws=0.03, s_cap=32, band=8))
    valid = disp != NOMATCH
    assert np.array_equal(out == NOMATCH, ~valid)
    assert np.isfinite(out[valid]).all()
    assert np.abs(out[valid]).max() < 40


def test_banded_sweep_matches_unbanded(rng):
    H, W = 96, 40
    imgL = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    imgR = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    vR = np.ones((H, W), bool)
    act = np.zeros((H, W), bool)
    act[4:-4, 4:-4] = True
    lo = rng.integers(0, W // 2, (H, W)).astype(np.int32)
    hi = lo + rng.integers(0, 8, (H, W)).astype(np.int32)
    a = ncc_sweep_match(jnp.asarray(imgL), jnp.asarray(imgR), jnp.asarray(vR),
                        jnp.asarray(act), jnp.asarray(lo), jnp.asarray(hi),
                        2, band=0)
    b = ncc_sweep_match(jnp.asarray(imgL), jnp.asarray(imgR), jnp.asarray(vR),
                        jnp.asarray(act), jnp.asarray(lo), jnp.asarray(hi),
                        2, band=16)
    np.testing.assert_array_equal(np.asarray(a.disparity),
                                  np.asarray(b.disparity))


def test_window_slots_binshift_equals_gather(rng):
    """The gather-free window extractor is bitwise-equal to
    take_along_axis, including clipped / fully-out-of-range starts."""
    from reconstruction_tpu.stereo.refine import _window_slots_binshift
    H, W, S, MINI = 37, 53, 128, 32
    cv = jnp.asarray(rng.uniform(0, 1, (H, W, S)).astype(np.float32))
    j0 = rng.integers(-80, S + 40, (H, W)).astype(np.int32)
    j0[rng.uniform(size=(H, W)) < 0.05] = -(1 << 14)   # NOMATCH-style
    j0[rng.uniform(size=(H, W)) < 0.05] = (1 << 14)
    j0 = jnp.asarray(j0)
    ks = jnp.arange(MINI, dtype=jnp.int32)
    idx = j0[:, :, None] + ks[None, None, :]
    ok = (idx >= 0) & (idx < S)
    ref = jnp.where(
        ok, jnp.take_along_axis(cv, jnp.clip(idx, 0, S - 1), axis=2), 0.5)
    out = _window_slots_binshift(cv, j0, MINI, S)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_tiled_sweep_matches_unbanded(rng):
    H, W = 96, 64
    imgL = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    imgR = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    vR = np.ones((H, W), bool)
    act = np.zeros((H, W), bool)
    act[4:-4, 4:-4] = True
    lo = rng.integers(0, W // 2, (H, W)).astype(np.int32)
    hi = lo + rng.integers(0, 8, (H, W)).astype(np.int32)
    a = ncc_sweep_match(jnp.asarray(imgL), jnp.asarray(imgR), jnp.asarray(vR),
                        jnp.asarray(act), jnp.asarray(lo), jnp.asarray(hi),
                        2, band=0)
    b = ncc_sweep_match(jnp.asarray(imgL), jnp.asarray(imgR), jnp.asarray(vR),
                        jnp.asarray(act), jnp.asarray(lo), jnp.asarray(hi),
                        2, band=16, tile=16)
    np.testing.assert_array_equal(np.asarray(a.disparity),
                                  np.asarray(b.disparity))
    # uneven tile/band divisions
    c = ncc_sweep_match(jnp.asarray(imgL), jnp.asarray(imgR), jnp.asarray(vR),
                        jnp.asarray(act), jnp.asarray(lo), jnp.asarray(hi),
                        2, band=28, tile=24)
    np.testing.assert_array_equal(np.asarray(a.disparity),
                                  np.asarray(c.disparity))
