"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference path."""

import numpy as np
import jax.numpy as jnp

from reconstruction_tpu.config import NOMATCH
from reconstruction_tpu.ops.refine_pallas import disparity_refine_pallas
from reconstruction_tpu.stereo.margins import find_margin
from reconstruction_tpu.stereo.refine import disparity_refine


def _scene(rng, H=48, W=40):
    imgL = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    imgR = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    disp = rng.integers(-2, 3, (H, W)).astype(np.float32)
    valid = np.zeros((H, W), bool)
    valid[3:-3, 3:-3] = True
    disp[~valid] = NOMATCH
    disp[rng.uniform(size=(H, W)) < 0.15] = NOMATCH
    return imgL, imgR, disp, valid


def test_refine_pallas_matches_xla(rng):
    imgL, imgR, disp, valid = _scene(rng)
    m = find_margin(jnp.asarray(valid), 2)
    ref = disparity_refine(jnp.asarray(disp), jnp.asarray(imgL),
                           jnp.asarray(imgR), m, iterations=12,
                           s_cap=32, band=8)
    out = disparity_refine_pallas(jnp.asarray(disp), jnp.asarray(imgL),
                                  jnp.asarray(imgR), m, iterations=12,
                                  s_cap=32, band=8, T=6, block=16,
                                  interpret=True)
    r, o = np.asarray(ref), np.asarray(out)
    # exact except pixels whose anchor drifts > 7 within one segment
    close = np.isclose(r, o, atol=1e-4)
    assert close.mean() > 0.999, (1 - close.mean())
    # NOMATCH pattern identical
    np.testing.assert_array_equal(r == NOMATCH, o == NOMATCH)


def test_refine_pallas_long_run(rng):
    imgL, imgR, disp, valid = _scene(rng, H=32, W=32)
    m = find_margin(jnp.asarray(valid), 2)
    out = disparity_refine_pallas(jnp.asarray(disp), jnp.asarray(imgL),
                                  jnp.asarray(imgR), m, iterations=30,
                                  s_cap=32, band=8, T=6, block=16,
                                  interpret=True)
    o = np.asarray(out)
    assert np.isfinite(o[o != NOMATCH]).all()


def test_refine_minicv_matches_gather_path(rng):
    imgL, imgR, disp, valid = _scene(rng)
    m = find_margin(jnp.asarray(valid), 2)
    a = disparity_refine(jnp.asarray(disp), jnp.asarray(imgL),
                         jnp.asarray(imgR), m, iterations=24,
                         s_cap=32, band=8, use_minicv=False)
    b = disparity_refine(jnp.asarray(disp), jnp.asarray(imgL),
                         jnp.asarray(imgR), m, iterations=24,
                         s_cap=32, band=8, use_minicv=True)
    an, bn = np.asarray(a), np.asarray(b)
    close = np.isclose(an, bn, atol=1e-4)
    assert close.mean() > 0.999, (1 - close.mean())
    np.testing.assert_array_equal(an == NOMATCH, bn == NOMATCH)


def test_refine_pallas_recenter_matches_xla(rng):
    """Window re-centering chunks the Pallas segment loop exactly like
    the XLA scan path: same chunk boundaries -> same reads -> equal
    output (both explicit k and the auto -1 resolution)."""
    imgL, imgR, disp, valid = _scene(rng)
    m = find_margin(jnp.asarray(valid), 2)
    for rc in (12, -1):
        ref = disparity_refine(jnp.asarray(disp), jnp.asarray(imgL),
                               jnp.asarray(imgR), m, iterations=24,
                               s_cap=32, band=8, recenter_every=rc)
        out = disparity_refine_pallas(jnp.asarray(disp), jnp.asarray(imgL),
                                      jnp.asarray(imgR), m, iterations=24,
                                      s_cap=32, band=8, T=6, block=16,
                                      interpret=True, recenter_every=rc)
        r, o = np.asarray(ref), np.asarray(out)
        close = np.isclose(r, o, atol=1e-4)
        assert close.mean() > 0.999, (rc, 1 - close.mean())
        np.testing.assert_array_equal(r == NOMATCH, o == NOMATCH)


def test_resolve_recenter_auto():
    from reconstruction_tpu.stereo.refine import resolve_recenter
    # auto = one mid-run re-extraction, T-aligned (T=6 default, matching
    # the pallas segment default so both impls chunk identically)
    assert resolve_recenter(120, -1) == 60
    assert resolve_recenter(90, -1) == 48
    assert resolve_recenter(30, -1) == 18
    assert resolve_recenter(120, 0) == 0   # explicit off
    assert resolve_recenter(120, 30) == 30
    # explicit t override (the pallas path passes its own T)
    assert resolve_recenter(24, -1, t=6) == 12
    assert resolve_recenter(30, -1, t=10) == 20


def test_ncc_sweep_pallas_matches_xla(rng):
    """Fused-sweep Pallas kernel == XLA sweep: disparity argmax exactly
    (same ascending-shift strict-> tie-break), scores to fp tolerance;
    mixed positive/negative shifts, partial masks, grayscale + color."""
    from reconstruction_tpu.ops.ncc_sweep_pallas import ncc_sweep_match_pallas
    from reconstruction_tpu.stereo.matching import ncc_sweep_match

    H, W = 37, 48
    for channels in (3, 1):
        shape = (H, W, channels) if channels == 3 else (H, W)
        imgL = rng.uniform(0, 255, shape).astype(np.float32)
        imgR = rng.uniform(0, 255, shape).astype(np.float32)
        validR = rng.uniform(size=(H, W)) > 0.1
        active = rng.uniform(size=(H, W)) > 0.2
        x = np.arange(W)[None, :]
        lo = np.clip(x + rng.integers(-9, 0, (H, W)), 0, W - 1)
        hi = np.clip(lo + rng.integers(0, 14, (H, W)), 0, W - 1)
        ref = ncc_sweep_match(jnp.asarray(imgL), jnp.asarray(imgR),
                              jnp.asarray(validR), jnp.asarray(active),
                              jnp.asarray(lo.astype(np.int32)),
                              jnp.asarray(hi.astype(np.int32)), 2)
        for mode in ("dynamic", "increment"):
            out = ncc_sweep_match_pallas(
                jnp.asarray(imgL), jnp.asarray(imgR), jnp.asarray(validR),
                jnp.asarray(active), jnp.asarray(lo.astype(np.int32)),
                jnp.asarray(hi.astype(np.int32)), 2, pad_shift=48,
                block=8, interpret=True, shift_mode=mode)
            np.testing.assert_array_equal(np.asarray(ref.disparity),
                                          np.asarray(out.disparity))
            sc = np.isclose(np.asarray(ref.score), np.asarray(out.score),
                            atol=1e-4)
            assert sc.mean() > 0.999


def test_refine_pallas_tree_extract_matches_chain(rng):
    """The bit-tree slot extraction (depth-5 selects, r5 latency
    candidate) must be BIT-equal to the chain form: every select
    returns an exact plane value or the same 0.5 fill."""
    imgL, imgR, disp, valid = _scene(rng, H=64, W=48)
    m = find_margin(jnp.asarray(valid), 2)
    kw = dict(iterations=12, s_cap=32, band=8, T=6, block=16,
              interpret=True)
    a = disparity_refine_pallas(jnp.asarray(disp), jnp.asarray(imgL),
                                jnp.asarray(imgR), m, extract="chain",
                                **kw)
    b = disparity_refine_pallas(jnp.asarray(disp), jnp.asarray(imgL),
                                jnp.asarray(imgR), m, extract="tree",
                                **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ncc_sweep_shift_block_matches_depth1(rng):
    """K-shift-blocked sweep bodies (sblock, r5 traffic fix) must be
    bit-identical to the depth-1 sweep for every variant (unbanded /
    banded / tiled)."""
    from reconstruction_tpu.stereo.matching import ncc_sweep_match
    for (H, W, band, tile) in [(48, 64, 0, 0), (96, 64, 24, 0),
                               (96, 128, 24, 32)]:
        iL = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
        iR = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
        vR = rng.uniform(size=(H, W)) > 0.1
        act = rng.uniform(size=(H, W)) > 0.3
        x = np.arange(W)[None, :]
        lo = np.clip(x + rng.integers(-9, 0, (H, W)), 0, W - 1)
        hi = np.clip(lo + rng.integers(0, 13, (H, W)), 0, W - 1)
        ref = None
        for sb in (1, 8):
            r = ncc_sweep_match(
                jnp.asarray(iL), jnp.asarray(iR), jnp.asarray(vR),
                jnp.asarray(act), jnp.asarray(lo.astype(np.int32)),
                jnp.asarray(hi.astype(np.int32)), 2, band=band,
                tile=tile, sblock=sb)
            cur = (np.asarray(r.disparity), np.asarray(r.score))
            if ref is None:
                ref = cur
            else:
                np.testing.assert_array_equal(ref[0], cur[0])
                np.testing.assert_array_equal(ref[1], cur[1])


def test_ncc_sweep_mxu_matches_xla(rng):
    """The MXU im2col+shear sweep (ops/ncc_sweep_mxu.py) is BIT-equal
    to the XLA sweep: integer u8-centered images make the bf16 MXU
    cross sums exact (see module docstring)."""
    from reconstruction_tpu.ops.ncc_sweep_mxu import ncc_sweep_match_mxu
    from reconstruction_tpu.stereo.matching import ncc_sweep_match
    from reconstruction_tpu.core.pyramid import quantize_u8

    for (H, W, C, lo0, wid, ps) in [(24, 128, 3, -20, 40, 128),
                                    (17, 200, 3, -120, 240, 256),
                                    (12, 96, 1, -5, 10, 128)]:
        shape = (H, W, C) if C == 3 else (H, W)
        iL = quantize_u8(jnp.asarray(
            rng.uniform(0, 255, shape).astype(np.float32)))
        iR = quantize_u8(jnp.asarray(
            rng.uniform(0, 255, shape).astype(np.float32)))
        vR = rng.uniform(size=(H, W)) > 0.1
        act = rng.uniform(size=(H, W)) > 0.3
        x = np.arange(W)[None, :]
        lo = np.clip(x + rng.integers(lo0, 1, (H, W)), 0, W - 1)
        hi = np.clip(lo + rng.integers(0, wid + 1, (H, W)), 0, W - 1)
        ref = ncc_sweep_match(iL, iR, jnp.asarray(vR), jnp.asarray(act),
                              jnp.asarray(lo.astype(np.int32)),
                              jnp.asarray(hi.astype(np.int32)), 2)
        got = ncc_sweep_match_mxu(iL, iR, jnp.asarray(vR),
                                  jnp.asarray(act),
                                  jnp.asarray(lo.astype(np.int32)),
                                  jnp.asarray(hi.astype(np.int32)), 2,
                                  pad_shift=ps, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.disparity),
                                      np.asarray(got.disparity))
        np.testing.assert_array_equal(np.asarray(ref.score),
                                      np.asarray(got.score))


def test_ba_coupling_pallas_matches_reduce(rng):
    """M-tiled coupling contraction == the XLA broadcast-reduce to f32
    reassociation tolerance (serial vs tree o-sum), including -1 /
    out-of-range camera padding and a non-MT-multiple M."""
    from reconstruction_tpu.ops.ba_coupling_pallas import ba_coupling_pallas

    E, O, M, C = 18, 8, 700, 16
    He = rng.normal(size=(E, O, M)).astype(np.float32)
    cam = rng.integers(0, C, (O, M)).astype(np.int32)
    cam[:, -5:] = -1  # padded observations contribute nothing
    got = ba_coupling_pallas(jnp.asarray(He), jnp.asarray(cam), C,
                             interpret=True)
    oh = (cam[None, :, :] == np.arange(C)[:, None, None])  # (C, O, M)
    ref = np.einsum("eom,com->ecm", He, oh.astype(np.float32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5,
                               atol=1e-5)
    assert np.all(np.asarray(got)[:, :, -5:] == 0.0)
