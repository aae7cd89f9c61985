"""MXU (matmul) Pallas kernel for the NCC shift-sweep matcher.

The VPU formulations (XLA `stereo/matching.ncc_sweep_match` and the
fused-VMEM `ops/ncc_sweep_pallas.py`) both plateau ~10-13% of the VPU
peak at the bench shape (BENCH_r04 kernels; VERDICT r4 weak #1): per
shift they pay a dynamic lane-rotate per operand plus a separable box
sum, all on the VPU.  This kernel moves the window correlation onto the
MXU:

  cross[x, s] = sum_{c,dy,dx} L[y+dy, x+dx, c] * R[y+dy, x+s+dx, c]
              = WL[:, x] . WR[:, x+s]

with WL/WR the (2r+1)^2*C-tap im2col stacks (75 at r=2, C=3).  The
grid is 2D — (row-block, x-tile) — with per-tile HALO'D input windows
built host-side (pallas blocks cannot overlap, and a W-wide scratch
blew scoped VMEM at 1024+ widths).  Per grid step ONE batched
dot_general

    (B, taps, NT=256) x (B, taps, XT=128) -> (B, NT, XT)   [t by x]

computes every (t, x) window dot for B rows; the shift band
D[y, ds, i] = M[y, i + ds, i] is extracted by a log2 SHEAR — 7
conditional SUBLANE rolls keyed on the bits of the lane (x) index, no
gathers — then scored and arg-maxed along sublanes.

Mosaic constraints baked in (probed on-chip, tools/probe_mosaic_*):
rotates are 32-bit only, so every roll runs on f32 and the bf16 cast
lands at the im2col scratch stores; value indexing never mixes slices
with None (that lowers to an unsupported gather); the running best
lives in scratch refs (no dynamic_update_slice lowering).

Exactness: images are u8-quantized and centered (integers in
[-128, 127], exact in bf16); bf16 products of 8-bit integers are exact
in the f32 MXU accumulator and window sums stay < 2^24, so `cross` is
BIT-EQUAL to the f32 XLA path's box sums; the score/argmax chain
mirrors `ncc_sweep_match` op for op (same op order, same ascending-s
first-maximum tie-break).

Shift capacity: XT=128 shifts per chunk (i + ds <= 254 < NT keeps the
shear un-wrapped); wider ranges loop chunks ascending with the running
strict-> argmax.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from reconstruction_tpu.config import NOMATCH
from reconstruction_tpu.stereo.matching import SweepResult, ncc_moments

XT = 128          # x-tile width (matmul N dim); shifts per chunk
NT = 2 * XT       # t-tile width (matmul M dim)


def _roll(a, k, axis):
    """Circular LEFT-roll by k along ``axis`` (out[i] = a[i + k]);
    k may be a negative int (right roll) or a traced scalar."""
    n = a.shape[axis]
    return pltpu.roll(a, (n - k) % n, axis=axis)


def _mxu_kernel(r, B, C, n_val, LT, RT, TP, pad_shift, smem, Lt_ref,
                Rt_ref, muL_ref, invL_ref, muRt_ref, invRt_ref,
                validRt_ref, act_ref, lo_ref, hi_ref,
                score_ref, t_ref, wl_ref, wr_ref, bs_ref, bt_ref):
    """One (row-block, x-tile) grid step; see module docstring.

    Ref layouts (leading grid dims on every tensor ref):
      Lt:  (1, 1, C, B+2r, LT) f32 — per-tile L window, col p = x0-r+p,
      Rt:  (1, 1, C, B+2r, RT) f32 — per-tile R window, col p =
           x0 - pad_shift - r + p (the extra r keeps negative-dx taps
           of the chunk's first candidate inside the window),
      muL/invL/act/lo/hi: (1, 1, B, XT); muRt/invRt/validRt:
           (1, 1, B, RT); x0 = program_id(1) * XT,
      outputs score/t: (1, 1, B, XT),
      wl/wr scratch: (B, TP, XT) / (B, TP, NT) bf16 im2col stacks,
      bs/bt scratch: (B, XT) running best.
    """
    s_min = smem[0]
    s_cnt = smem[1]
    taps = C * (2 * r + 1) * (2 * r + 1)
    x0 = pl.program_id(1) * XT

    # --- L-side im2col (once per step): tap (c, dy, dx_signed) is the
    # window left-rolled by dx_signed + r (window starts at x0 - r),
    # cast to bf16 at the store.
    for kz in range(taps, TP):
        wl_ref[:, kz:kz + 1, :] = jnp.zeros((B, 1, XT), jnp.bfloat16)
        wr_ref[:, kz:kz + 1, :] = jnp.zeros((B, 1, NT), jnp.bfloat16)
    k = 0
    for c in range(C):
        for dy in range(2 * r + 1):
            for a in range(2 * r + 1):      # a = dx_signed + r
                rows_l = Lt_ref[0, 0, c, dy:dy + B, :]
                v = _roll(rows_l, a, 1)
                wl_ref[:, k:k + 1, :] = jnp.expand_dims(
                    v[:, :XT], 1).astype(jnp.bfloat16)
                k += 1

    nchunk = jnp.maximum((s_cnt + XT - 1) // XT, 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (B, NT, XT), 2)
    sub_j = jax.lax.broadcasted_iota(jnp.int32, (B, NT, XT), 1)
    ds_sub = jax.lax.broadcasted_iota(jnp.int32, (B, XT, XT), 1)

    bs_ref[...] = jnp.full((B, XT), -1.0, jnp.float32)
    bt_ref[...] = jnp.full((B, XT), -1, jnp.int32)

    muL = jnp.expand_dims(muL_ref[0, 0], 1)        # (B, 1, XT)
    invL = jnp.expand_dims(invL_ref[0, 0], 1)
    act = jnp.expand_dims(act_ref[0, 0], 1) > 0
    lo = jnp.expand_dims(lo_ref[0, 0], 1)
    hi = jnp.expand_dims(hi_ref[0, 0], 1)

    def chunk_body(ci, carry):
        ds0 = ci * XT
        off = pad_shift + r + s_min + ds0  # window col of t = x0+s_min+ds0
        # ONE dynamic f32 roll of the R window per chunk, then the 75
        # R-side taps rebuild from it (static rolls + bf16 casts);
        # rolling bf16 directly is impossible (Mosaic: 32-bit rotates
        # only).  Tap (.., dx_signed) rolls by dx_signed on top of off.
        Rt_c = _roll(Rt_ref[0, 0], off, 2)         # (C, B+2r, RT)
        k2 = 0
        for c in range(C):
            for dy in range(2 * r + 1):
                for dx in range(-r, r + 1):
                    rows_r = _roll(Rt_c[c, dy:dy + B, :], dx, 1)
                    wr_ref[:, k2:k2 + 1, :] = jnp.expand_dims(
                        rows_r[:, :NT], 1).astype(jnp.bfloat16)
                    k2 += 1
        muR = _roll(muRt_ref[0, 0], off, 1)
        invR = _roll(invRt_ref[0, 0], off, 1)
        vR = _roll(validRt_ref[0, 0], off, 1)
        muR = jnp.expand_dims(muR[:, :NT], 2)      # (B, NT, 1)
        invR = jnp.expand_dims(invR[:, :NT], 2)
        vR = jnp.expand_dims(vR[:, :NT], 2)

        cross = jax.lax.dot_general(
            wr_ref[...], wl_ref[...], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)    # (B, NT, XT)
        # score op-order mirrors matching.ncc_sweep_match
        score = (cross - n_val * muL * muR) * invL * invR
        # absolute target col of sublane j: x0 + s_min + ds0 + j
        t_abs = (x0 + s_min + ds0) + sub_j
        ok = (act & (vR > 0.5) & (t_abs >= lo) & (t_abs <= hi))
        score = jnp.where(ok, score, -2.0)
        # shear: D[y, ds, i] = score[y, i + ds, i]
        D = score
        for b in (1, 2, 4, 8, 16, 32, 64):
            rolled = _roll(D, b, 1)
            D = jnp.where((lane_i & b) > 0, rolled, D)
        Dv = D[:, :XT, :]                          # (B, XT ds, XT x)
        mx = jnp.max(Dv, axis=1, keepdims=True)    # (B, 1, XT)
        first = jnp.min(
            jnp.where(Dv == mx, ds_sub, jnp.int32(1 << 20)),
            axis=1, keepdims=True)                 # (B, 1, XT)
        x_abs = x0 + jax.lax.broadcasted_iota(jnp.int32, (B, 1, XT), 2)
        t_cand = (x_abs + (s_min + ds0) + first)[:, 0, :]
        mx2 = mx[:, 0, :]                          # (B, XT)
        prev_s = bs_ref[...]
        prev_t = bt_ref[...]
        upd = mx2 > prev_s
        bs_ref[...] = jnp.where(upd, mx2, prev_s)
        bt_ref[...] = jnp.where(upd, t_cand, prev_t)
        return carry

    jax.lax.fori_loop(0, nchunk, chunk_body, 0)
    score_ref[0, 0] = bs_ref[...]
    t_ref[0, 0] = bt_ref[...]


@partial(jax.jit, static_argnames=("radius", "pad_shift", "block",
                                   "interpret"))
def ncc_sweep_match_mxu(
    imgL: jnp.ndarray,
    imgR: jnp.ndarray,
    validR: jnp.ndarray,
    active: jnp.ndarray,
    bound_lo: jnp.ndarray,
    bound_hi: jnp.ndarray,
    radius: int,
    s_min=None,
    s_max=None,
    pad_shift: int = 128,
    block: int = 8,
    interpret: bool = False,
) -> SweepResult:
    """Drop-in MXU alternative to `ncc_sweep_match` for shift ranges
    within +-pad_shift.  H/W pad internally to block/XT multiples."""
    H, W0 = imgL.shape[:2]
    if imgL.ndim == 2:
        imgL = imgL[..., None]
        imgR = imgR[..., None]
    C = imgL.shape[-1]
    r = radius

    # center BEFORE padding: out-of-image reads are 0 in the centered
    # domain (the XLA path's `shifted` zero fill)
    imgL = imgL.astype(jnp.float32) - 128.0
    imgR = imgR.astype(jnp.float32) - 128.0

    W = -(-W0 // XT) * XT
    if W != W0:
        padx = ((0, 0), (0, W - W0))
        imgL = jnp.pad(imgL, padx + ((0, 0),))
        imgR = jnp.pad(imgR, padx + ((0, 0),))
        validR = jnp.pad(validR, padx)
        active = jnp.pad(active, padx)
        bound_lo = jnp.pad(bound_lo, padx)
        bound_hi = jnp.pad(bound_hi, padx, constant_values=-1)

    momL = ncc_moments(imgL, r)
    momR = ncc_moments(imgR, r)
    n = float((2 * r + 1) ** 2 * C)

    x = jnp.arange(W, dtype=jnp.int32)[None, :]
    if s_min is None or s_max is None:
        s_lo_px = jnp.where(active, bound_lo - x, jnp.int32(1 << 20))
        s_hi_px = jnp.where(active, bound_hi - x, jnp.int32(-(1 << 20)))
        any_active = active.any()
        s_min = jnp.where(any_active, s_lo_px.min(), 0)
        s_max = jnp.where(any_active, s_hi_px.max(), -1)
    s_min = jnp.clip(jnp.asarray(s_min, jnp.int32), -pad_shift,
                     pad_shift - 1)
    s_max = jnp.clip(jnp.asarray(s_max, jnp.int32), -pad_shift, pad_shift)
    s_cnt = jnp.maximum(s_max - s_min + 1, 0)

    B = block
    nb = -(-H // B)
    Hp = nb * B
    nx = W // XT
    HB = B + 2 * r

    # per-tile halo'd windows (pallas blocks cannot overlap):
    # L window starts at x0 - r; R window at x0 - pad_shift - r.  RT
    # covers the chunk roll reach: off <= 2*pad_shift + r and slices
    # read NT lanes past it, plus r of positive-dx tap slack.
    LT = -(-(XT + 2 * r) // 128) * 128
    RT = -(-(2 * pad_shift + NT + 3 * r) // 128) * 128

    def rows(a, fill, halo):
        pads = [(halo, Hp - H + halo)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pads, constant_values=fill)

    def band_rows(a, fill):
        ah = rows(a, fill, r)       # (Hp + 2r, ...)
        starts = (np.arange(nb) * B)[:, None] + np.arange(HB)[None, :]
        return ah[starts]           # (nb, HB, ...)

    def img_tiles(img, left, width):
        """(H, W, C) -> (nb, nx, C, HB, width), window col 0 at
        x0 - left (zero-filled outside)."""
        btile = band_rows(img, 0.0)                  # (nb, HB, W, C)
        pads = ((0, 0), (0, 0), (left, max(0, width - left)), (0, 0))
        ap = jnp.pad(btile, pads)
        cols = (np.arange(nx) * XT)[:, None] + np.arange(width)[None, :]
        w = ap[:, :, cols]                           # (nb, HB, nx, width, C)
        return w.transpose(0, 2, 4, 1, 3)

    Lt = img_tiles(imgL, r, LT)
    Rt = img_tiles(imgR, pad_shift + r, RT)

    def map_tiles(a, fill):
        ab = rows(a, fill, 0).reshape(nb, B, nx, XT)
        return ab.transpose(0, 2, 1, 3)

    def map_windows(a, fill):
        ab = rows(a, fill, 0)                        # (Hp, W)
        pads = ((0, 0), (pad_shift + r, max(0, RT - pad_shift - r)))
        ap = jnp.pad(ab, pads, constant_values=fill)
        cols = (np.arange(nx) * XT)[:, None] + np.arange(RT)[None, :]
        w = ap[:, cols]                              # (Hp, nx, RT)
        return w.reshape(nb, B, nx, RT).transpose(0, 2, 1, 3)

    muLt = map_tiles(momL.mean, 0.0)
    invLt = map_tiles(momL.inv_norm, 1.0)
    actt = map_tiles(active.astype(jnp.int32), 0)
    lot = map_tiles(bound_lo.astype(jnp.int32), 0)
    hit = map_tiles(bound_hi.astype(jnp.int32), -1)
    muRt = map_windows(momR.mean, 0.0)
    invRt = map_windows(momR.inv_norm, 1.0)
    validRt = map_windows(validR.astype(jnp.float32), 0.0)

    scalars = jnp.stack([s_min, s_cnt])
    TP = -(-(C * (2 * r + 1) ** 2) // 8) * 8

    bxt = lambda: pl.BlockSpec((1, 1, B, XT), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
    brt = lambda: pl.BlockSpec((1, 1, B, RT), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_mxu_kernel, r, B, C, n, LT, RT, TP, pad_shift),
        grid=(nb, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, C, HB, LT), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, HB, RT), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            bxt(), bxt(), brt(), brt(), brt(), bxt(), bxt(), bxt(),
        ],
        out_specs=[bxt(), bxt()],
        out_shape=[jax.ShapeDtypeStruct((nb, nx, B, XT), jnp.float32),
                   jax.ShapeDtypeStruct((nb, nx, B, XT), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((B, TP, XT), jnp.bfloat16),
            pltpu.VMEM((B, TP, NT), jnp.bfloat16),
            pltpu.VMEM((B, XT), jnp.float32),
            pltpu.VMEM((B, XT), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, Lt, Rt, muLt, invLt, muRt, invRt, validRt, actt, lot,
      hit)

    best_score = out[0].transpose(0, 2, 1, 3).reshape(Hp, W)[:H, :W0]
    best_t = out[1].transpose(0, 2, 1, 3).reshape(Hp, W)[:H, :W0]
    matched = best_t >= 0
    xg = jnp.arange(W0, dtype=jnp.int32)[None, :]
    disp = jnp.where(matched, (best_t - xg).astype(jnp.float32),
                     float(NOMATCH))
    return SweepResult(disparity=disp, score=best_score)
