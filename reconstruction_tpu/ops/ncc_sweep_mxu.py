"""MXU (matmul) Pallas kernel for the NCC shift-sweep matcher.

The VPU formulations (XLA `stereo/matching.ncc_sweep_match` and the
fused-VMEM `ops/ncc_sweep_pallas.py`) both plateau ~10-13% of the VPU
peak at the bench shape (BENCH_r04 kernels; VERDICT r4 weak #1): per
shift they pay a dynamic lane-rotate per operand plus a separable box
sum, all on the VPU.  This kernel moves the window correlation onto the
MXU:

  cross[x, s] = sum_{c,dy,dx} L[y+dy, x+dx, c] * R[y+dy, x+s+dx, c]
              = WL[:, x] . WR[:, x+s]

with WL/WR the (2r+1)^2*C-tap im2col stacks (75 at r=2, C=3), built
once per row-block as 75 static roll-copies each.  Per (row, 128-col
x-tile) ONE dot_general

    (taps, NT=256)^T (taps, XT=128) -> (NT, XT)    [t by x tile]

computes every (t, x) window dot; the shift band D[ds, i] =
M[i + ds, i] is extracted by a log2 SHEAR — 7 conditional SUBLANE
rolls keyed on the bits of the lane (x) index, no gathers — then
scored and arg-maxed along sublanes.  The t-by-x orientation keeps all
per-pixel maps and outputs in their natural (B, W) layout (a (W, B)
layout would pad the 8-wide lane dim to 128 and blow VMEM 16x — the
repo-wide tile-padding rule).

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

HALO = 8          # row halo (multiple of 8 for sublane alignment)
XT = 128          # x-tile width (matmul N dim); shifts per chunk
NT = 2 * XT       # t-tile width (matmul M dim)


def _roll(a, k, axis):
    """Circular LEFT-roll by k along ``axis`` (out[i] = a[i + k]);
    k may be a negative int (right roll) or a traced scalar >= 0."""
    n = a.shape[axis]
    return pltpu.roll(a, (n - k) % n, axis=axis)


def _mxu_kernel(r, B, W, C, n_val, P, WLP, TP, smem, Lw_ref, Rw_ref,
                muL_ref, invL_ref, muRw_ref, invRw_ref, validRw_ref,
                act_ref, lo_ref, hi_ref, score_ref, t_ref,
                wl_ref, wr_ref, bs_ref, bt_ref):
    """One row-block of B rows; see module docstring.

    Layouts (leading grid dim on every ref):
      Lw:  (1, C, B+2*HALO, WLP) bf16 — x=0 at col 0, zero fill right,
      Rw:  (1, C, B+2*HALO, P)  bf16 — x=0 at col pad_shift,
      muL/invL/act/lo/hi: (1, B, W); muRw/invRw/validRw: (1, B, P),
      outputs score/t: (1, B, W),
      wl/wr: VMEM scratch (B, TP, WLP) / (B, TP, P) bf16 im2col stacks.
    """
    s_min = smem[0]
    s_cnt = smem[1]
    padw = smem[2]
    taps = C * (2 * r + 1) * (2 * r + 1)
    nx = W // XT
    hr = HALO - r

    # --- im2col stacks (B, TP, cols): one static row-slice + static
    # lane-roll per tap (dx in [-r, r]; rolled-in lanes come from the
    # zero pads).  Tap rows beyond `taps` stay zero: exact zero
    # contributions.
    for kz in range(taps, TP):
        wl_ref[:, kz:kz + 1, :] = jnp.zeros((B, 1, WLP), jnp.bfloat16)
        wr_ref[:, kz:kz + 1, :] = jnp.zeros((B, 1, P), jnp.bfloat16)
    k = 0
    for c in range(C):
        for dy in range(2 * r + 1):
            for dx in range(-r, r + 1):
                rows_l = Lw_ref[0, c, hr + dy:hr + dy + B, :]
                wl_ref[:, k:k + 1, :] = jnp.expand_dims(
                    _roll(rows_l, dx, 1), 1).astype(jnp.bfloat16)
                k += 1

    nchunk = jnp.maximum((s_cnt + XT - 1) // XT, 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (B, NT, XT), 2)
    sub_j = jax.lax.broadcasted_iota(jnp.int32, (B, NT, XT), 1)
    ds_sub = jax.lax.broadcasted_iota(jnp.int32, (B, XT, XT), 1)

    # Running best lives in SCRATCH REFS with static-slice stores:
    # Mosaic has no dynamic_update_slice lowering for carried values.
    bs_ref[...] = jnp.full((B, W), -1.0, jnp.float32)
    bt_ref[...] = jnp.full((B, W), -1, jnp.int32)

    def chunk_body(ci, carry):
        ds0 = ci * XT
        off = padw + s_min + ds0                   # lane offset of t=0
        # ONE dynamic f32 roll per chunk of the right-view SOURCE, then
        # the 75 R-side im2col taps rebuild from it (static f32 rolls +
        # bf16 cast stores) — rolling the bf16 stack directly is
        # impossible (Mosaic: "Rotate with non-32-bit data"), and for
        # the common single-chunk case the rebuild costs exactly one
        # tap build.  The matmul/shear/reduce batch over the B rows
        # (one dot_general with a batch dim per x-tile — the
        # per-(row, tile) unrolled form blew up the compile helper).
        Rw_c = _roll(Rw_ref[0], off, 2)            # (C, B+2*HALO, P) f32
        k2 = 0
        for c in range(C):
            for dy in range(2 * r + 1):
                for dx in range(-r, r + 1):
                    rows_r = Rw_c[c, hr + dy:hr + dy + B, :]
                    wr_ref[:, k2:k2 + 1, :] = jnp.expand_dims(
                        _roll(rows_r, dx, 1), 1).astype(jnp.bfloat16)
                    k2 += 1
        muR_c = _roll(muRw_ref[0], off, 1)         # (B, P)
        invR_c = _roll(invRw_ref[0], off, 1)
        vR_c = _roll(validRw_ref[0], off, 1)
        for xi in range(nx):
            x0 = xi * XT
            A = wl_ref[:, :, x0:x0 + XT]           # (B, TP, XT)
            Bm = wr_ref[:, :, x0:x0 + NT]          # (B, TP, NT)
            cross = jax.lax.dot_general(
                Bm, A, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (B, NT, XT)
            muL = jnp.expand_dims(muL_ref[0, :, x0:x0 + XT], 1)
            invL = jnp.expand_dims(invL_ref[0, :, x0:x0 + XT], 1)
            act = jnp.expand_dims(act_ref[0, :, x0:x0 + XT], 1) > 0
            lo = jnp.expand_dims(lo_ref[0, :, x0:x0 + XT], 1)
            hi = jnp.expand_dims(hi_ref[0, :, x0:x0 + XT], 1)
            # two-step slice-then-expand: mixed slice+None indexing
            # lowers to an (unsupported) gather in the Mosaic path
            muR = jnp.expand_dims(muR_c[:, x0:x0 + NT], 2)   # (B, NT, 1)
            invR = jnp.expand_dims(invR_c[:, x0:x0 + NT], 2)
            vR = jnp.expand_dims(vR_c[:, x0:x0 + NT], 2)
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
            Dv = D[:, :XT, :]                        # (B, XT ds, XT x)
            mx = jnp.max(Dv, axis=1, keepdims=True)  # (B, 1, XT)
            first = jnp.min(
                jnp.where(Dv == mx, ds_sub, jnp.int32(1 << 20)),
                axis=1, keepdims=True)               # (B, 1, XT)
            x_abs = x0 + jax.lax.broadcasted_iota(
                jnp.int32, (B, 1, XT), 2)
            t_cand = (x_abs + (s_min + ds0) + first)[:, 0, :]
            mx2 = mx[:, 0, :]                        # (B, XT)
            prev_s = bs_ref[:, x0:x0 + XT]
            prev_t = bt_ref[:, x0:x0 + XT]
            upd = mx2 > prev_s
            bs_ref[:, x0:x0 + XT] = jnp.where(upd, mx2, prev_s)
            bt_ref[:, x0:x0 + XT] = jnp.where(upd, t_cand, prev_t)
        return carry

    jax.lax.fori_loop(0, nchunk, chunk_body, 0)
    score_ref[0] = bs_ref[...]
    t_ref[0] = bt_ref[...]


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
    within +-pad_shift.  W pads to a multiple of XT internally."""
    H, W0 = imgL.shape[:2]
    if imgL.ndim == 2:
        imgL = imgL[..., None]
        imgR = imgR[..., None]
    C = imgL.shape[-1]
    r = radius
    assert r <= HALO, (r, HALO)
    assert block % 8 == 0

    # center BEFORE padding: out-of-image reads are 0 in the centered
    # domain (the XLA path's `shifted` zero fill)
    imgL = imgL.astype(jnp.float32) - 128.0
    imgR = imgR.astype(jnp.float32) - 128.0

    # pad W to a multiple of the x-tile
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

    WLP = -(-(W + 2 * r) // 128) * 128
    # Rw: cols [pad_shift, pad_shift+W) hold x; chunk roll reaches
    # off <= padw + pad_shift and the t-tile slice extends NT past
    # x0 <= W - XT, so right slack >= pad_shift + XT + 2r.
    P = -(-(W + 2 * pad_shift + NT + 2 * r) // 128) * 128

    def rows(a, fill, halo):
        pads = [(halo, Hp - H + halo)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pads, constant_values=fill)

    def widecols(a, fill, left, total):
        pads = [(0, 0)] * a.ndim
        pads[1] = (left, total - a.shape[1] - left)
        return jnp.pad(a, pads, constant_values=fill)

    # channels lead.  f32 on purpose: Mosaic's (dynamic and static)
    # lane rotates only support 32-bit data, so every roll happens on
    # f32 and the bf16 cast lands at the im2col SCRATCH stores.
    # L keeps x=0 at col 0: the negative-dx tap rolls wrap right-end
    # ZEROS into cols 0..r-1, exactly the XLA `shifted` zero fill.
    Lh = jnp.moveaxis(widecols(rows(imgL, 0.0, HALO), 0.0, 0, WLP),
                      -1, 0)
    Rh = jnp.moveaxis(widecols(rows(imgR, 0.0, HALO), 0.0, pad_shift, P),
                      -1, 0)
    muRw = widecols(rows(momR.mean, 0.0, 0), 0.0, pad_shift, P)
    invRw = widecols(rows(momR.inv_norm, 1.0, 0), 1.0, pad_shift, P)
    validRw = widecols(rows(validR.astype(jnp.float32), 0.0, 0), 0.0,
                       pad_shift, P)
    muL = rows(momL.mean, 0.0, 0)
    invL = rows(momL.inv_norm, 1.0, 0)
    acth = rows(active.astype(jnp.int32), 0, 0)
    loh = rows(bound_lo.astype(jnp.int32), 0, 0)
    hih = rows(bound_hi.astype(jnp.int32), -1, 0)

    scalars = jnp.stack([s_min, s_cnt, jnp.int32(pad_shift)])

    starts = (np.arange(nb) * B)[:, None] + np.arange(B + 2 * HALO)[None, :]

    def band_halo(a):  # (C, Hp+2*HALO, cols) -> (nb, C, B+2*HALO, cols)
        return a[:, starts].transpose(1, 0, 2, 3)

    def flat(a):
        return a.reshape(nb, B, *a.shape[1:])

    TP = -(-(C * (2 * r + 1) ** 2) // 8) * 8

    bw = lambda: pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    bp = lambda: pl.BlockSpec((1, B, P), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_mxu_kernel, r, B, W, C, n, P, WLP, TP),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, B + 2 * HALO, WLP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, B + 2 * HALO, P), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            bw(), bw(), bp(), bp(), bp(), bw(), bw(), bw(),
        ],
        out_specs=[bw(), bw()],
        out_shape=[jax.ShapeDtypeStruct((nb, B, W), jnp.float32),
                   jax.ShapeDtypeStruct((nb, B, W), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((B, TP, WLP), jnp.bfloat16),
            pltpu.VMEM((B, TP, P), jnp.bfloat16),
            pltpu.VMEM((B, W), jnp.float32),
            pltpu.VMEM((B, W), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, band_halo(Lh), band_halo(Rh), flat(muL), flat(invL),
      flat(muRw), flat(invRw), flat(validRw), flat(acth), flat(loh),
      flat(hih))

    best_score = out[0].reshape(Hp, W)[:H, :W0]
    best_t = out[1].reshape(Hp, W)[:H, :W0]
    matched = best_t >= 0
    xg = jnp.arange(W0, dtype=jnp.int32)[None, :]
    disp = jnp.where(matched, (best_t - xg).astype(jnp.float32),
                     float(NOMATCH))
    return SweepResult(disparity=disp, score=best_score)
