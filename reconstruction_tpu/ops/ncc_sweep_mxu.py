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
                wl_ref, wr_ref):
    """One row-block of B rows; see module docstring.

    Layouts (leading grid dim on every ref):
      Lw:  (1, C, B+2*HALO, WLP) bf16 — x=0 at col 0, zero fill right,
      Rw:  (1, C, B+2*HALO, P)  bf16 — x=0 at col pad_shift,
      muL/invL/act/lo/hi: (1, B, W); muRw/invRw/validRw: (1, B, P),
      outputs score/t: (1, B, W),
      wl/wr: VMEM scratch (TP, B, WLP) / (TP, B, P) bf16 im2col stacks.
    """
    s_min = smem[0]
    s_cnt = smem[1]
    padw = smem[2]
    taps = C * (2 * r + 1) * (2 * r + 1)
    nx = W // XT
    hr = HALO - r

    # --- im2col stacks: one static row-slice + static lane-roll per tap
    # (dx in [-r, r]; rolled-in lanes come from the zero pads).  Tap
    # rows beyond `taps` stay zero: exact zero contributions.
    k = 0
    for c in range(C):
        for dy in range(2 * r + 1):
            for dx in range(-r, r + 1):
                rows_l = Lw_ref[0, c, hr + dy:hr + dy + B, :]
                rows_r = Rw_ref[0, c, hr + dy:hr + dy + B, :]
                wl_ref[k] = _roll(rows_l, dx, 1)
                wr_ref[k] = _roll(rows_r, dx, 1)
                k += 1
    for kz in range(taps, TP):
        wl_ref[kz] = jnp.zeros((B, WLP), jnp.bfloat16)
        wr_ref[kz] = jnp.zeros((B, P), jnp.bfloat16)

    nchunk = jnp.maximum((s_cnt + XT - 1) // XT, 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (NT, XT), 1)   # x - x0
    sub_j = jax.lax.broadcasted_iota(jnp.int32, (NT, XT), 0)    # t index
    ds_sub = jax.lax.broadcasted_iota(jnp.int32, (XT, XT), 0)   # ds

    def chunk_body(ci, carry):
        best_s, best_t = carry                     # (B, W) f32 / i32
        ds0 = ci * XT
        off = padw + s_min + ds0                   # lane offset of t=0
        for y in range(B):
            wr_y = _roll(wr_ref[:, y, :], off, 1)            # (TP, P)
            muR_y = _roll(muRw_ref[0, y:y + 1, :], off, 1)   # (1, P)
            invR_y = _roll(invRw_ref[0, y:y + 1, :], off, 1)
            vR_y = _roll(validRw_ref[0, y:y + 1, :], off, 1)
            for xi in range(nx):
                x0 = xi * XT
                A = wl_ref[:, y, x0:x0 + XT]               # (TP, XT)
                Bm = wr_y[:, x0:x0 + NT]                   # (TP, NT)
                cross = jax.lax.dot_general(
                    Bm, A, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (NT, XT)
                muL = muL_ref[0, y:y + 1, x0:x0 + XT]      # (1, XT)
                invL = invL_ref[0, y:y + 1, x0:x0 + XT]
                act = act_ref[0, y:y + 1, x0:x0 + XT] > 0
                lo = lo_ref[0, y:y + 1, x0:x0 + XT]
                hi = hi_ref[0, y:y + 1, x0:x0 + XT]
                muR = jnp.swapaxes(muR_y[:, x0:x0 + NT], 0, 1)   # (NT, 1)
                invR = jnp.swapaxes(invR_y[:, x0:x0 + NT], 0, 1)
                vR = jnp.swapaxes(vR_y[:, x0:x0 + NT], 0, 1)
                # score op-order mirrors matching.ncc_sweep_match
                score = (cross - n_val * muL * muR) * invL * invR
                # absolute target col of sublane j: x0 + s_min+ds0 + j
                t_abs = (x0 + s_min + ds0) + sub_j
                ok = (act & (vR > 0.5) & (t_abs >= lo) & (t_abs <= hi))
                score = jnp.where(ok, score, -2.0)
                # shear: D[ds, i] = score[i + ds, i]
                D = score
                for b in (1, 2, 4, 8, 16, 32, 64):
                    rolled = _roll(D, b, 0)
                    D = jnp.where((lane_i & b) > 0, rolled, D)
                Dv = D[:XT, :]                             # (XT ds, XT x)
                mx = jnp.max(Dv, axis=0, keepdims=True)    # (1, XT)
                first = jnp.min(
                    jnp.where(Dv == mx, ds_sub, jnp.int32(1 << 20)),
                    axis=0, keepdims=True)                 # (1, XT)
                x_abs = x0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, XT), 1)
                t_cand = x_abs + (s_min + ds0) + first
                prev_s = best_s[y:y + 1, x0:x0 + XT]
                prev_t = best_t[y:y + 1, x0:x0 + XT]
                upd = mx > prev_s
                new_s = jnp.where(upd, mx, prev_s)
                new_t = jnp.where(upd, t_cand, prev_t)
                best_s = jax.lax.dynamic_update_slice(
                    best_s, new_s, (y, x0))
                best_t = jax.lax.dynamic_update_slice(
                    best_t, new_t, (y, x0))
        return best_s, best_t

    init = (jnp.full((B, W), -1.0, jnp.float32),
            jnp.full((B, W), -1, jnp.int32))
    best_s, best_t = jax.lax.fori_loop(0, nchunk, chunk_body, init)
    score_ref[0] = best_s
    t_ref[0] = best_t


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

    # channels lead; bf16 halves the operand stream (exact: see header).
    # L keeps x=0 at col 0: the negative-dx tap rolls wrap right-end
    # ZEROS into cols 0..r-1, exactly the XLA `shifted` zero fill.
    Lh = jnp.moveaxis(widecols(rows(imgL, 0.0, HALO), 0.0, 0, WLP),
                      -1, 0).astype(jnp.bfloat16)
    Rh = jnp.moveaxis(widecols(rows(imgR, 0.0, HALO), 0.0, pad_shift, P),
                      -1, 0).astype(jnp.bfloat16)
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
            pltpu.VMEM((TP, B, WLP), jnp.bfloat16),
            pltpu.VMEM((TP, B, P), jnp.bfloat16),
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
