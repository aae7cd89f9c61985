"""Pallas TPU kernel for the NCC shift-sweep matcher.

The XLA sweep (`stereo/matching.ncc_sweep_match`) re-reads ~10 full
(H, W) arrays from HBM per shift (shifted image, box-sum passes, moment
maps, compare/select) — measured 51 GB/s at 6% HBM utilization for a
64-shift sweep at 1920x1280 (BENCH_NOTES r3).  This kernel keeps a
row-block of every operand in VMEM and loops the shifts ON-CHIP: HBM
traffic drops from O(shifts x image) to O(image), leaving pure VPU work
(per shift: C multiplies, a separable (2r+1)^2 box sum, one fused score
+ argmax update).

Same semantics as the XLA path (`CStereoMatching.cpp:170-227` candidate
scan): ascending-shift strict-> argmax (first-maximum tie-break),
per-pixel absolute bounds, target-validity gate, score -2 sentinel.
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


def _shift_zero(a, d):
    """Static x-shift with zero fill: out[.., x] = a[.., x+d].
    pltpu.roll takes non-negative shifts: a left-shift by d is a
    circular roll by W-d."""
    if d == 0:
        return a
    W = a.shape[-1]
    ax = a.ndim - 1
    rolled = pltpu.roll(a, (W - d) if d > 0 else -d, axis=ax)
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, ax)
    keep = (col < W - d) if d > 0 else (col >= -d)
    return jnp.where(keep, rolled, 0.0)


HALO = 8  # halo rows; multiple of 8 so (B + 2*HALO) stays sublane-aligned


def _sweep_kernel(r, B, W, C, n, P, shift_mode, smem_scalars, L_ref,
                  Rw_ref, muL_ref, invL_ref, muRw_ref, invRw_ref,
                  validRw_ref, act_ref, lo_ref, hi_ref, score_ref, t_ref):
    """One row-block: loop s = s0..s0+s_cnt-1 with all operands in VMEM.

    Layout rules (Mosaic dynamic_rotate constraints, found on-chip):
      * channels LEAD (a trailing C=3 axis would sit on the 128-wide
        lane dimension and pad VMEM 42x);
      * channel planes are loaded from the REF (Rw_ref[0, c]) — slicing
        a loaded 3-D value hands dynamic_rotate a vector with an
        internal tile offset and silently wrong lanes;
      * sublane counts (B, B+2*HALO) are multiples of 8 and the padded
        width P a multiple of 128 ("unsupported unaligned shape"
        otherwise).

    The per-shift read R[.., x+off] is a dynamic pltpu.roll along lanes
    followed by a static [:W] slice — off <= P-W guarantees x+off < P,
    so the circular wrap never reaches the kept columns.

    shift_mode:
      "dynamic"   — every shift re-rotates the 6 R-side planes from
                    base by the traced offset; Mosaic lowers each
                    dynamic rotate to ~log2(P) conditional rotate
                    stages, which DOMINATES the op stream at 64 shifts
                    (both this kernel and the XLA sweep sat at
                    ~7.2-7.6 ms / 64 shifts at 1920x1280 — the shared
                    rotate bottleneck).
      "increment" — ONE dynamic rotate per plane at loop entry
                    (offset s0), then the planes ride the fori_loop
                    carry and advance by a STATIC roll-by-1 per shift
                    (single rotate stage).  Circular rotations compose
                    exactly, so the result is BIT-EQUAL to "dynamic".

    Shapes: L: (C, B+2*HALO, W); Rw: (C, B+2*HALO, P); muL/invL/act/
    lo/hi: (B, W); muRw/invRw/validRw: (B, P); outputs (B, W).
    """
    s0 = smem_scalars[0]
    s_cnt = smem_scalars[1]
    padw = smem_scalars[2]

    muL = muL_ref[0]
    invL = invL_ref[0]
    muRw = muRw_ref[0]
    invRw = invRw_ref[0]
    validRw = validRw_ref[0]
    act = act_ref[0] > 0
    lo = lo_ref[0]
    hi = hi_ref[0]
    x = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    def roll_cols(a, off):
        """Circular left-roll so out[.., p] = a[.., (p + off) % P]."""
        return pltpu.roll(a, (P - off) % P, axis=a.ndim - 1)

    def score_update(s, Rp, muR_p, invR_p, vR_p, best_score, best_t):
        """Score shift s from already-rolled P-wide planes; the math
        (op order, tie-break) mirrors the XLA sweep exactly."""
        prod = Rp[0][..., :W] * L_ref[0, 0]
        for c in range(1, C):
            prod = prod + Rp[c][..., :W] * L_ref[0, c]
        bx = prod                                      # (B+2*HALO, W)
        for d in range(1, r + 1):
            bx = bx + _shift_zero(prod, d) + _shift_zero(prod, -d)
        cross = bx[HALO:HALO + B]
        for d in range(1, r + 1):
            cross = (cross + bx[HALO - d:HALO - d + B]
                     + bx[HALO + d:HALO + d + B])
        score = (cross - n * muL * muR_p[..., :W]) * invL * invR_p[..., :W]
        t = x + s
        ok = act & (vR_p[..., :W] > 0.5) & (t >= lo) & (t <= hi)
        score = jnp.where(ok, score, -2.0)
        upd = score > best_score
        return (jnp.where(upd, score, best_score),
                jnp.where(upd, t, best_t))

    init_best = (jnp.full((B, W), -1.0, jnp.float32),
                 jnp.full((B, W), -1, jnp.int32))

    if shift_mode == "increment":
        off0 = padw + s0
        planes0 = tuple(
            [roll_cols(Rw_ref[0, c], off0) for c in range(C)]
            + [roll_cols(muRw, off0), roll_cols(invRw, off0),
               roll_cols(validRw, off0)])

        def body(k, carry):
            best_score, best_t, planes = carry
            best_score, best_t = score_update(
                s0 + k, planes[:C], planes[C], planes[C + 1],
                planes[C + 2], best_score, best_t)
            nxt = tuple(pltpu.roll(p, P - 1, axis=p.ndim - 1)
                        for p in planes)
            return best_score, best_t, nxt

        best_score, best_t, _ = jax.lax.fori_loop(
            0, s_cnt, body, (*init_best, planes0))
    else:
        def body(k, carry):
            best_score, best_t = carry
            s = s0 + k
            off = padw + s
            Rp = [roll_cols(Rw_ref[0, c], off) for c in range(C)]
            return score_update(s, Rp, roll_cols(muRw, off),
                                roll_cols(invRw, off),
                                roll_cols(validRw, off),
                                best_score, best_t)

        best_score, best_t = jax.lax.fori_loop(0, s_cnt, body, init_best)
    score_ref[0] = best_score
    t_ref[0] = best_t


@partial(jax.jit, static_argnames=("radius", "pad_shift", "block",
                                  "interpret", "shift_mode"))
def ncc_sweep_match_pallas(
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
    block: int = 24,
    interpret: bool = False,
    shift_mode: str = "dynamic",
) -> SweepResult:
    """Drop-in fused-sweep alternative to `ncc_sweep_match` for shift
    ranges within +-pad_shift (the padded width bounds how far the
    in-VMEM dynamic slice can reach; the XLA path has no such limit).

    s_min/s_max: optional traced scalars bounding the shift range; by
    default derived from the bounds maps exactly like the XLA path.
    shift_mode: see `_sweep_kernel` — "increment" replaces the
    per-shift dynamic rotates with carried planes + static roll-by-1
    (bit-equal; the rotate-stage count is the dominant cost at
    64-shift sweeps).
    """
    H, W = imgL.shape[:2]
    if imgL.ndim == 2:
        imgL = imgL[..., None]
        imgR = imgR[..., None]
    C = imgL.shape[-1]
    r = radius
    assert r <= HALO, (r, HALO)
    assert block % 8 == 0, "sublane alignment (Mosaic dynamic_rotate)"

    imgL = imgL.astype(jnp.float32) - 128.0
    imgR = imgR.astype(jnp.float32) - 128.0
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

    B = min(block, max(8 * (H // 8), 8))
    nb = -(-H // B)
    Hp = nb * B

    # lane alignment: padded width must be a multiple of 128
    P = -(-(W + 2 * pad_shift) // 128) * 128
    pad_r = P - W - pad_shift

    def rows(a, fill, halo):
        pads = [(halo, Hp - H + halo)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pads, constant_values=fill)

    def wide(a, fill):
        """Pad the COLUMN axis (axis 1 of (rows, W[, C]))."""
        pads = [(0, 0)] * a.ndim
        pads[1] = (pad_shift, pad_r)
        return jnp.pad(a, pads, constant_values=fill)

    # channels LEAD for the kernel layout (see _sweep_kernel docstring)
    Lh = jnp.moveaxis(rows(imgL, 0.0, HALO), -1, 0)   # (C, Hp+2*HALO, W)
    Rh = jnp.moveaxis(wide(rows(imgR, 0.0, HALO), 0.0), -1, 0)
    muL = rows(momL.mean, 0.0, 0)
    invL = rows(momL.inv_norm, 1.0, 0)
    muRw = wide(rows(momR.mean, 0.0, 0), 0.0)
    invRw = wide(rows(momR.inv_norm, 1.0, 0), 1.0)
    validRw = wide(rows(validR.astype(jnp.float32), 0.0, 0), 0.0)
    acth = rows(active.astype(jnp.int32), 0, 0)
    loh = rows(bound_lo.astype(jnp.int32), 0, 0)
    hih = rows(bound_hi.astype(jnp.int32), -1, 0)

    scalars = jnp.stack([s_min, s_cnt, jnp.int32(pad_shift)])

    # band the halo'd arrays into (nb, C, B+2*HALO, ...) explicitly so
    # the BlockSpec stays a plain per-block map
    starts = (np.arange(nb) * B)[:, None] + np.arange(B + 2 * HALO)[None, :]

    def band_halo(a):  # (C, Hp+2*HALO, cols) -> (nb, C, B+2*HALO, cols)
        return a[:, starts].transpose(1, 0, 2, 3)

    Lb = band_halo(Lh)
    Rb = band_halo(Rh)

    def flat(a):
        return a.reshape(nb, B, *a.shape[1:])

    out = pl.pallas_call(
        partial(_sweep_kernel, r, B, W, C, n, P, shift_mode),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, B + 2 * HALO, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, B + 2 * HALO, P), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((nb, B, W), jnp.float32),
                   jax.ShapeDtypeStruct((nb, B, W), jnp.int32)],
        interpret=interpret,
    )(scalars, Lb, Rb, flat(muL), flat(invL), flat(muRw), flat(invRw),
      flat(validRw), flat(acth), flat(loh), flat(hih))

    best_score = out[0].reshape(Hp, W)[:H]
    best_t = out[1].reshape(Hp, W)[:H]
    matched = best_t >= 0
    xg = jnp.arange(W, dtype=jnp.int32)[None, :]
    disp = jnp.where(matched, (best_t - xg).astype(jnp.float32),
                     float(NOMATCH))
    return SweepResult(disparity=disp, score=best_score)
