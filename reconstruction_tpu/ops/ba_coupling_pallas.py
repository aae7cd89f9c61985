"""Pallas TPU kernel for the BA point-camera coupling contraction.

Computes W_t[e, c, m] = sum_o He[e, o, m] * [cam[o, m] == c] — the
Schur coupling blocks of `ba/bundle_adjust.ba_blocks` (replacing the
reference's per-observation accumulation loops in its dense solver
path; the reference has no BA — this is a north-star addition).

Why a kernel: the contraction is elementwise in m and tiny in (o -> c),
so XLA has only two bad options, both measured (BENCH_NOTES r5):
  * fused broadcast-reduce over (18, C, M, O): re-reads He rows per
    camera (~1.2 GB at 16 cams / 64k pts) -> 9.6-11 ms full step;
  * o-unrolled accumulation: streams the 75 MB (18, C, M) accumulator
    through HBM per observation (~1.5 GB) -> 16.5 ms full step.
An M-tiled kernel holds the (18, C, Mt) accumulator in VMEM and
streams He / cam / W_t exactly once: ~145 MB total traffic, the
information floor.  A batched dot_general would instead pad the
(18, O) x (O, C) per-m matmuls to full MXU tiles (the r4 lesson:
7-43x inflation on tiny trailing dims).

Mosaic notes: everything here is static — no rotates, no dynamic
slices; per-o one-hot masks are built once per tile from a C-sublane
iota and reused across the 18 e-components.  Summation over o is
ascending serial (f32); XLA's axis-reduce may associate differently,
so parity with the XLA path is to fp tolerance, not bitwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MT = 512  # m-tile (lane) width: (C, MT) accumulator tiles, 4 vregs/row


def _coupling_kernel(E, O, C, He_ref, cam_ref, W_ref):
    """One m-tile: He (E, O, MT) f32, cam (O, MT) i32 -> W (E, C, MT).

    masks[o][c, m] = 1.0 where cam[o, m] == c, built once per tile;
    each e-component is then O fused multiply-adds on (C, MT) planes
    with the accumulator living entirely in VMEM/vregs.
    """
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, MT), 0)
    masks = [(cam_ref[o:o + 1, :] == ci).astype(jnp.float32)
             for o in range(O)]                       # O x (C, MT)
    for e in range(E):
        acc = masks[0] * He_ref[e, 0:1, :]
        for o in range(1, O):
            acc = acc + masks[o] * He_ref[e, o:o + 1, :]
        W_ref[e] = acc


@partial(jax.jit, static_argnames=("num_cameras", "interpret"))
def ba_coupling_pallas(He: jnp.ndarray, cam: jnp.ndarray,
                       num_cameras: int,
                       interpret: bool = False) -> jnp.ndarray:
    """W_t (E, C, M) from He (E, O, M) f32 and cam (O, M) int32.

    Out-of-range camera ids (e.g. -1 padding) contribute nothing.
    M pads to a MT multiple internally (cam pad = -1).
    """
    E, O, M = He.shape
    C = num_cameras
    Mp = -(-M // MT) * MT
    if Mp != M:
        He = jnp.pad(He, ((0, 0), (0, 0), (0, Mp - M)))
        cam = jnp.pad(cam, ((0, 0), (0, Mp - M)), constant_values=-1)

    out = pl.pallas_call(
        partial(_coupling_kernel, E, O, C),
        grid=(Mp // MT,),
        in_specs=[
            pl.BlockSpec((E, O, MT), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O, MT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((E, C, MT), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, C, Mp), jnp.float32),
        interpret=interpret,
    )(He, cam)
    return out[:, :, :M]
