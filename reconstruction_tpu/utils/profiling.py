"""Device profiling + roofline accounting.

The reference's only instrumentation is wall-clock printfs
(`reconstruction/main.cpp:7,18,22`).  BASELINE.md asks for kernel-level
GFLOP/s and HBM-bandwidth roofline reporting; this module provides:

  * `trace(path)`: context manager around `jax.profiler` for device
    traces viewable in TensorBoard/XProf.
  * `Roofline`: analytic FLOP/byte counters for the framework's hot
    kernels + measured-time utilization reports against per-chip peaks.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass
from typing import Dict, Iterator, Optional, Tuple

import jax

# Per-chip peaks (bf16/f32 MXU FLOPs, HBM bytes/s).  Public figures from
# the TPU system documentation ("How to Scale Your Model" hardware
# tables); f32 is half the bf16 MXU rate.
CHIP_PEAKS = {
    "v3": {"flops_f32": 61.5e12, "flops_bf16": 123e12, "hbm_gbps": 900e9},
    "v4": {"flops_f32": 137.5e12, "flops_bf16": 275e12, "hbm_gbps": 1228e9},
    "v5e": {"flops_f32": 98e12, "flops_bf16": 197e12, "hbm_gbps": 819e9},
    "v5p": {"flops_f32": 229.5e12, "flops_bf16": 459e12, "hbm_gbps": 2765e9},
    "v6e": {"flops_f32": 459e12, "flops_bf16": 918e12, "hbm_gbps": 1640e9},
}

# VPU (vector unit) elementwise-op peaks: the (8, 128)-lane vector core
# at ~4 ALU slots/cycle (public architecture description in the TPU
# scaling book); select/compare-heavy kernels never touch the MXU, so
# judging them against flops_f32 misclassifies them as "hbm"-bound.
VPU_PEAKS = {"v3": 3.3e12, "v4": 4.3e12, "v5e": 3.9e12,
             "v5p": 7.4e12, "v6e": 7.4e12}


def resolve_chip(device=None) -> Tuple[str, str]:
    """Map the live device's identity onto a CHIP_PEAKS entry.

    Returns (peaks_key, raw device kind string).  The tunneled axon chip
    reports through `device_kind`; unknown kinds fall back to "v5e"
    (flagged in the returned kind so the bench output records the guess).
    """
    d = device if device is not None else jax.devices()[0]
    kind = getattr(d, "device_kind", "") or d.platform
    k = kind.lower().replace(" ", "")
    for key in ("v6e", "v5p", "v5e", "v4", "v3"):
        if key in k or key.replace("e", "lite") in k or \
           (key == "v5e" and "v5lite" in k) or (key == "v6e" and "v6lite" in k):
            return key, kind
    if "cpu" in k:
        return "v5e", f"{kind} (CPU host; v5e peaks nominal)"
    return "v5e", f"{kind} (unknown; v5e peaks assumed)"


@contextlib.contextmanager
def trace(path: str) -> Iterator[None]:
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class KernelCost:
    flops: float
    hbm_bytes: float
    # which unit executes the FLOPs: "mxu" (matmul-shaped work judged
    # against flops_f32) or "vpu" (elementwise/select work judged
    # against the vector-unit peak)
    compute_unit: str = "mxu"

    def utilization(self, seconds: float, chip: str = "v5e") -> Dict[str, float]:
        peaks = CHIP_PEAKS[chip]
        fpeak = (VPU_PEAKS[chip] if self.compute_unit == "vpu"
                 else peaks["flops_f32"])
        out = {
            "gflops_per_s": self.flops / seconds / 1e9,
            "flops_util": self.flops / seconds / fpeak,
            "hbm_gbps": self.hbm_bytes / seconds / 1e9,
            "hbm_util": self.hbm_bytes / seconds / peaks["hbm_gbps"],
            "bound": ("hbm" if self.hbm_bytes / peaks["hbm_gbps"]
                      > self.flops / fpeak
                      else self.compute_unit),
        }
        if self.compute_unit == "vpu":
            out["compute_unit"] = "vpu"
        return out


def ncc_sweep_cost(H: int, W: int, C: int, radius: int,
                   num_shifts: int) -> KernelCost:
    """Cost of the uniform-shift NCC sweep (stereo/matching.py).

    FLOPs: per shift, C mults + C-1 adds for the channel product, 4r
    separable box adds, ~8 elementwise score/compare ops per pixel.

    Bytes: UNIQUE traffic of an ideally fused sweep — every operand
    read once per sweep and the state written once, because a fused
    (row-block-resident) kernel holds best-score/best-t and the shifted
    windows in VMEM across all shifts.  The r3 model instead counted the
    per-shift operand streams the XLA `fori_loop` formulation re-reads
    each iteration, which (a) double-counts traffic XLA's fusion
    provably avoids and (b) produced hbm_util > 1 (`BENCH_r03.json`
    1.24).  With the unique-byte model utilization is <= 1 by
    construction, and a LOW value is the honest signal that the
    per-iteration loop formulation is paying avoidable re-reads that a
    persistent-state Pallas sweep could skip.

    Unique bytes/px: imgL + imgR (2*C*4), four moment maps (16),
    validR f32 (4), active (1), two bound maps (8), state out (8).
    """
    per_px = (2 * C - 1) + 4 * radius + 10
    flops = float(H * W * per_px * num_shifts)
    unique_bytes = H * W * (8.0 * C + 37.0)
    # box sums / selects / compares never touch the MXU
    return KernelCost(flops=flops, hbm_bytes=unique_bytes,
                      compute_unit="vpu")


def refine_cost(H: int, W: int, iterations: int, s_cap: int,
                build_shifts: int, T: int = 6,
                block: int = 24) -> KernelCost:
    """Cost of the temporally-blocked Pallas refinement
    (ops/refine_pallas.py, the production TPU path).

    HBM: the (MINI + 3)-plane halo'd row slabs stream once per T-sweep
    segment (duplication (block+2T)/block) plus the block writes; the
    per-iteration work is VMEM-resident.  FLOPs: ~230 VPU ops/px/sweep
    (the 34-compare/102-select window taps + parabola/blend math +
    exps) on the duplicated rows.  compute_unit "vpu": the r4 tuner
    showed runtime is insensitive to T (deeper temporal blocking buys
    nothing), i.e. the kernel is bound by the select/compute stream,
    not the per-segment HBM re-read.
    """
    build = ncc_sweep_cost(H, W, 3, 1, build_shifts)
    dup = (block + 2.0 * T) / block
    segments = -(-iterations // T)
    per_seg_bytes = H * W * dup * 4.0 * (32 + 3) + H * W * 4.0
    per_iter_flops = H * W * dup * 230.0
    return KernelCost(
        flops=build.flops + per_iter_flops * iterations,
        hbm_bytes=build.hbm_bytes + per_seg_bytes * segments,
        compute_unit="vpu",
    )


def poisson_cost(resolution: int) -> KernelCost:
    """Spectral Poisson solve: rfftn + irfftn + eigenvalue scaling."""
    n = resolution ** 3
    import math
    fft_flops = 2 * 5.0 * n * math.log2(max(n, 2))
    return KernelCost(flops=fft_flops + 10 * n, hbm_bytes=8.0 * n * 6)


def schur_cost(num_points: int, obs_per_point: int, num_cameras: int) -> KernelCost:
    """BA Schur assembly + reduction (ba/bundle_adjust.py, SoA form).

    FLOPs: ~250/obs analytic Jacobians + ~160/obs block products, plus
    the per-point W/WHinv/Schur contractions.  Bytes: the r4 SoA
    implementation's named streams — 20 component arrays w+r plus the
    54-row stacks per obs, the (18, C, M) coupling reduce that re-reads
    the 18 He rows per camera (the dominant term, x C), and the three
    (6C, M) Schur matmul operand sets.
    """
    m, o, c = num_points, obs_per_point, num_cameras
    n = m * o
    per_obs = 250 + 160
    red = m * (c * 6 * 3 * 3 + c * c * 36 * 3)
    bytes_obs = n * (40 + 54) * 4          # component + stack streams
    bytes_w = n * 18 * 4 * c * 2           # He x one-hot fused reduce
    bytes_s = 6 * (c * 6) * m * 4          # Schur matmul operands
    return KernelCost(flops=float(n * per_obs + red),
                      hbm_bytes=float(bytes_obs + bytes_w + bytes_s))
