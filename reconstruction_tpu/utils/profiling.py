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

    def utilization(self, seconds: float, chip: str = "v5e") -> Dict[str, float]:
        peaks = CHIP_PEAKS[chip]
        return {
            "gflops_per_s": self.flops / seconds / 1e9,
            "flops_util": self.flops / seconds / peaks["flops_f32"],
            "hbm_gbps": self.hbm_bytes / seconds / 1e9,
            "hbm_util": self.hbm_bytes / seconds / peaks["hbm_gbps"],
            "bound": ("hbm" if self.hbm_bytes / peaks["hbm_gbps"]
                      > self.flops / peaks["flops_f32"] else "flops"),
        }


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
    return KernelCost(flops=flops, hbm_bytes=unique_bytes)


def refine_cost(H: int, W: int, iterations: int, s_cap: int,
                build_shifts: int) -> KernelCost:
    """Cost of the banded-cost-volume refinement (stereo/refine.py)."""
    build = ncc_sweep_cost(H, W, 3, 1, build_shifts)
    per_iter_flops = H * W * 60.0
    per_iter_bytes = H * W * 4.0 * 8
    return KernelCost(
        flops=build.flops + per_iter_flops * iterations,
        hbm_bytes=build.hbm_bytes + per_iter_bytes * iterations,
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
