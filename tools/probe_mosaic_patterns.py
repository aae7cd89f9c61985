"""Micro-probes for the Mosaic lowering patterns the MXU sweep kernel
uses — isolates which construct trips "Shape mismatch in input,
indices and output" / Mosaic internal errors, one TPU session for all
answers.

    python tools/tpu_run.py tools/probe_mosaic_patterns.py
"""

from __future__ import annotations

import sys
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"backend: {jax.devices()[0].device_kind}", flush=True)

    def run(tag, fn):
        try:
            out = fn()
            np.asarray(out)
            print(f"{tag}: OK", flush=True)
        except Exception as e:
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    B, TP, W = 8, 80, 256

    # A. mixed scalar+slice read of a 4D ref
    def kA(x_ref, o_ref):
        o_ref[...] = x_ref[0, 1, 4:4 + B, :]

    run("A read4d scalar+slice", lambda: pl.pallas_call(
        kA, out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32))(
            jnp.ones((1, 3, 24, W), jnp.float32)))

    # B. mixed scalar + full + slice read of a 3D ref
    def kB(x_ref, o_ref):
        o_ref[...] = x_ref[0, :, 64:64 + 128]

    run("B read3d scalar+slice", lambda: pl.pallas_call(
        kB, out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32))(
            jnp.ones((1, B, W), jnp.float32)))

    # C. mid-axis slice STORE into a 3D scratch
    def kC(x_ref, o_ref, sc_ref):
        sc_ref[:, 5:6, :] = x_ref[...][:, None, :]
        o_ref[...] = sc_ref[:, 5, :]

    run("C scratch mid-slice store", lambda: pl.pallas_call(
        kC, out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, TP, W), jnp.float32)])(
            jnp.ones((B, W), jnp.float32)))

    # D. batched dot_general (B, TP, NT) x (B, TP, XT)
    def kD(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    run("D batched dot_general", lambda: pl.pallas_call(
        kD, out_shape=jax.ShapeDtypeStruct((B, W, 128), jnp.float32))(
            jnp.ones((B, TP, W), jnp.bfloat16),
            jnp.ones((B, TP, 128), jnp.bfloat16)))

    # E. dynamic 3D roll along lanes + static 3D roll along sublanes
    def kE(x_ref, s_ref, o_ref):
        r1 = pltpu.roll(x_ref[...], (W - s_ref[0]) % W, axis=2)
        r2 = pltpu.roll(r1, 8, axis=1)
        o_ref[...] = r2

    run("E 3d rolls", lambda: pl.pallas_call(
        kE,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 64, W), jnp.float32))(
            jnp.ones((B, 64, W), jnp.float32),
            jnp.asarray([7], jnp.int32)))

    # F. (B, NT, 1)-broadcast multiply against (B, NT, XT)
    def kF(x_ref, o_ref):
        v = x_ref[...]                       # (B, 64, 128)
        m = v[:, :, 0:1]                     # (B, 64, 1)
        o_ref[...] = v * m + v[:, 0:1, :]

    run("F tiny-lane broadcast", lambda: pl.pallas_call(
        kF, out_shape=jax.ShapeDtypeStruct((B, 64, 128), jnp.float32))(
            jnp.ones((B, 64, 128), jnp.float32)))

    # G. value [:, None, :] expand
    def kG(x_ref, o_ref):
        o_ref[...] = x_ref[...][:, None, :] * jnp.ones(
            (B, 4, W), jnp.float32)

    run("G newaxis expand", lambda: pl.pallas_call(
        kG, out_shape=jax.ShapeDtypeStruct((B, 4, W), jnp.float32))(
            jnp.ones((B, W), jnp.float32)))

    return 0


if __name__ == "__main__":
    sys.exit(main())
