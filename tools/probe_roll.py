"""Probe pltpu.roll with dynamic shift on the real TPU vs expectation.

Usage: python tools/tpu_run.py tools/probe_roll.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.devices()[0].device_kind, flush=True)

    R, P = 8, 512

    def kernel(s_ref, x_ref, o_ref):
        off = s_ref[0]
        x = x_ref[...]
        rolled = pltpu.roll(x, (P - off) % P, axis=1)
        o_ref[...] = rolled

    x = np.arange(R * P, dtype=np.float32).reshape(R, P)

    for off in (0, 1, 7, 130, 300):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, P), jnp.float32),
        )(jnp.asarray([off], jnp.int32), jnp.asarray(x))
        got = np.asarray(out)
        want = np.roll(x, -(off % P), axis=1)
        print(f"off={off}: equal={np.array_equal(got, want)} "
              f"got[0,:5]={got[0,:5].tolist()}", flush=True)

    # static roll control
    def kernel2(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], P - 7, axis=1)

    out = pl.pallas_call(
        kernel2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, P), jnp.float32),
    )(jnp.asarray(x))
    print("static off=7 equal:",
          np.array_equal(np.asarray(out), np.roll(x, -7, axis=1)),
          flush=True)

    # 3-D variant (like the kernel's Rw[c] slices inside a (C, rows, P))
    def kernel3(s_ref, x_ref, o_ref):
        off = s_ref[0]
        o_ref[...] = pltpu.roll(x_ref[...], (P - off) % P, axis=2)

    x3 = np.arange(3 * R * P, dtype=np.float32).reshape(3, R, P)
    out = pl.pallas_call(
        kernel3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, R, P), jnp.float32),
    )(jnp.asarray([5], jnp.int32), jnp.asarray(x3))
    print("3d dyn off=5 equal:",
          np.array_equal(np.asarray(out), np.roll(x3, -5, axis=2)),
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
