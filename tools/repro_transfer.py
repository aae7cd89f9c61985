"""Probe: which device->host transfers kill the tunneled TPU worker?

Evidence so far (r2 bench + r3 ladder): compute completes fine, but the
first device->host np.asarray of a large/bool array dies with
UNAVAILABLE.  This ladder transfers arrays of increasing size and
varying dtype, printing after each, to pin the poison precisely.

Usage: python tools/tpu_run.py tools/repro_transfer.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[xfer +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    d = jax.devices()[0]
    log(f"backend ready: {d.device_kind}")

    def step(name, fn):
        t = time.perf_counter()
        out = fn()
        log(f"{name}: ok ({time.perf_counter() - t:.2f}s) -> {out}")
        return out

    one = jnp.ones((8,), jnp.float32) + 1
    step("tiny f32 transfer", lambda: float(np.asarray(one).sum()))

    b_small = jnp.arange(4096) % 2 == 0
    step("bool 4k transfer", lambda: int(np.asarray(b_small).sum()))

    N = 2_457_600
    f_big = jnp.linspace(0.0, 1.0, N)
    step("f32 2.45M transfer", lambda: float(np.asarray(f_big).sum()))

    i_big = jnp.arange(N, dtype=jnp.int32)
    step("int32 2.45M transfer", lambda: int(np.asarray(i_big)[-1]))

    u_big = (jnp.arange(N) % 251).astype(jnp.uint8)
    step("uint8 2.45M transfer", lambda: int(np.asarray(u_big)[-1]))

    b_med = jnp.arange(300_000) % 3 == 0
    step("bool 300k transfer", lambda: int(np.asarray(b_med).sum()))

    b_big = jnp.arange(N) % 3 == 0
    step("bool 2.45M VALUE on device (sum)",
         lambda: int(jnp.sum(b_big)))
    step("bool 2.45M cast->u8 transfer",
         lambda: int(np.asarray(b_big.astype(jnp.uint8)).sum()))
    step("bool 2.45M transfer", lambda: int(np.asarray(b_big).sum()))
    log("ALL TRANSFERS OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
