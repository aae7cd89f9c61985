"""On-chip check of the global surface stage: Poisson solve at 256^3 on
a bench-scale cloud + the 64 MB chi fetch afterwards (the one large
device->host transfer left in the full bench path now that the cloud
statistics run on the native backend).

Usage: python tools/tpu_run.py tools/repro_poisson_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg):
    print(f"[poisson +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    d = jax.devices()[0]
    log(f"backend ready: {d.device_kind}")

    # Oriented samples of a bumpy sphere (~2M points, bench-scale).
    N = 2_000_000
    rng = np.random.default_rng(0)
    v = rng.normal(size=(N, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = 1.0 + 0.05 * np.sin(5 * v[:, 0]) * np.cos(4 * v[:, 1])
    pts = (v * r[:, None]).astype(np.float32)
    nrm = v.astype(np.float32)

    from reconstruction_tpu.surface.poisson import poisson_reconstruct

    t = time.perf_counter()
    res = poisson_reconstruct(jnp.asarray(pts), jnp.asarray(nrm),
                              jnp.asarray(np.ones(N, bool)),
                              resolution=256, cycles=8, point_weight=0.0)
    jax.block_until_ready(res.chi)
    log(f"poisson 256^3 solve: ok ({time.perf_counter() - t:.2f}s)")

    t = time.perf_counter()
    chi = np.asarray(res.chi)
    log(f"chi fetch {chi.nbytes >> 20} MB: ok "
        f"({time.perf_counter() - t:.2f}s) mean={chi.mean():.4f}")
    t = time.perf_counter()
    dens = np.asarray(res.density)
    iso = float(res.iso)
    log(f"density fetch + iso: ok ({time.perf_counter() - t:.2f}s) "
        f"iso={iso:.4f}")

    # warm rep
    t = time.perf_counter()
    res2 = poisson_reconstruct(jnp.asarray(pts), jnp.asarray(nrm),
                               jnp.asarray(np.ones(N, bool)),
                               resolution=256, cycles=8, point_weight=0.0)
    jax.block_until_ready(res2.chi)
    log(f"poisson warm: ok ({time.perf_counter() - t:.2f}s)")
    t = time.perf_counter()
    _ = np.asarray(res2.chi)
    log(f"chi fetch warm: ok ({time.perf_counter() - t:.2f}s)")
    log("POISSON OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
