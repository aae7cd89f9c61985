"""Cloud-stage backend selection (jax device path vs native host path).

The cloud stages exist in two equivalent formulations:

  * "jax"    — streaming voxel-grid neighbor reduces on the accelerator
               (cloud/neighbors.py), the path that scales with device
               memory bandwidth and shards across a mesh;
  * "native" — C++/OpenMP exact-k-NN grid (native/src/cloud_stats.cpp),
               preferred where each device dispatch pays a tunneled-relay
               round trip (r3 measured the relay wedging on the first
               fetch after the grid kernels; the host path sidesteps the
               whole class while matching PCL's exact-KNN semantics more
               closely than the capped device gather).

"auto" resolves to native on the tunneled single-chip relay (JAX
platform "axon") when the library is built, and jax everywhere else.
Override with RECON_CLOUD_BACKEND=jax|native.
"""

from __future__ import annotations

import os


def resolve_backend(backend: str = "auto") -> str:
    if backend == "auto":
        env = os.environ.get("RECON_CLOUD_BACKEND")
        if env in ("jax", "native"):
            backend = env
    if backend == "native":
        # An explicit "native" request (config or env) must not crash the
        # cloud stages with an opaque None-unpack when the library is
        # missing/stale (advisor r3): fall back to jax with a warning.
        from reconstruction_tpu import native
        if not native.available():
            from reconstruction_tpu.utils.logging import get_logger
            get_logger(__name__).warning(
                "cloud backend 'native' requested but librecon_native.so "
                "is unavailable; falling back to 'jax' "
                "(build with `make -C reconstruction_tpu/native`)")
            return "jax"
        return "native"
    if backend != "auto":
        return backend
    from reconstruction_tpu import native
    if not native.available():
        return "jax"
    try:
        import jax
        plats = str(getattr(jax.config, "jax_platforms", None)
                    or os.environ.get("JAX_PLATFORMS", ""))
    except Exception:  # pragma: no cover - config probing must not fail
        plats = os.environ.get("JAX_PLATFORMS", "")
    return "native" if "axon" in plats.lower() else "jax"
