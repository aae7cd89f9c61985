"""Pair-sharding scaling harness.

BASELINE.md asks for views-fused/s at 1 chip, 1 host, and N>=2 hosts with
>= 80% 2-host scaling efficiency.  Only one physical chip is reachable in
this environment, so this harness measures the SPMD program at N virtual
devices (CPU) or N real devices (pod) with identical code: on real
hardware the same invocation reports true scaling.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py

Prints one JSON line per device count.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from reconstruction_tpu.parallel.mesh import make_mesh
    from reconstruction_tpu.parallel.sharded import match_level_pairs_sharded

    H, W = 120, 160
    rng = np.random.default_rng(0)
    devices = jax.devices()
    results = []
    for n in (1, 2, len(devices)):
        if n > len(devices):
            continue
        P = n  # one pair per device
        imgs0 = jnp.asarray(rng.uniform(0, 255, (P, H, W, 3)).astype(np.float32))
        imgs1 = jnp.asarray(rng.uniform(0, 255, (P, H, W, 3)).astype(np.float32))
        masks = np.zeros((P, H, W), np.float32)
        masks[:, 8:-8, 8:-8] = 255.0
        masks = jnp.asarray(masks)
        mesh = make_mesh(devices[:n], frame=1, pair=n, tile=1)
        out = match_level_pairs_sharded(mesh, imgs0, imgs1, masks, masks,
                                        None, 0, refine_iters=12)
        out.disp0.block_until_ready()
        t0 = time.perf_counter()
        out = match_level_pairs_sharded(mesh, imgs0, imgs1, masks, masks,
                                        None, 0, refine_iters=12)
        out.disp0.block_until_ready()
        dt = time.perf_counter() - t0
        vps = 2 * P / dt
        results.append((n, vps))
        base = results[0][1]
        eff = vps / (n * base) if base else 0.0
        print(json.dumps({"devices": n, "views_per_sec": round(vps, 3),
                          "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
