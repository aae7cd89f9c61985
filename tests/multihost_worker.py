"""Worker process for the 2-process `jax.distributed` test.

Each process models one HOST of a pod: 4 virtual CPU devices, joined
through a localhost coordinator (`parallel/multihost.initialize_
distributed`).  The pod mesh maps the `frame` axis across hosts (DCN)
per the layout rule in parallel/multihost.py; each process computes its
own frame's stereo take locally (frame DP has zero cross-host traffic
until artifact collection) and the results are collected with a real
cross-process all-gather.

Usage: python multihost_worker.py <port> <process_id> <num_processes> <outdir>
"""

import os
import sys

port, pid, nproc, outdir = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                            sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from reconstruction_tpu.parallel.multihost import (  # noqa: E402
    initialize_distributed, make_pod_mesh)
from multihost_scene import frame_take  # noqa: E402


def main():
    initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    mesh = make_pod_mesh()
    assert mesh.devices.shape == (nproc, 2, 2), mesh.devices.shape
    # The frame axis must span hosts: every device in frame-row f
    # belongs to process f (DCN axis), pair/tile stay intra-host (ICI).
    for f in range(nproc):
        procs = {d.process_index for d in mesh.devices[f].flat}
        assert procs == {f}, (f, procs)

    # A real cross-process collective over the pod mesh: psum of ones
    # over all axes == global device count.
    ones = jax.device_put(np.ones(()), NamedSharding(mesh, P()))

    def total(x):
        return jax.lax.psum(x, ("frame", "pair", "tile"))

    from jax.experimental.shard_map import shard_map
    tot = jax.jit(shard_map(total, mesh=mesh, in_specs=P(),
                            out_specs=P()))(ones)
    np.testing.assert_allclose(np.asarray(tot), 4 * nproc)

    # Frame-sharded batch: this process computes ITS frame's take.
    disp = frame_take(pid)

    # Artifact collection across hosts (the only DCN traffic): gather
    # every frame's disparity to all processes.
    gathered = multihost_utils.process_allgather(jnp.asarray(disp))
    assert gathered.shape[0] == nproc, gathered.shape

    if pid == 0:
        np.savez(os.path.join(outdir, "gathered.npz"),
                 **{f"frame{f}": np.asarray(gathered[f])
                    for f in range(nproc)})
    multihost_utils.sync_global_devices("done")
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
