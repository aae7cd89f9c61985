"""Serialized TPU job runner.

The tunneled single chip admits ONE client at a time: a new client
blocks (futex) until the orchestrator grants it the chip.  That block IS
the correct wait — do NOT probe first (a probe's claim/release can
consume the next grant and strand the real payload), and do NOT kill a
granted client (the relay wedges for ~10 minutes).

This wrapper just execs the payload and reminds the operator of the
rules; it exists so scripts have one documented entry point for TPU work.

Usage: python tools/tpu_run.py <script.py> [args...]
"""

from __future__ import annotations

import os
import subprocess
import sys


def prune_cache(path: str, max_bytes: int = 4 << 30) -> None:
    """Evict oldest-mtime entries once the persistent compile cache
    exceeds ``max_bytes`` — with min_compile_time_secs=0 every
    sub-second compile is cached and the directory grows without bound
    (advisor r2)."""
    try:
        entries = [(os.path.getmtime(p), os.path.getsize(p), p)
                   for p in (os.path.join(path, f) for f in os.listdir(path))
                   if os.path.isfile(p)]
    except OSError:
        return
    total = sum(s for _, s, _ in entries)
    for _, size, p in sorted(entries):
        if total <= max_bytes:
            break
        try:
            os.remove(p)
            total -= size
        except OSError:
            pass


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    prune_cache(env["JAX_COMPILATION_CACHE_DIR"])
    # Cache even sub-second compiles: each uncached program pays a
    # multi-second relay round trip on the tunneled chip.
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    cmd = [sys.executable] + sys.argv[1:]
    # Serialize TPU clients with a local flock: two concurrent clients
    # do NOT queue cleanly — r3 observed them time-sharing the relay in
    # multi-minute slices, stalling each other's fetches for 9-20 min.
    import fcntl
    lock_path = os.environ.get("RECON_TPU_LOCK",
                               "/tmp/recon_tpu_client.lock")
    lock = open(lock_path, "w")
    print(f"[tpu_run] waiting for local TPU-client lock ({lock_path})...",
          file=sys.stderr, flush=True)
    fcntl.flock(lock, fcntl.LOCK_EX)
    print(f"[tpu_run] launching {cmd[1:]} (will block until the chip "
          f"grant arrives; do not kill; fetches can stall for many "
          f"minutes — be patient)", file=sys.stderr, flush=True)
    try:
        return subprocess.call(cmd, env=env)
    finally:
        fcntl.flock(lock, fcntl.LOCK_UN)


if __name__ == "__main__":
    sys.exit(main())
