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


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    # Cache even sub-second compiles: each uncached program pays a
    # multi-second relay round trip on the tunneled chip.
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    cmd = [sys.executable] + sys.argv[1:]
    print(f"[tpu_run] launching {cmd[1:]} (will block until the chip "
          f"grant arrives; do not kill)", file=sys.stderr, flush=True)
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
