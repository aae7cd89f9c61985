"""Serialized TPU job runner.

The tunneled single chip admits ONE client at a time, and a client killed
mid-execution wedges the relay for minutes.  This wrapper (a) waits for
the chip to accept work before launching the payload, (b) runs the
payload in-process so there is exactly one claim, (c) never requires an
external kill: pass --budget to bound wall time cooperatively between
stages.

Usage: python tools/tpu_run.py <script.py> [args...]
"""

from __future__ import annotations

import subprocess
import sys
import time


def wait_for_chip(max_wait: float = 1200.0, probe_timeout: float = 75.0) -> bool:
    probe = ("import jax, jax.numpy as jnp; "
             "print((jnp.ones((8,128))*2).sum())")
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"[tpu_run] chip busy/wedged; retrying "
              f"({time.time() - t0:.0f}s elapsed)", file=sys.stderr,
              flush=True)
        time.sleep(30)
    return False


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    if not wait_for_chip():
        print("[tpu_run] chip never became available", file=sys.stderr)
        return 2
    cmd = [sys.executable] + sys.argv[1:]
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
