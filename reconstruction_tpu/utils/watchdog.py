"""Stage watchdogs + failure containment.

The reference's only failure handling is a 20 s `WaitForSingleObject`
watchdog around TextureStitcher (`CCloudOptimization.cpp:396-397,423-440`)
and hard exits elsewhere.  Here: a generic deadline wrapper for host-side
stages, and a NaN guard for device stages (the analogue of the lone
`assert(dCenter==dCenter)` at `CStereoMatching.cpp:621`).  Combined with
the stage checkpoint store (pipeline/checkpoint.py), a failed stage is
retried or skipped without losing the run.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Optional, Tuple

import numpy as np

from reconstruction_tpu.utils.logging import get_logger

log = get_logger(__name__)


class StageTimeout(Exception):
    pass


def run_with_deadline(fn: Callable[[], Any], seconds: float,
                      name: str = "stage") -> Any:
    """Run a host-side stage with a watchdog (the `safe_process`
    equivalent).  On timeout the worker thread is abandoned (daemonized)
    and StageTimeout raised — callers fall back or resume from the last
    checkpoint."""
    result: list = [None]
    error: list = [None]

    def target():
        try:
            result[0] = fn()
        except BaseException as e:  # noqa: BLE001
            error[0] = e

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        log.error("%s exceeded %.1fs deadline; abandoning", name, seconds)
        raise StageTimeout(name)
    if error[0] is not None:
        raise error[0]
    return result[0]


def check_finite(name: str, *arrays) -> None:
    """NaN/Inf guard on stage outputs; raises with the stage name."""
    for i, a in enumerate(arrays):
        a = np.asarray(a)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            bad = (~np.isfinite(a)).sum()
            raise FloatingPointError(
                f"{name}: output {i} has {bad} non-finite values")
