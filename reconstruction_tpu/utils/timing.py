"""Wall-clock + device timing.

The reference self-times with `clock()` printfs (`reconstruction/main.cpp:7,18,22`,
`CStereoMatching.cpp:40,112`).  Here: a context-manager timer that blocks on
device results so spans are honest under async dispatch, feeding the
structured per-stage stats the reference lacked (SURVEY.md section 5).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax


def block_ready(x: Any) -> Any:
    """Fence an arbitrary pytree of device values.

    block_until_ready alone is NOT a trustworthy fence on the tunneled
    relay (r3: warm stereo levels "completed" in 0.00 s and a 64-shift
    NCC sweep in 0.1 ms — far past the HBM roofline).  The only fence
    that provably waits is a device->host fetch of data DEPENDENT on
    the computation, so this fetches one element of every jax leaf in a
    single concatenated transfer."""
    import numpy as np
    jax.tree_util.tree_map(
        lambda v: v.block_until_ready()
        if hasattr(v, "block_until_ready") else v, x)
    leaves = [v for v in jax.tree_util.tree_leaves(x)
              if isinstance(v, jax.Array) and v.size]
    if leaves:
        import jax.numpy as jnp
        np.asarray(jnp.stack([jnp.ravel(v)[0].astype(jnp.float32)
                              for v in leaves]))
    return x


class Timer:
    """Collects named wall-clock spans; nestable."""

    def __init__(self) -> None:
        self.spans: Dict[str, float] = {}

    class _Span:
        def __init__(self, timer: "Timer", name: str):
            self.timer, self.name = timer, name

        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            self.timer.spans[self.name] = self.timer.spans.get(self.name, 0.0) + dt
            return False

    def span(self, name: str) -> "Timer._Span":
        return Timer._Span(self, name)

    def report(self) -> str:
        total = sum(self.spans.values())
        lines = [f"{k:<32s} {v:8.3f}s" for k, v in self.spans.items()]
        lines.append(f"{'total':<32s} {total:8.3f}s")
        return "\n".join(lines)
