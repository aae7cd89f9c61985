"""Cold-compile profiler (VERDICT item 7: level 3 takes 356 s on TPU).

Measures, per stereo stage at a given level's shape: trace+lower wall
time and StableHLO op count — the compile-time drivers XLA sees.  Runs
on CPU (lowering is backend-light); absolute TPU compile seconds differ
but op-count ratios hold.

Usage: python tools/compile_profile.py [--level 3] [--full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def count_ops(lowered):
    txt = lowered.as_text()
    return txt.count("\n"), len(txt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=3)
    ap.add_argument("--full", action="store_true",
                    help="also time the whole match_one_level lower")
    ap.add_argument("--compile", action="store_true",
                    help="also run backend compile (CPU) per stage")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from reconstruction_tpu.config import preset, NOMATCH
    from reconstruction_tpu.stereo.margins import find_margin
    from reconstruction_tpu.stereo import matching, constraints, refine
    from reconstruction_tpu.stereo.pipeline import match_one_level

    cfg = preset("myself")
    W, H = cfg.level_size(args.level)
    print(f"level {args.level}: {H}x{W}", file=sys.stderr)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    valid = np.zeros((H, W), bool)
    valid[8:-8, 8:-8] = True
    vj = jnp.asarray(valid)
    m = find_margin(vj, 2)
    disp = jnp.asarray(np.where(valid, 11.0, NOMATCH).astype(np.float32))
    coarse = jnp.asarray(
        np.where(valid[::2, ::2], 5.0, NOMATCH).astype(np.float32))
    iters = cfg.refine_iterations(args.level)

    bl = jnp.zeros((H, W), jnp.float32)
    br = jnp.full((H, W), 20.0, jnp.float32)
    # Arrays are passed as jit ARGUMENTS (closure capture would bake them
    # into the HLO as constants and XLA's constant folding then executes
    # whole stages at compile time — measured 16+ s folding one
    # median_filter reduce).
    stages = {
        "guided_match": (lambda a, b, v, c, mm: matching.guided_match(
            a, b, v, v, c, mm, mm, 2, 2), (img0, img1, vj, coarse, m)),
        "smoothness": (lambda d, mm: constraints.smoothness_constraint(d, mm),
                       (disp, m)),
        "ordering": (lambda d, mm: constraints.ordering_constraint(d, mm),
                     (disp, m)),
        "uniqueness": (lambda d, mm: constraints.uniqueness_constraint(
            d, d, mm, mm), (disp, m)),
        "propagate_bounds": (lambda d, v, mm: constraints.propagate_bounds(
            d, v, mm, mm), (disp, vj, m)),
        "rematch": (lambda a, b, v, d, lo, hi, mm: matching.rematch(
            a, b, v, v, d, lo, hi, mm, 2),
            (img0, img1, vj, disp, bl, br, m)),
        "median": (lambda d, v, mm: constraints.median_filter(d, v, mm, 1),
                   (disp, vj, m)),
        f"refine(x{iters})": (lambda d, a, b, mm: refine.disparity_refine(
            d, a, b, mm, iterations=iters, ws=0.03),
            (disp, img0, img1, m)),
    }
    rows = []
    for name, (fn, fargs) in stages.items():
        t0 = time.perf_counter()
        low = jax.jit(fn).lower(*fargs)
        t_lower = time.perf_counter() - t0
        lines, chars = count_ops(low)
        t_comp = float("nan")
        if args.compile:
            t0 = time.perf_counter()
            low.compile()
            t_comp = time.perf_counter() - t0
        rows.append((name, t_lower, lines, chars, t_comp))
        print(f"[compile] {name:<20s} lower={t_lower:6.2f}s "
              f"hlo_lines={lines:>8d} compile={t_comp:6.2f}s",
              file=sys.stderr, flush=True)

    if args.full:
        mk = jnp.asarray(valid * np.float32(255))

        def full(a, b, m0, m1):
            return match_one_level(a, b, m0, m1, None, 0, refine_iters=iters)

        t0 = time.perf_counter()
        low = jax.jit(full).lower(img0, img1, mk, mk)
        t_lower = time.perf_counter() - t0
        lines, chars = count_ops(low)
        print(f"[compile] {'match_one_level':<20s} lower={t_lower:6.2f}s "
              f"hlo_lines={lines:>8d}", file=sys.stderr, flush=True)

    print("| stage | lower s | HLO lines | cpu compile s |")
    print("|---|---|---|---|")
    for name, tl, lines, chars, tc in rows:
        print(f"| {name} | {tl:.2f} | {lines} | {tc:.2f} |")


if __name__ == "__main__":
    main()
