"""Pair-sharding scaling harness (BASELINE.md >=80% 2-host target).

Only one physical chip is reachable in this environment, so this harness
measures the SPMD stereo program at N virtual CPU devices with the SAME
code that runs on a pod — on real hardware the same invocation reports
true scaling.

What the CPU proxy can and cannot show (read before quoting numbers):

  * The 8 virtual devices share the host's 2 physical cores, so WALL
    time cannot stay flat under weak scaling — ideal wall efficiency on
    this host is min(cores, n) / n, NOT 1.  Wall-clock "efficiency"
    against that bound is reported as `wall_eff_vs_host_bound`.
  * What the proxy CAN pin is the SPMD program itself: whether per-pair
    device work stays constant as the axis widens (no superlinear
    padding/collective/compile blowup).  That is `cpu_eff`: process CPU
    seconds per pair at n devices vs 1 device.  cpu_eff ~ 1.0 means the
    program does the same work per pair regardless of axis width, i.e.
    scaling on real hardware rides the interconnect, not the program.

Workload: weak scaling, one camera pair per device, the FULL 3-level
recipe (brute level 0, guided above, both directions, refine 6+6*level)
at 320x240 finest — a realistic miniature of the bench shape.

    python tools/bench_scaling.py            # pair axis (default)
    python tools/bench_scaling.py --axis frame   # frame-axis variant

Prints one JSON line per device count; run `--json out.json` to also
write the list.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def run_axis(axis: str, counts, levels: int, base_wh, repeats: int):
    import jax
    import jax.numpy as jnp
    from reconstruction_tpu.parallel.mesh import make_mesh
    from reconstruction_tpu.parallel.sharded import match_level_pairs_sharded
    from reconstruction_tpu.core.pyramid import build_pyramid

    devices = jax.devices()
    rng = np.random.default_rng(0)
    results = []

    W0, H0 = base_wh
    Wf, Hf = W0 << (levels - 1), H0 << (levels - 1)

    def make_batch(P):
        # REAL stereo pairs (bench.synth_pair: band-limited texture +
        # smooth 40+-25 px disparity field).  Unrelated random views
        # make the coarse disparity garbage, which blows the guided
        # hole-fallthrough search bounds to near-full-row ranges and
        # turns a ~30 s CPU proxy run into tens of minutes.
        import bench as benchmod
        i0s, i1s, ms = [], [], []
        for _ in range(P):
            iL, iR, mk = benchmod.synth_pair(Hf, Wf, rng)
            i0s.append(iL)
            i1s.append(iR)
            ms.append(mk)
        return (jnp.asarray(np.stack(i0s)), jnp.asarray(np.stack(i1s)),
                jnp.asarray(np.stack(ms)))

    for n in counts:
        if n > len(devices):
            continue
        P = n  # weak scaling: one pair per device
        i0, i1, m = make_batch(P)
        kw = dict(frame=1, pair=n, tile=1)
        if axis == "frame":
            kw = dict(frame=n, pair=1, tile=1)
        mesh = make_mesh(devices[:n], **kw)

        def full_recipe():
            p0 = jax.jit(jax.vmap(lambda a: build_pyramid(a, levels)))(i0)
            p1 = jax.jit(jax.vmap(lambda a: build_pyramid(a, levels)))(i1)
            mm0 = jax.jit(jax.vmap(lambda a: build_pyramid(a, levels)))(m)
            state = None
            for level in range(levels):
                state = match_level_pairs_sharded(
                    mesh, p0[level], p1[level], mm0[level], mm0[level],
                    state, level, axis=axis,
                    refine_iters=6 + 6 * level)
            return state

        state = full_recipe()          # compile
        state.disp0.block_until_ready()
        best_wall, best_cpu = np.inf, np.inf
        for _ in range(repeats):
            t0, c0 = time.perf_counter(), time.process_time()
            state = full_recipe()
            state.disp0.block_until_ready()
            best_wall = min(best_wall, time.perf_counter() - t0)
            best_cpu = min(best_cpu, time.process_time() - c0)
        vps = 2 * P / best_wall
        cpu_per_pair = best_cpu / P
        rec = {"axis": axis, "devices": n, "pairs": P,
               "finest": [Wf, Hf], "levels": levels,
               "wall_s": round(best_wall, 3),
               "views_per_sec": round(vps, 3),
               "cpu_s_per_pair": round(cpu_per_pair, 3)}
        if results:
            base = results[0]
            import os
            cores = os.cpu_count() or 1
            ideal_wall = base["wall_s"] * n / min(n, cores)
            rec["wall_eff_vs_host_bound"] = round(
                ideal_wall / best_wall, 3)
            rec["cpu_eff"] = round(
                base["cpu_s_per_pair"] / cpu_per_pair, 3)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (default cpu: the sitecustomize "
                         "pins JAX_PLATFORMS=axon and env vars do NOT "
                         "override it — only jax.config does; 'tpu'/"
                         "'axon' only via tools/tpu_run.py)")
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual device count when platform is cpu")
    ap.add_argument("--axis", default="pair", choices=["pair", "frame"])
    ap.add_argument("--both", action="store_true",
                    help="run pair AND frame axis variants")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--base", type=int, nargs=2, default=(80, 60),
                    metavar=("W", "H"))
    ap.add_argument("--counts", type=int, nargs="+", default=(1, 2, 4, 8))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    if args.platform == "cpu":
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}")
        import jax
        jax.config.update("jax_platforms", "cpu")

    axes = ["pair", "frame"] if args.both else [args.axis]
    all_res = []
    for ax in axes:
        all_res += run_axis(ax, args.counts, args.levels,
                            tuple(args.base), args.repeats)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(all_res, f, indent=1)


if __name__ == "__main__":
    main()
