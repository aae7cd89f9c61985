"""Headline benchmark: views FUSED per second per chip, end to end.

Workload = the reference's "myself" rig shape (`BatchProcess/main.cpp:
30-35,59-61`): 4 camera pairs {0,1},{2,3},{4,5},{7,6}, PyrmNum=4, base
160x240 -> finest 1280x1920 — run through the ENTIRE pipeline the
reference times as "total time" (`reconstruction/main.cpp:22`): per pair
rectify -> pyramid match (full per-level recipe incl. 30+30*level
refinement sweeps) -> triangulate -> SOR -> normals; then global MLS ->
Poisson(grid 256^3) -> marching -> trim/cleanup/smooth -> texture.  One
"view fused" = one camera image carried from pixels to the final
textured mesh (a pair fuses 2 views; both directions are matched like
the reference).

The scene is a synthetic calibrated 8-camera rig around an analytic
height-field surface (tests/synthetic.py), rendered once at the finest
working resolution and cached under .bench_cache/ — geometry is known
exactly, so the bench also reports point-to-surface RMSE as a fidelity
cross-check.

The reference publishes no numbers (BASELINE.md); `vs_baseline` compares
against the operation-count model of its CPU MATCHING stage alone
(0.017 views/s, BENCH_NOTES.md) — conservative toward the reference,
since our numerator additionally pays for its PCL/meshing minutes.

Prints ONE JSON line:
  {"metric": "views_fused_per_sec_per_chip", "value": N, "unit": "views/s",
   "vs_baseline": R, "chip": ..., "matching_s": ..., "total_s": ...,
   "stages_s": {...}, "mesh": {...}, "kernels": {per-kernel measured
   roofline: gflops_per_s / hbm_gbps / utilization / bound}}

Execution model (r3): the tunneled chip's grant is TIME-BOXED (~12-15
min observed in r2 — sessions die with "TPU worker crashed" regardless
of workload), so one monolithic process is fragile.  The default entry
is an ORCHESTRATOR that runs each measurement phase (kernels -> stereo
-> full) as its own subprocess = its own grant window, with one retry,
merging whatever phases survive into the final JSON line.  A crash in
the full pipeline can no longer wipe the kernel rooflines (the r2
failure mode), and every phase ratchets the persistent compile cache.

Env knobs:
  RECON_BENCH_MODE=full|stereo   stereo = matching-only loop (A/B tool)
  RECON_BENCH_PAIRS=N            limit pair count (default 4)
  RECON_BENCH_REPS=N             timed repetitions (default: 1 full run
                                 after the cold run; stereo mode 3)
  RECON_BENCH_PHASE=...          internal: run ONE phase inline
  RECON_BENCH_SUBPROC=0          run all phases inline (CPU smoke/tests)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REFERENCE_VIEWS_PER_SEC = 0.017  # see BENCH_NOTES.md
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))


# ---------------------------------------------------------------------------
# scene
# ---------------------------------------------------------------------------

def build_rig(image_size, num_cameras=8, span_deg=42.0, tag="myself"):
    """Calibrated rig + rendered views at the working resolution, cached
    (rendering the analytic surface at 1280x1920 x8 takes ~2 min once)."""
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(
        CACHE, f"rig_{tag}_{image_size[0]}x{image_size[1]}_{num_cameras}.npz")
    if os.path.exists(path):
        z = np.load(path)
        n = int(z["n"])
        return ([{"K": z[f"K{i}"], "Rt": z[f"Rt{i}"]} for i in range(n)],
                [z[f"img{i}"] for i in range(n)],
                [z[f"mask{i}"] for i in range(n)])
    from synthetic import make_stereo_scene
    print(f"[bench] rendering {num_cameras} views at {image_size} "
          f"(cached after first run)...", file=sys.stderr, flush=True)
    cams, imgs, masks = make_stereo_scene(
        image_size=image_size, span_deg=span_deg, num_cameras=num_cameras)
    out = {"n": num_cameras}
    for i, (c, img, msk) in enumerate(zip(cams, imgs, masks)):
        out[f"K{i}"] = np.asarray(c.K, np.float64)
        out[f"Rt{i}"] = np.asarray(c.Rt, np.float64)
        out[f"img{i}"] = np.clip(img, 0, 255).astype(np.uint8)
        out[f"mask{i}"] = (msk > 127).astype(np.uint8) * np.uint8(255)
    np.savez_compressed(path, **out)
    z = np.load(path)
    return ([{"K": z[f"K{i}"], "Rt": z[f"Rt{i}"]} for i in range(num_cameras)],
            [z[f"img{i}"] for i in range(num_cameras)],
            [z[f"mask{i}"] for i in range(num_cameras)])


def bench_config(npairs):
    """The myself preset with cloud radii scaled to the synthetic scene's
    world units (the reference's 2.5 suits its mm-scale captures; the
    scene surface spans ~3.2 units at ~0.002 point spacing)."""
    import dataclasses
    from reconstruction_tpu.config import preset
    cfg = preset("myself")
    kw = {}
    if "RECON_BENCH_BASE" in os.environ:  # smoke-test scaling, e.g. "40x60"
        w, h = os.environ["RECON_BENCH_BASE"].split("x")
        kw["lowest_level_size"] = (int(w), int(h))
    if "RECON_BENCH_LEVELS" in os.environ:
        kw["pyramid_levels"] = int(os.environ["RECON_BENCH_LEVELS"])
    surface = cfg.surface
    if "RECON_BENCH_GRID" in os.environ:
        surface = dataclasses.replace(
            surface, grid_resolution=int(os.environ["RECON_BENCH_GRID"]))
    stereo = cfg.stereo
    if "RECON_REFINE_CV_DTYPE" in os.environ:  # bf16-refine A/B knob
        stereo = dataclasses.replace(
            stereo, refine_cv_dtype=os.environ["RECON_REFINE_CV_DTYPE"])
    return cfg.replace(
        cam_pairs=cfg.cam_pairs[:npairs],
        cloud=dataclasses.replace(cfg.cloud, mls_radius=0.02),
        stereo=stereo,
        surface=surface,
        **kw)


def make_pairs(cfg, cams, imgs, masks):
    from reconstruction_tpu.pipeline.reconstruct import PairInput
    pairs = []
    for (a, b) in cfg.cam_pairs:
        pairs.append(PairInput(
            image0=imgs[a].astype(np.float32),
            image1=imgs[b].astype(np.float32),
            mask0=masks[a].astype(np.float32),
            mask1=masks[b].astype(np.float32),
            K0=cams[a]["K"], Rt0=cams[a]["Rt"],
            K1=cams[b]["K"], Rt1=cams[b]["Rt"]))
    return pairs


# ---------------------------------------------------------------------------
# measured kernel rooflines (BASELINE.md: NCC cost volume, refine, BA Schur)
# ---------------------------------------------------------------------------

def _time_op(fn, *args, reps=3):
    """On-device seconds per call, FETCH-fenced: on the tunneled relay
    block_until_ready can return before execution finishes (r3 measured
    a 64-shift NCC sweep "completing" in 0.1 ms — 30x past the HBM
    roofline), so the only trustworthy fence is a device->host fetch of
    a value that depends on every timed dispatch.  Fetch latency is
    measured separately and subtracted; reps grow geometrically until
    the timed window dwarfs it."""
    import jax
    import jax.numpy as jnp

    for attempt in range(4):  # remote_compile relay transients (see
        try:                  # _time_chained) — cached retry is cheap
            out = fn(*args)
            jax.block_until_ready(out)
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 3 or "remote_compile" not in str(e):
                raise
            print(f"[bench] remote_compile transient (attempt "
                  f"{attempt + 1}), retrying: {str(e)[:120]}",
                  file=sys.stderr, flush=True)
            time.sleep(5.0)
    first = jax.tree_util.tree_leaves(out)[0]
    float(jnp.ravel(first)[0].astype(jnp.float32))  # warm + hard sync

    # fetch-latency floor (median of 3 tiny dependent fetches)
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.ravel(first)[0].astype(jnp.float32) + 1.0)
        lat.append(time.perf_counter() - t0)
    fetch_s = float(np.median(lat))

    n = max(reps, 1)
    while True:
        t0 = time.perf_counter()
        acc = []
        for _ in range(n):
            r = fn(*args)
            acc.append(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[:1]
                       .astype(jnp.float32))
        float(jnp.concatenate(acc).sum())  # one fetch fencing all n
        dt = time.perf_counter() - t0
        if dt > max(10.0 * fetch_s, 1.0) or n >= 64:
            return max(dt - fetch_s, 1e-9) / n
        n *= 2


def _time_chained(make_loop, n_lo, n_hi, reps=2):
    """Pure on-device seconds per unit of work via TWO-POINT
    differencing of a single jitted lax.fori_loop: (t(n_hi) - t(n_lo))
    / (n_hi - n_lo).  Cancels BOTH the per-dispatch relay round trip
    (~0.1-0.6 s, which swamped per-call timings) and the fetch fence
    latency; the loop body chains each iteration's output into the next
    input so nothing can be elided.

    make_loop(n) -> a 0-arg callable returning a scalar jax value that
    depends on n chained kernel executions.
    """
    import jax
    import jax.numpy as jnp

    def run(n):
        fn = make_loop(n)
        # The relay's remote_compile endpoint drops connections
        # transiently on large programs ("response body closed before
        # all bytes were read"); the compile itself lands in the
        # persistent cache, so a short retry resumes where it left off.
        for attempt in range(4):
            try:
                float(jnp.asarray(fn()).astype(jnp.float32))  # compile+warm
                break
            except Exception as e:  # noqa: BLE001 — relay transient
                if attempt == 3 or "remote_compile" not in str(e):
                    raise
                print(f"[bench] remote_compile transient (attempt "
                      f"{attempt + 1}), retrying: {str(e)[:120]}",
                      file=sys.stderr, flush=True)
                time.sleep(5.0)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.asarray(fn()).astype(jnp.float32))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # Escalate the spread until the delta dominates the relay's ~30 ms
    # fetch/dispatch jitter — a 26 ms delta once measured NEGATIVE and
    # reported a 14 exaFLOP/s "roofline".
    t_lo = run(n_lo)
    while True:
        d = run(n_hi) - t_lo
        if d > 0.12 or n_hi >= 128:
            return max(d, 1e-9) / (n_hi - n_lo)
        n_hi = min(2 * n_hi, 128)


def measure_kernels(chip):
    """On-chip seconds for the three hot kernels, fed through the
    analytic FLOP/byte model (utils/profiling.py) -> measured roofline."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from reconstruction_tpu.stereo.matching import ncc_sweep_match
    from reconstruction_tpu.stereo.refine import disparity_refine
    from reconstruction_tpu.stereo.margins import find_margin
    from reconstruction_tpu.ba.bundle_adjust import BAProblem, ba_step
    from reconstruction_tpu.config import NOMATCH
    from reconstruction_tpu.utils.profiling import (
        ncc_sweep_cost, refine_cost, schur_cost)

    H, W = 1920, 1280  # finest level
    rng = np.random.default_rng(7)
    imgL, imgR, mask = synth_pair(H, W, rng)
    valid = mask > 127
    m = find_margin(jnp.asarray(valid), 2)
    imgLj, imgRj = jnp.asarray(imgL), jnp.asarray(imgR)
    vj = jnp.asarray(valid)
    out = {}

    # 1. NCC cost-volume sweep: fixed 64-shift span (disparity 0..63
    # per pixel — bounds are ABSOLUTE target columns, so they must track
    # x; r3 originally passed [0, 63] for every pixel, which makes the
    # sweep cover s in [-(W-1), 63] = 1343 shifts and invalidated the
    # 64-shift cost model).  The fori_loop body perturbs the left image
    # by the previous disparity's [0,0] so iterations chain (nothing
    # hoists/elides).
    nsh = 64
    xg = jnp.arange(W, dtype=jnp.int32)[None, :]
    lo = jnp.broadcast_to(xg, (H, W))
    hi = jnp.minimum(lo + nsh - 1, W - 1)

    def make_sweep_loop(n):
        @jax.jit
        def fn():
            def body(i, acc):
                d = ncc_sweep_match(imgLj + acc * 1e-30, imgRj, vj, vj,
                                    lo, hi, 2).disparity
                return acc + d[0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return fn

    t = _time_chained(make_sweep_loop, 1, 5)
    c = ncc_sweep_cost(H, W, 3, 2, nsh)
    out["ncc_sweep"] = dict(seconds=round(t, 4), **_round(
        c.utilization(t, chip)))

    # 1b. MXU sweep (ops/ncc_sweep_mxu.py, bit-equal): same workload on
    # the matmul formulation — reported separately so the roofline
    # records both engines (VERDICT r4 weak #1).
    if "tpu" in jax.devices()[0].platform.lower() or os.environ.get(
            "RECON_BENCH_MXU"):
        try:
            from reconstruction_tpu.ops.ncc_sweep_mxu import (
                ncc_sweep_match_mxu)

            def make_mxu_loop(n):
                @jax.jit
                def fn():
                    def body(i, acc):
                        d = ncc_sweep_match_mxu(
                            imgLj + acc * 1e-30, imgRj, vj, vj,
                            lo, hi, 2).disparity
                        return acc + d[0, 0]
                    return jax.lax.fori_loop(0, n, body, jnp.float32(0))
                return fn

            t = _time_chained(make_mxu_loop, 1, 5)
            out["ncc_sweep_mxu"] = dict(seconds=round(t, 4), **_round(
                c.utilization(t, chip)))
        except Exception as e:  # Mosaic lowering risk: record, not fail
            out["ncc_sweep_mxu"] = {"error":
                                    f"{type(e).__name__}: {str(e)[:160]}"}

    # 2. Subpixel refine, 30 sweeps at the finest shape — the SAME
    # implementation the pipeline selects on this backend (the Pallas
    # temporally-blocked kernel on TPU, the XLA mini-CV path elsewhere).
    # Chained by feeding each refine's output into the next call.
    disp0 = jnp.asarray(np.where(valid, 40.0, NOMATCH).astype(np.float32))
    on_tpu = "tpu" in jax.devices()[0].platform.lower()
    if on_tpu:
        from reconstruction_tpu.ops.refine_pallas import disparity_refine_pallas
        refine_fn = disparity_refine_pallas
    else:
        refine_fn = disparity_refine

    def make_refine_loop(n):
        @jax.jit
        def fn():
            def body(i, d):
                return refine_fn(d, imgLj, imgRj, m,
                                 iterations=30, ws=0.03)
            return jax.lax.fori_loop(0, n, body, disp0)[0, 0]
        return fn

    t = _time_chained(make_refine_loop, 1, 3)
    c = refine_cost(H, W, 30, 128, build_shifts=40)
    out["refine"] = dict(seconds=round(t, 4), **_round(c.utilization(t, chip)))

    # 3. BA Schur step: 16 cams, 64k points, 8 obs/point.
    C, M, O = 16, 1 << 16, 8
    K = np.tile(np.array([[1000.0, 0, 640], [0, 1000, 960], [0, 0, 1]],
                         np.float32), (C, 1, 1))
    Rt0 = np.tile(np.hstack([np.eye(3), [[0], [0], [8.0]]]).astype(np.float32),
                  (C, 1, 1))
    prob = BAProblem(
        K=jnp.asarray(K), Rt0=jnp.asarray(Rt0),
        points0=jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32)),
        obs_uv=jnp.asarray(rng.uniform(0, 1000, (M, O, 2)).astype(np.float32)),
        obs_cam=jnp.asarray(rng.integers(0, C, (M, O)).astype(np.int32)),
        obs_ok=jnp.asarray(np.ones((M, O), bool)))
    poses0 = jnp.zeros((C, 6), jnp.float32)

    def make_schur_loop(n):
        @jax.jit
        def fn():
            def body(i, carry):
                poses, points = carry
                poses2, points2, cost = ba_step(prob, poses, points, C)
                return (poses2, points2)
            poses, points = jax.lax.fori_loop(0, n, body,
                                              (poses0, prob.points0))
            return poses[0, 0]
        return fn

    t = _time_chained(make_schur_loop, 1, 5)
    c = schur_cost(M, O, C)
    out["ba_schur"] = dict(seconds=round(t, 4),
                           **_round(c.utilization(t, chip)))
    return out


def _round(d):
    return {k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in d.items()}


def synth_pair(H, W, rng):
    """Synthetic rectified pair with a smooth disparity field (stereo-mode
    workload and kernel-roofline inputs)."""
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    tex = rng.uniform(0, 255, (H, W + 256, 3)).astype(np.float32)
    for ax in (0, 1):
        for _ in range(2):
            tex = 0.5 * tex + 0.25 * (np.roll(tex, 1, ax) + np.roll(tex, -1, ax))
    disp = 40.0 + 25.0 * np.sin(2 * np.pi * xx / W) * np.cos(2 * np.pi * yy / H)
    imgL = tex[:, :W]
    xs = (xx + disp).astype(np.int32) % (W + 256)
    imgR = tex[yy, xs]
    mask = np.zeros((H, W), np.float32)
    mask[8:-8, 8:-8] = 255.0
    return imgL, imgR, mask


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------

def aggregate_stages(spans):
    """Collapse pairN/* spans; keep global stage names."""
    agg = {}
    for k, v in spans.items():
        key = k.split("/", 1)[1] if k.startswith("pair") else k
        agg[key] = agg.get(key, 0.0) + v
    return {k: round(v, 3) for k, v in agg.items()}


def run_full(npairs, reps):
    from reconstruction_tpu.pipeline.reconstruct import reconstruct
    from synthetic import point_to_surface_rmse

    cfg = bench_config(npairs)
    W, H = cfg.finest_size
    cams, imgs, masks = build_rig((W, H))
    pairs = make_pairs(cfg, cams, imgs, masks)

    def host_stats():
        """RSS + 1-min load — the r3 official capture's warm run had
        host stages 3-5x slower than ITS OWN cold run (marching
        4.6->14.1 s, cleanup 4.1->22.2 s, `BENCH_r03.json`), and with
        reps=1 that anomaly became the round's number.  These samples
        tell contention (load from outside this process) apart from a
        real regression."""
        rss = 0.0
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        rss = float(line.split()[1]) / 1024.0
        except OSError:
            pass
        try:
            load1 = os.getloadavg()[0]
        except OSError:
            load1 = -1.0
        return rss, load1

    runs = []
    import gc
    from reconstruction_tpu.utils.transfer import xfer_reset, xfer_stats
    for r in range(reps + 1):  # run 0 = cold (compile); rest timed
        xfer_reset()
        t0 = time.perf_counter()
        c0 = time.process_time()
        rec = reconstruct(cfg, pairs)
        total = time.perf_counter() - t0
        cpu = time.process_time() - c0
        rmse = point_to_surface_rmse(rec.vertices)
        mesh = {"verts": int(len(rec.vertices)),
                "faces": int(len(rec.faces)),
                "cloud_points": int(len(rec.cloud_xyz)),
                "surface_rmse": round(float(rmse), 5)}
        rss, load1 = host_stats()
        hstats = {"rss_mb": round(rss), "load1": round(load1, 2),
                  "cpu_over_wall": round(cpu / max(total, 1e-9), 2)}
        # Link accounting (VERDICT r4 weak #3): accumulated packed-fetch
        # downlink + accounted uploads; the fetch stages should be
        # explained by bytes x the session's measured rate.
        xf = xfer_stats()
        spans = dict(rec.timer.spans)
        fetch_span = sum(v for k, v in spans.items()
                         if k.endswith("/fetch")) + spans.get("poisson", 0.0)
        link = {"up_mb": round(xf["up_bytes"] / 1e6, 2),
                "down_mb": round(xf["down_bytes"] / 1e6, 2),
                "down_events": xf["down_events"],
                "implied_down_mbps": round(
                    xf["down_bytes"] / 1e6 / max(fetch_span, 1e-9), 2)}
        runs.append((total, spans, mesh, hstats, link))
        print(f"[bench] {'cold' if r == 0 else f'run {r}'}: "
              f"{total:.1f}s  stages={aggregate_stages(rec.timer.spans)} "
              f"host={hstats} link={link}",
              file=sys.stderr, flush=True)
        del rec  # do not hold result graphs across timed runs
        gc.collect()
    warming = reps == 0
    if warming:  # cache-warming session: report the cold run
        runs.append(runs[0])

    best_i = 1 + int(np.argmin([t for t, *_ in runs[1:]]))
    total, spans, mesh, hstats, link = runs[best_i]
    stages = aggregate_stages(spans)
    # "Matching time" (`reconstruction/main.cpp:18`) = dispatch + the
    # fetch spans (the fetch of pair i overlaps pair i+1's device work,
    # so their SUM bounds the stereo wall from above).
    matching_s = sum(v for k, v in spans.items()
                     if k.endswith("/stereo") or k.endswith("/fetch"))
    out = {"matching_s": round(matching_s, 3),
           "total_s": round(total, 3),
           "cold_total_s": round(runs[0][0], 3),
           "stages_s": stages,
           "mesh": mesh,
           "host": hstats,
           "link": link,
           "all_runs_s": [round(t, 1) for t, *_ in runs],
           "views_per_s": 2.0 * npairs / total}
    if warming:  # mark so a consumer never mistakes cold for a regression
        out["warming"] = True
    return out


def run_stereo_only(reps):
    """Matching-only loop (the r01 protocol) for kernel A/B work."""
    import jax.numpy as jnp
    from reconstruction_tpu.core.pyramid import build_pyramid, quantize_u8
    from reconstruction_tpu.stereo.pipeline import match_one_level

    cfg = bench_config(1)  # honors RECON_BENCH_BASE/LEVELS smoke knobs
    W, H = cfg.finest_size
    rng = np.random.default_rng(0)
    imgL, imgR, mask = synth_pair(H, W, rng)
    pyrL = build_pyramid(jnp.asarray(imgL), cfg.pyramid_levels)
    pyrR = build_pyramid(jnp.asarray(imgR), cfg.pyramid_levels)
    pyrM = [quantize_u8(m) for m in build_pyramid(jnp.asarray(mask),
                                                  cfg.pyramid_levels)]
    refine_scale = float(os.environ.get("RECON_BENCH_REFINE_SCALE", "1"))
    refine_impl = os.environ.get("RECON_REFINE_IMPL", "auto")

    def one_level(state, level):
        return match_one_level(
            quantize_u8(pyrL[level]), quantize_u8(pyrR[level]),
            pyrM[level], pyrM[level], state, level,
            radius=cfg.stereo.block_radius,
            offset=cfg.stereo.disparity_offset,
            ws=cfg.stereo.refine_ws,
            refine_iters=max(1, int(cfg.refine_iterations(level)
                                    * refine_scale)),
            refine_impl=refine_impl)

    def fence(state):
        """Fetch-fence: the relay's block_until_ready can return before
        execution finishes (r3: warm levels 'completed' in 0.00 s), so
        the timing fence is a dependent 1-element fetch — disp0 of the
        last level depends on every level's chain."""
        return float(jnp.ravel(state.disp0)[0].astype(jnp.float32))

    state = None
    cold = []
    for level in range(cfg.pyramid_levels):
        t0 = time.perf_counter()
        state = one_level(state, level)
        fence(state)
        cold.append(time.perf_counter() - t0)
        print(f"[bench] level {level} compile+run: {cold[-1]:.2f}s",
              file=sys.stderr, flush=True)
    # fetch-latency floor to subtract from whole-chain timings
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        fence(state)
        lat.append(time.perf_counter() - t0)
    fetch_s = float(np.median(lat))

    per_pair = sum(cold)  # reps == 0 (warming session): the cold pass
    for r in range(reps):
        state = None
        t0 = time.perf_counter()
        for level in range(cfg.pyramid_levels):
            state = one_level(state, level)
        fence(state)
        per_pair = min(per_pair,
                       max(time.perf_counter() - t0 - fetch_s, 1e-9))
    print(f"[bench] stereo: {per_pair:.2f}s/pair "
          f"(fetch floor {fetch_s:.3f}s)", file=sys.stderr, flush=True)
    out = {"matching_s": round(per_pair, 3), "total_s": round(per_pair, 3),
           "stages_s": {"stereo": round(per_pair, 3)},
           "mesh": {}, "views_per_s": 2.0 / per_pair}
    if reps == 0:
        out["warming"] = True
    return out


OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".bench_out")


def run_phase(phase):
    """Run ONE measurement phase inline (inside its own process when
    spawned by the orchestrator = its own chip-grant window)."""
    import jax
    if "RECON_BENCH_PLATFORM" in os.environ:  # e.g. "cpu" smoke runs; the
        # axon sitecustomize pins the platform, env vars alone don't work
        jax.config.update("jax_platforms", os.environ["RECON_BENCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    # Cache EVERYTHING: on the tunneled chip even a sub-second compile
    # pays a multi-second relay round trip, and the pipeline dispatches
    # dozens of small programs (sor_filter's untraced epilogue measured
    # 430 s cold before fusion+caching; tools/repro_knn_variants.py).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from reconstruction_tpu.utils.profiling import resolve_chip

    npairs = int(os.environ.get("RECON_BENCH_PAIRS", "4"))
    # full-protocol default reps=2: the official value is best-of-2 so a
    # single contended warm run can no longer become the round's number
    # (VERDICT r3 weak #1).
    reps = int(os.environ.get("RECON_BENCH_REPS",
                              "3" if phase == "stereo" else "2"))
    chip, kind = resolve_chip()
    print(f"[bench] device: {kind} (peaks table: {chip}), phase={phase}",
          file=sys.stderr, flush=True)

    # Pre-pay the relay's once-per-session first-large-fetch stall
    # (4-20 min observed, BENCH_NOTES) on a dummy transfer so it cannot
    # land inside a timed region or a mid-pipeline span.
    import jax.numpy as jnp
    t0 = time.perf_counter()
    np.asarray(jnp.zeros((4 << 20,), jnp.float32) + 1.0)
    dt = time.perf_counter() - t0
    if dt > 5.0:
        print(f"[bench] absorbed first-fetch stall: {dt:.0f}s",
              file=sys.stderr, flush=True)

    def write(name, res):
        res["chip"] = kind
        os.makedirs(OUT_DIR, exist_ok=True)
        path = os.path.join(OUT_DIR, f"phase_{name}.json")
        with open(path, "w") as f:
            json.dump(res, f)
        print(f"[bench] phase {name} -> {path}", file=sys.stderr,
              flush=True)
        return res

    if phase == "kernels":
        return write("kernels", {"kernels": measure_kernels(chip)})
    if phase == "stereo":
        return write("stereo", run_stereo_only(reps))
    if phase == "full":
        return write("full", run_full(npairs, reps))
    if phase == "stereo_full":
        # Both protocols in ONE process: the level programs miss the
        # persistent compile cache across processes (pallas payload
        # nondeterminism, BENCH_NOTES), so separate children recompiled
        # level 3 twice (~6 min of cold wall).  The stereo JSON is
        # written BEFORE the full pipeline runs, so a full-phase crash
        # still leaves the matching number on disk.
        reps_stereo = int(os.environ.get("RECON_BENCH_REPS", "3"))
        out = write("stereo", run_stereo_only(reps_stereo))
        out_full = write("full", run_full(npairs, reps))
        return {"stereo": out, "full": out_full}
    raise SystemExit(f"unknown phase {phase!r}")


def orchestrate():
    """Default entry: one subprocess per phase (own grant window), one
    retry each, merge surviving phases into the single JSON line."""
    import subprocess
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from tpu_run import prune_cache
    prune_cache("/root/repo/.jax_cache")

    mode = os.environ.get("RECON_BENCH_MODE", "full")
    phases = (["stereo"] if mode == "stereo"
              else ["kernels", "stereo_full"])
    if os.environ.get("RECON_BENCH_KERNELS", "1") == "0" and "kernels" in phases:
        phases.remove("kernels")
    # one child can produce several phase files (stereo_full writes the
    # stereo record BEFORE running the riskier full pipeline)
    produces = {"kernels": ["kernels"], "stereo": ["stereo"],
                "full": ["full"], "stereo_full": ["stereo", "full"]}

    os.makedirs(OUT_DIR, exist_ok=True)
    results, attempts = {}, {}
    for phase in phases:
        outs = produces[phase]
        for name in outs:
            path = os.path.join(OUT_DIR, f"phase_{name}.json")
            if os.path.exists(path):
                os.remove(path)
        for attempt in (1, 2):
            env = dict(os.environ, RECON_BENCH_PHASE=phase)
            t0 = time.perf_counter()
            rc = subprocess.call([sys.executable, os.path.abspath(__file__)],
                                 env=env)
            dt = time.perf_counter() - t0
            for name in outs:
                attempts[name] = attempt
            done = True
            for name in outs:
                path = os.path.join(OUT_DIR, f"phase_{name}.json")
                if os.path.exists(path):
                    with open(path) as f:
                        results[name] = json.load(f)
                    results[name]["wall_s"] = round(dt, 1)
                else:
                    done = False
            if done:
                break
            print(f"[bench] phase {phase} attempt {attempt} incomplete "
                  f"rc={rc} after {dt:.0f}s", file=sys.stderr, flush=True)
    return results, attempts


def merge_and_print(results, attempts):
    full = results.get("full", {})
    stereo = results.get("stereo", {})
    kernels = results.get("kernels", {}).get("kernels", {})
    base = full or stereo
    vps = base.get("views_per_s", 0.0)
    out = {
        "metric": "views_fused_per_sec_per_chip",
        "value": round(vps, 4),
        "unit": "views/s",
        "vs_baseline": round(vps / REFERENCE_VIEWS_PER_SEC, 2),
        "chip": base.get("chip") or results.get("kernels", {}).get("chip"),
    }
    for k in ("matching_s", "total_s", "cold_total_s", "stages_s", "mesh",
              "host", "link", "warming", "wall_s"):
        if k in base:
            out[k] = base[k]
    if stereo and full:
        out["stereo_only"] = {k: stereo[k] for k in
                              ("matching_s", "views_per_s") if k in stereo}
    if not full and "full" in attempts:
        out["full_error"] = (f"full phase failed "
                             f"({attempts['full']} attempts); value is the "
                             f"stereo-only (matching) protocol")
    out["kernels"] = kernels
    out["phase_attempts"] = attempts
    print(json.dumps(out))


def main():
    phase = os.environ.get("RECON_BENCH_PHASE")
    if phase:
        run_phase(phase)
        return
    if os.environ.get("RECON_BENCH_SUBPROC", "1") == "0":
        mode = os.environ.get("RECON_BENCH_MODE", "full")
        phases = (["stereo"] if mode == "stereo"
                  else ["kernels", "stereo", "full"])
        if os.environ.get("RECON_BENCH_KERNELS", "1") == "0":
            phases = [p for p in phases if p != "kernels"]
        results = {p: run_phase(p) for p in phases}
        merge_and_print(results, {p: 1 for p in phases})
        return
    results, attempts = orchestrate()
    merge_and_print(results, attempts)


if __name__ == "__main__":
    main()
