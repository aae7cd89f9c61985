"""On-chip bisect of the Pallas sweep mismatch (14% agreement compiled
vs exact interpreted).  Runs the full wrapper at a small shape, then a
reduced kernel exposing the `cross` intermediate at a fixed shift to
localize which stage miscompiles.

Usage: python tools/tpu_run.py tools/probe_sweep_small.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from reconstruction_tpu.stereo.matching import (ncc_sweep_match,
                                                    ncc_moments, _box_sum)
    from reconstruction_tpu.ops.ncc_sweep_pallas import (
        ncc_sweep_match_pallas, _shift_zero)

    print("backend:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    H, W = 40, 64
    imgL = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    imgR = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    validR = rng.uniform(size=(H, W)) > 0.1
    active = rng.uniform(size=(H, W)) > 0.2
    x = np.arange(W)[None, :]
    lo = np.clip(x - 5 + rng.integers(-3, 3, (H, W)), 0, W - 1).astype(np.int32)
    hi = np.clip(lo + rng.integers(0, 12, (H, W)), 0, W - 1).astype(np.int32)

    ref = ncc_sweep_match(jnp.asarray(imgL), jnp.asarray(imgR),
                          jnp.asarray(validR), jnp.asarray(active),
                          jnp.asarray(lo), jnp.asarray(hi), 2)
    out = ncc_sweep_match_pallas(jnp.asarray(imgL), jnp.asarray(imgR),
                                 jnp.asarray(validR), jnp.asarray(active),
                                 jnp.asarray(lo), jnp.asarray(hi), 2,
                                 pad_shift=64, block=16)
    rd, od = np.asarray(ref.disparity), np.asarray(out.disparity)
    eq = (rd == od).mean()
    print(f"small full wrapper: disp equal {eq:.4f}", flush=True)
    if eq < 1.0:
        bad = np.nonzero(rd != od)
        print("  bad rows histogram:",
              np.bincount(bad[0], minlength=H).tolist(), flush=True)

    # reduced kernel: cross at fixed s for one block
    r, B = 2, 16
    imgLc = imgL - 128.0
    imgRc = imgR - 128.0
    s_fix = 3
    Rs = np.zeros_like(imgRc)
    Rs[:, :W - s_fix] = imgRc[:, s_fix:]
    prod_ref = np.asarray(_box_sum(jnp.asarray((imgLc * Rs).sum(-1)), 2))

    P = W + 2 * 64

    def kern(s_ref, L_ref, Rw_ref, o_ref):
        off = s_ref[0]
        L = L_ref[0]
        Rw = Rw_ref[0]

        def shifted_cols(a, off):
            rolled = pltpu.roll(a, (P - off) % P, axis=a.ndim - 1)
            return rolled[..., :W]

        prod = shifted_cols(Rw[0], off) * L[0]
        for c in range(1, 3):
            prod = prod + shifted_cols(Rw[c], off) * L[c]
        bx = prod
        for d in range(1, r + 1):
            bx = bx + _shift_zero(prod, d) + _shift_zero(prod, -d)
        cross = bx[r:r + B]
        for d in range(1, r + 1):
            cross = cross + bx[r - d:r - d + B] + bx[r + d:r + d + B]
        o_ref[0] = cross

    nb = -(-H // B)
    Hp = nb * B
    Lh = np.moveaxis(np.pad(imgLc, ((r, Hp - H + r), (0, 0), (0, 0))), -1, 0)
    Rh = np.moveaxis(np.pad(imgRc, ((r, Hp - H + r), (64, 64), (0, 0))), -1, 0)
    starts = (np.arange(nb) * B)[:, None] + np.arange(B + 2 * r)[None, :]
    Lb = Lh[:, starts].transpose(1, 0, 2, 3)
    Rb = Rh[:, starts].transpose(1, 0, 2, 3)

    got = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 3, B + 2 * r, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 3, B + 2 * r, P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, B, W), jnp.float32),
    )(jnp.asarray([64 + s_fix], jnp.int32), jnp.asarray(Lb),
      jnp.asarray(Rb))
    got = np.asarray(got).reshape(Hp, W)[:H]
    close = np.isclose(got, prod_ref, atol=1e-2)
    print(f"cross@s={s_fix}: close {close.mean():.4f}", flush=True)
    if close.mean() < 1.0:
        bad = np.nonzero(~close)
        print("  bad rows:", sorted(set(bad[0].tolist()))[:20], flush=True)
        print("  bad cols:", sorted(set(bad[1].tolist()))[:20], flush=True)
        i, j = bad[0][0], bad[1][0]
        print(f"  sample got {got[i, j]:.3f} want {prod_ref[i, j]:.3f}",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
