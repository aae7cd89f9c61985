"""Micro-bench: per-pixel 32-slot window extraction from a (H, W, S) cost
volume — take_along_axis layouts vs a gather-free binary-shift scheme.

The refine hot path needs cvm[k, y, x] = cv[y, x, j0(y,x) + k] for
k < 32.  TPU minor-axis gathers serialize; this tool measures the
alternatives at the finest-level shape to pick the default.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    H, W, S, MINI = 1920, 1280, 128, 32
    rng = np.random.default_rng(0)
    cv = jnp.asarray(rng.uniform(0, 1, (H, W, S)).astype(np.float32))
    # anchors roughly mid-volume with NOMATCH-style outliers
    j0 = rng.integers(-8, S - MINI + 8, (H, W)).astype(np.int32)
    j0[rng.uniform(size=(H, W)) < 0.05] = -(1 << 14)
    j0 = jnp.asarray(j0)

    def t(name, fn, reps=3):
        out = jax.block_until_ready(fn())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        print(f"{name:<26} min {min(ts)*1e3:8.1f} ms  "
              f"(sum {float(out.sum()):.6e})", flush=True)
        return out

    ks = jnp.arange(MINI, dtype=jnp.int32)

    @jax.jit
    def gather_minor(cv, j0):
        idx = j0[:, :, None] + ks[None, None, :]
        ok = (idx >= 0) & (idx < S)
        out = jnp.take_along_axis(cv, jnp.clip(idx, 0, S - 1), axis=2)
        return jnp.moveaxis(jnp.where(ok, out, 0.5), -1, 0)

    @jax.jit
    def gather_sublane(cv_t, j0):
        # cv_t: (H, S, W); gather along axis 1 (sublane)
        idx = j0[:, None, :] + ks[None, :, None]
        ok = (idx >= 0) & (idx < S)
        out = jnp.take_along_axis(cv_t, jnp.clip(idx, 0, S - 1), axis=1)
        return jnp.where(ok, out, 0.5).transpose(1, 0, 2)

    @jax.jit
    def binshift_minor(cv, j0):
        # pad MINI slots both sides -> any in-range slot reads truly,
        # fully-out-of-range windows are fixed by the ok mask afterwards
        cvp = jnp.pad(cv, ((0, 0), (0, 0), (MINI, MINI)),
                      constant_values=0.5)
        start = jnp.clip(j0 + MINI, 0, S + MINI)   # into padded axis
        ext = S + 2 * MINI
        rem = start
        cur = cvp
        maxshift = S + MINI
        nbits = int(maxshift).bit_length()
        for i in reversed(range(nbits)):
            step = 1 << i
            new_ext = MINI + min(step - 1, maxshift) if i else MINI
            new_ext = min(new_ext, ext)
            take = (rem & step) != 0
            hi = cur[..., step:step + new_ext] if step + new_ext <= ext \
                else jnp.pad(cur[..., step:],
                             ((0, 0), (0, 0),
                              (0, step + new_ext - ext)),
                             constant_values=0.5)
            cur = jnp.where(take[..., None], hi, cur[..., :new_ext])
            rem = rem - jnp.where(take, step, 0)
            ext = new_ext
        idx = j0[:, :, None] + ks[None, None, :]
        ok = (idx >= 0) & (idx < S)
        return jnp.moveaxis(jnp.where(ok, cur, 0.5), -1, 0)

    a = t("take_along_minor", lambda: gather_minor(cv, j0))
    cv_t = jnp.asarray(np.ascontiguousarray(
        np.asarray(cv).transpose(0, 2, 1)))
    b = t("take_along_sublane", lambda: gather_sublane(cv_t, j0))
    c = t("binshift_minor", lambda: binshift_minor(cv, j0))

    for name, o in (("sublane", b), ("binshift", c)):
        same = bool(jnp.all(o == a))
        print(f"[check] {name} == minor: {same}", flush=True)


if __name__ == "__main__":
    main()
