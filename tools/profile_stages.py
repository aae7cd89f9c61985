import sys; sys.path.insert(0, "/root/repo")
import time, sys
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
from reconstruction_tpu.config import preset
from reconstruction_tpu.core.pyramid import build_pyramid, quantize_u8
from reconstruction_tpu.core.morphology import valid_mask
from reconstruction_tpu.stereo.margins import find_margin
from reconstruction_tpu.stereo.matching import guided_match, rematch, brute_force_match
from reconstruction_tpu.stereo.constraints import (smoothness_constraint,
    ordering_constraint, uniqueness_constraint, median_filter, propagate_bounds)
from reconstruction_tpu.stereo.refine import disparity_refine
from bench import synth_pair
from reconstruction_tpu.stereo.pipeline import match_one_level

cfg = preset("myself")
W, H = cfg.finest_size
rng = np.random.default_rng(0)
imgL, imgR, mask = synth_pair(H, W, rng)
pyrL = build_pyramid(jnp.asarray(imgL), 4)
pyrR = build_pyramid(jnp.asarray(imgR), 4)
pyrM = [quantize_u8(m) for m in build_pyramid(jnp.asarray(mask), 4)]

# run levels 0..2 to get coarse state
state = None
for level in range(3):
    state = match_one_level(quantize_u8(pyrL[level]), quantize_u8(pyrR[level]),
        pyrM[level], pyrM[level], state, level, refine_iters=cfg.refine_iterations(level))
state.disp0.block_until_ready()
print("levels 0-2 done", file=sys.stderr)

lvl = 3
i0, i1 = quantize_u8(pyrL[lvl]), quantize_u8(pyrR[lvl])
m0v, m1v = valid_mask(pyrM[lvl]), valid_mask(pyrM[lvl])
mg0 = find_margin(m0v, 2); mg1 = find_margin(m1v, 2)

def t(name, fn):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(); jax.block_until_ready(out)
    print(f"{name::<28} {time.perf_counter()-t0:.3f}s")
    return out

d0 = t("guided_match_d0", lambda: guided_match(i0, i1, m0v, m1v, state.disp0, mg0, mg1, 2, 2))
d1 = t("guided_match_d1", lambda: guided_match(i1, i0, m1v, m0v, state.disp1, mg1, mg0, 2, 2))
d0 = t("smoothness", lambda: smoothness_constraint(d0, mg0))
d1 = smoothness_constraint(d1, mg1)
d0 = t("ordering", lambda: ordering_constraint(d0, mg0))
d1 = ordering_constraint(d1, mg1)
d0d1 = t("uniqueness", lambda: uniqueness_constraint(d0, d1, mg0, mg1))
d0, d1 = d0d1
blbr = t("propagate_bounds", lambda: propagate_bounds(d0, m0v, mg0, mg1))
bl, br = blbr
d0r = t("rematch", lambda: rematch(i0, i1, m0v, m1v, d0, bl, br, mg0, 2))
d0m = t("median", lambda: median_filter(d0r, m0v, mg0, 1))
d0f = t("refine_120", lambda: disparity_refine(d0m, i0, i1, mg0, 120, 0.03))
print("done")
