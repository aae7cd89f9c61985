from reconstruction_tpu.stereo.ncc import window_descriptors, row_score_matrix  # noqa: F401
from reconstruction_tpu.stereo.margins import Margins, find_margin  # noqa: F401
from reconstruction_tpu.stereo.matching import (  # noqa: F401
    brute_force_match, guided_match, rematch)
from reconstruction_tpu.stereo.constraints import (  # noqa: F401
    smoothness_constraint, ordering_constraint, uniqueness_constraint,
    median_filter, propagate_bounds)
from reconstruction_tpu.stereo.refine import disparity_refine  # noqa: F401
from reconstruction_tpu.stereo.triangulate import disparity_to_cloud  # noqa: F401
