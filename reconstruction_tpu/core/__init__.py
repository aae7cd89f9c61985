from reconstruction_tpu.core.camera import Camera, CameraPair, load_calibration  # noqa: F401
from reconstruction_tpu.core.rectify import stereo_rectify, RectifyResult  # noqa: F401
from reconstruction_tpu.core.remap import remap_bilinear, rectify_map  # noqa: F401
from reconstruction_tpu.core.pyramid import pyr_down, build_pyramid  # noqa: F401
from reconstruction_tpu.core.morphology import ellipse_kernel, erode_mask  # noqa: F401
