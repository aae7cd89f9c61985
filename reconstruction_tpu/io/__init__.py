from reconstruction_tpu.io.ply import read_ply, write_ply, PlyData  # noqa: F401
from reconstruction_tpu.io.opencv_yaml import load_opencv_yaml  # noqa: F401
