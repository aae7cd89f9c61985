from reconstruction_tpu.cloud.neighbors import VoxelGrid, build_grid, gather_neighbors  # noqa: F401
from reconstruction_tpu.cloud.filters import sor_filter  # noqa: F401
from reconstruction_tpu.cloud.normals import estimate_normals, smallest_eigenvector_3x3  # noqa: F401
from reconstruction_tpu.cloud.mls import mls_smooth  # noqa: F401
