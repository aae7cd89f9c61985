from reconstruction_tpu.surface.poisson import poisson_reconstruct, PoissonResult  # noqa: F401
from reconstruction_tpu.surface.marching import marching_tetrahedra  # noqa: F401
from reconstruction_tpu.surface.mesh import (  # noqa: F401
    clean_mesh, laplacian_smooth, remove_small_components)
from reconstruction_tpu.surface.texture import texture_vertices  # noqa: F401
