from reconstruction_tpu.pipeline.reconstruct import (  # noqa: F401
    Reconstruction, reconstruct, load_run_config)
