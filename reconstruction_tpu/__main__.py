"""CLI entry point.

Usage mirrors the reference (`reconstruction/main.cpp:10-13`):

    python -m reconstruction_tpu config.yml
    python -m reconstruction_tpu batch path.txt        # BatchProcess
    python -m reconstruction_tpu kinect filelist.yml   # Kinect2Cloud
    python -m reconstruction_tpu masks <indir> <outdir>  # segmentation
"""

from __future__ import annotations

import sys
import time


def main(argv):
    if len(argv) < 2:
        print("USAGE: python -m reconstruction_tpu your_config_file.yml\n"
              "       python -m reconstruction_tpu batch path.txt\n"
              "       python -m reconstruction_tpu kinect filelist.yml\n"
              "       python -m reconstruction_tpu masks <indir> <outdir>")
        return -1
    start = time.time()
    if argv[1] == "batch":
        from reconstruction_tpu.pipeline.batch import run_batch
        run_batch(argv[2] if len(argv) > 2 else "path.txt")
    elif argv[1] == "kinect":
        from reconstruction_tpu.pipeline.kinect import kinect_to_cloud
        kinect_to_cloud(argv[2])
    elif argv[1] == "masks":
        from reconstruction_tpu.pipeline.segmentation import cut_image_dir
        cut_image_dir(argv[2], argv[3] if len(argv) > 3 else None)
    else:
        from reconstruction_tpu.pipeline.reconstruct import (
            load_run_config, reconstruct)
        try:
            cfg, pairs = load_run_config(argv[1])
        except FileNotFoundError as e:
            # clean failure like the reference (`CReconstruction.cpp:8-14`)
            print(f"Can't open file: {e.filename}")
            return -1
        mesh = None
        if "--sharded" in argv[2:]:
            # Pair-sharded SPMD stereo over all visible devices
            # (replaces the reference's sequential pair loop,
            # `CStereoMatching.cpp:17`).
            import jax
            from reconstruction_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(jax.devices(), frame=1, tile=1)
        res = reconstruct(cfg, pairs, output_path=cfg.outfilename,
                          mesh=mesh)
        print(res.timer.report())
    print(f"total time: {time.time() - start:.3f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
