import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import os
import numpy as np
from tests.synthetic import make_stereo_scene
from reconstruction_tpu.io.opencv_yaml import save_opencv_yaml

root = "/root/repo/.scratch/scene"
os.makedirs(root, exist_ok=True)
cams, imgs, masks = make_stereo_scene(image_size=(320, 240))

calib = {}
for i, c in enumerate(cams):
    calib[f"intrinsic-{i}"] = np.asarray(c.K, np.float64)
    Rt = np.hstack([np.asarray(c.R, np.float64), np.asarray(c.t, np.float64).reshape(3, 1)])
    calib[f"extrinsic-{i}"] = Rt
save_opencv_yaml(os.path.join(root, "calib_camera.yml"), calib)

import cv2  # noqa: only for writing PNGs if available
HAVE_CV2 = True
try:
    cv2.imwrite
except Exception:
    HAVE_CV2 = False

from reconstruction_tpu.io.images import imwrite as write_image
imagelist, masklist = [], []
for i, (im, mk) in enumerate(zip(imgs, masks)):
    ip, mp = f"img{i}.png", f"mask{i}.png"
    write_image(os.path.join(root, ip), im)
    write_image(os.path.join(root, mp), mk)
    imagelist.append(ip); masklist.append(mp)

cfg = {
    "filepath": root + "/",
    "outfilename": os.path.join(root, "out.ply"),
    "isoutput": 0,
    "camera_calib_name": "calib_camera.yml",
    "PyrmNum": 3,
    "LowestLevelWidth": 80,
    "LowestLevelHeight": 60,
    "imagelist": imagelist,
    "masklist": masklist,
    "camID": np.array([[0, 1]], np.int32),
}
save_opencv_yaml(os.path.join(root, "config.yml"), cfg)
print("scene written")
