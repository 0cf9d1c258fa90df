"""Data layer: synthetic structured-light scenes and stereo-pair IO.

The reference ships no data and no generator (its example inputs are
absent from its repo; survey §2.3 E5); this subsystem makes every
workload in the package reproducible from a clean checkout.
"""

from custereomatching_tpu.data.io import (
    load_image_gray,
    load_stereo_pair_npy,
    save_disparity_png,
    save_stereo_pair_npz,
)
from custereomatching_tpu.data import kitti
from custereomatching_tpu.data.synthetic import (
    box_scene_disparity,
    make_stereo_pair,
    make_video_batch,
    render_camera,
    slanted_plane_disparity,
    speckle_pattern,
)

__all__ = [k for k in globals() if not k.startswith("_")]
