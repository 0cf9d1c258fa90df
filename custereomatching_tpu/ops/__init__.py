"""Compute ops: ZNCC cost volume (oracle, XLA fast path, Pallas kernels)
and the disparity-extraction head."""

from custereomatching_tpu.ops import golden
from custereomatching_tpu.ops.disparity import (
    DisparityResult,
    disparity_to_depth,
    extract_disparity,
    soft_argmax,
)
from custereomatching_tpu.ops.pallas_pipeline import (
    PipelineMaps,
    pallas_stereo_pipeline,
)
from custereomatching_tpu.ops.pallas_zncc import (
    pallas_cost_volume_banded,
    pallas_cost_volume_banded_hdw,
    stereo_matching_pallas,
)
from custereomatching_tpu.ops.zncc import (
    EPSILON,
    box2d,
    stereo_matching,
    stereo_matching_with_proj_grad,
)

__all__ = [
    "golden",
    "DisparityResult",
    "disparity_to_depth",
    "extract_disparity",
    "soft_argmax",
    "EPSILON",
    "box2d",
    "PipelineMaps",
    "pallas_cost_volume_banded",
    "pallas_cost_volume_banded_hdw",
    "pallas_stereo_pipeline",
    "stereo_matching",
    "stereo_matching_pallas",
    "stereo_matching_with_proj_grad",
]
