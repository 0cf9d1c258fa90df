"""Model layer: the end-to-end stereo matcher and its optimization loop."""

from custereomatching_tpu.models.optimize import (
    StepMetrics,
    TrainState,
    disparity_loss,
    init_state,
    make_train_step,
    optimize_camera,
)
from custereomatching_tpu.models.engine import StereoEngine
from custereomatching_tpu.models.pyramid import PyramidStereoMatcher
from custereomatching_tpu.models.stereo import StereoMatcher, StereoOutput

__all__ = [k for k in globals() if not k.startswith("_")]
