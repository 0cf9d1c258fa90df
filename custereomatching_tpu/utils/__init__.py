"""Utilities: timing/benchmark harness and stereo evaluation metrics."""

from custereomatching_tpu.utils.metrics import (
    bad_pixel_rate,
    disparity_metrics,
    end_point_error,
)
from custereomatching_tpu.utils.profiling import (
    device_specs,
    trace,
    zncc_roofline,
)
from custereomatching_tpu.utils.timer import Timer, TimerError, benchmark

__all__ = [
    "Timer",
    "TimerError",
    "bad_pixel_rate",
    "benchmark",
    "device_specs",
    "disparity_metrics",
    "end_point_error",
    "trace",
    "zncc_roofline",
]
