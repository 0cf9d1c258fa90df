"""Utilities: timing/benchmark harness, failure handling, metrics."""

from custereomatching_tpu.utils.failsafe import (
    device_healthcheck,
    is_transient_device_error,
    with_retries,
)
from custereomatching_tpu.utils.metrics import (
    bad_pixel_rate,
    disparity_metrics,
    end_point_error,
)
from custereomatching_tpu.utils.kernel_model import (
    allpairs_backward_cost,
    allpairs_forward_cost,
    fused_backward_c_cost,
    fused_backward_cost,
    fused_forward_cost,
    kernel_bound,
    measure_vpu_rates,
    projector_backward_cost,
    stage_op_cost,
    transpose_volume_cost,
    volume_backward_cost,
    volume_forward_cost,
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
    "device_healthcheck",
    "device_specs",
    "disparity_metrics",
    "end_point_error",
    "allpairs_backward_cost",
    "allpairs_forward_cost",
    "fused_backward_c_cost",
    "fused_backward_cost",
    "fused_forward_cost",
    "is_transient_device_error",
    "kernel_bound",
    "measure_vpu_rates",
    "projector_backward_cost",
    "stage_op_cost",
    "transpose_volume_cost",
    "trace",
    "volume_backward_cost",
    "volume_forward_cost",
    "with_retries",
    "zncc_roofline",
]
