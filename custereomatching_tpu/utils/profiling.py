"""Profiling: device trace capture and roofline accounting.

The reference's entire observability story is unsynchronized wall-clock
prints (survey §5.1, custma/utils.py).  Here: (a) a context manager
around ``jax.profiler`` for real device traces viewable in Perfetto /
TensorBoard, and (b) roofline accounting for the ZNCC pipeline so every
benchmark can report its distance from the hardware bound — the basis of
the speed-of-light claims in BASELINE.md.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Iterator, Optional

import jax

# Peak specs by device kind: (HBM bytes/s, f32 VPU ops/s).
# VPU figure = 8x128 lanes x 4 ALUs x clock; used for the compute leg of
# the roofline (the ZNCC pipeline is VPU-bound, not MXU-bound).
DEVICE_SPECS: Dict[str, Dict[str, float]] = {
    "TPU v4": {"hbm_bw": 1.2e12, "vpu_f32": 4 * 1024 * 0.94e9},
    "TPU v5 lite": {"hbm_bw": 8.19e11, "vpu_f32": 4 * 1024 * 0.94e9},
    "TPU v5": {"hbm_bw": 2.765e12, "vpu_f32": 4 * 1024 * 1.75e9},
    "TPU v6 lite": {"hbm_bw": 1.64e12, "vpu_f32": 4 * 1024 * 0.94e9},
}


def device_specs(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Peak specs for ``device`` (default: first device), with fallback."""
    kind = (device or jax.devices()[0]).device_kind
    for name, spec in DEVICE_SPECS.items():
        if kind.startswith(name):
            return dict(spec)
    return dict(DEVICE_SPECS["TPU v5 lite"])


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: ``with trace('/tmp/trace'): run()``.

    View with TensorBoard (profile plugin) or Perfetto.  This is the
    subsystem the reference lacked entirely — its timers measured launch
    enqueue (survey §5.1).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def zncc_roofline(H: int, W: int, D: int, k: int, *,
                  materialize_volume: bool,
                  device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Roofline model of one ZNCC frame on the current device.

    Memory leg: mandatory HBM traffic — read both images, plus write (and
    later re-read) the banded volume when it is materialized; the fused
    pipeline writes only four maps.  Compute leg: the separable-moments
    formulation costs ~2·2k adds per output element for the windowed
    cross term plus ~10 elementwise ops (and ~2 transcendentals in the
    fused head, charged at 4 ops each).

    Returns bounds in seconds and frames/s plus the binding resource.
    """
    spec = device_specs(device)
    elems = H * W * (D + 1)
    image_bytes = 2 * H * W * 4
    if materialize_volume:
        bytes_moved = image_bytes + elems * 4
        ops = elems * (4 * k + 10)
    else:
        bytes_moved = image_bytes + 4 * H * W * 4
        ops = elems * (4 * k + 10 + 2 * 4)
    t_mem = bytes_moved / spec["hbm_bw"]
    t_compute = ops / spec["vpu_f32"]
    t_bound = max(t_mem, t_compute)
    return {
        "t_memory_s": t_mem,
        "t_compute_s": t_compute,
        "bound_s": t_bound,
        "bound_fps": 1.0 / t_bound,
        "bound_by": "memory" if t_mem >= t_compute else "compute",
        "bytes_moved": float(bytes_moved),
        "vector_ops": float(ops),
    }
