"""Utilities: timing/benchmark harness, synthetic data generation."""

from custereomatching_tpu.utils.timer import Timer, TimerError, benchmark

__all__ = ["Timer", "TimerError", "benchmark"]
