"""Configuration dataclasses for the stereo-matching engine.

The reference has no config system: its hyperparameters are module-level
constants in the example scripts (reference: examples/verify.py:10-13 —
``kernel_size=15, H, W, D = 330, 422, 200, softargmax_beta=50.0,
cost_volume_threshold=0.6``).  Here they become explicit, validated
configuration objects shared by the ops, models, benchmark harness and
the sharded pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class StereoConfig:
    """Static configuration of the ZNCC stereo-matching op and pipeline.

    Attributes:
      kernel_size: side of the square correlation window (k). Must be odd
        (the reference implicitly assumes odd k via ``kernel_size / 2``
        integer halving, reference: custma/src/stereo_matching_kernel.cu:44).
      num_disparities: ``D``. ``None`` selects the all-pairs ``[H, W, W]``
        cost volume (the reference's actual behavior — it accepts D but
        ignores it, reference: custma/src/stereo_matching_kernel.cu:14,194).
        An integer selects the banded ``[H, W, D+1]`` volume the reference
        intended (its commented-out layout, kernel.cu:30-33,197), where
        band index d matches projector column ``w - d``.
      softargmax_beta: temperature for the differentiable soft-argmax head
        (reference: examples/verify.py:12,31-39).
      cost_threshold: confidence threshold on the per-pixel max correlation
        used to mask the disparity map (reference: examples/verify.py:13,74).
      epsilon: numerical epsilon; placement matters for bit-parity — added
        to the numerator and inside the sqrt of the denominator
        (reference: custma/src/stereo_matching_kernel.cu:4,71).
      grad_projector: if True the model layer routes through
        :func:`..ops.zncc.stereo_matching_with_proj_grad` so BOTH images
        receive gradients (XLA autodiff of the moments form; the Pallas
        backward is camera-only by design). The reference never implemented
        a projector gradient (its backward returns None, reference:
        custma/stereo_matching_wrapper.py:33); camera-only is therefore
        the parity default.
      precision: "highest" forces fp32 MXU accumulation for parity with the
        reference's fp32 CUDA accumulators; "default" permits bf16 passes.
      backend: which forward implementation the model layer uses.
        "pallas" — the hand-written TPU kernels (banded mode AND, since
        round 3, the all-pairs mode via the MXU im2col kernel, which
        itself falls back to XLA at widths whose [hr, W, W] output
        block cannot fit VMEM);
        "xla" — the fused XLA moments formulation;
        "pallas_interpret" — the kernels under the Pallas interpreter
        (CPU testing / sanitizer mode, survey §5.2);
        "auto" — pallas on TPU, xla otherwise.
    """

    kernel_size: int = 15
    num_disparities: Optional[int] = None
    softargmax_beta: float = 50.0
    cost_threshold: float = 0.6
    epsilon: float = 1e-8
    grad_projector: bool = False
    precision: str = "highest"
    backend: str = "auto"
    # Fused-pipeline kernel tile (block_rows, block_disparities).  None =
    # the KITTI-tuned default; use ops.tuning.autotune_pipeline_blocks to
    # pick per-shape tiles on the live device.
    pipeline_blocks: Optional[Tuple[int, int]] = None
    # Trainable-backward row tile.  None = the KITTI-tuned default; use
    # ops.tuning.autotune_trainable_bwd_blocks for per-shape values.
    trainable_bwd_block_rows: Optional[int] = None

    def __post_init__(self):
        if self.kernel_size < 1 or self.kernel_size % 2 != 1:
            raise ValueError(
                f"kernel_size must be odd and >= 1, got {self.kernel_size}")
        if self.num_disparities is not None and self.num_disparities < 0:
            raise ValueError(
                f"num_disparities must be None or >= 0, got {self.num_disparities}")
        if self.precision not in ("highest", "default"):
            raise ValueError(f"unknown precision {self.precision!r}")
        if self.backend not in ("auto", "xla", "pallas", "pallas_interpret"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.pipeline_blocks is not None:
            pb = tuple(self.pipeline_blocks)
            if (len(pb) != 2 or not all(isinstance(v, int) and v > 0
                                        for v in pb)):
                raise ValueError(
                    f"pipeline_blocks must be two positive ints, got "
                    f"{self.pipeline_blocks!r}")
            object.__setattr__(self, "pipeline_blocks", pb)
        bb = self.trainable_bwd_block_rows
        if bb is not None and (not isinstance(bb, int) or bb <= 0):
            raise ValueError(
                f"trainable_bwd_block_rows must be None or a positive "
                f"int, got {bb!r}")

    def resolved_backend(self) -> str:
        """Resolve "auto" to a concrete backend for the current platform."""
        if self.backend != "auto":
            return self.backend
        import jax  # local: config must stay importable without device init

        try:
            platform = jax.devices()[0].platform
        except Exception:
            return "xla"
        return "pallas" if platform == "tpu" else "xla"

    @property
    def pad(self) -> int:
        """Half-window (halo) size: rows/cols of context a window needs."""
        return self.kernel_size // 2

    def volume_shape(self, H: int, W: int) -> Tuple[int, int, int]:
        """Shape of the cost volume this config produces for an HxW pair."""
        if self.num_disparities is None:
            return (H, W, W)
        return (H, W, self.num_disparities + 1)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for the sharded pipeline.

    The reference is single-GPU with no distributed layer (survey §2.4);
    this is new, TPU-first design: frames shard over ``data``; image rows
    shard over ``space`` with a halo exchange of ``kernel_size//2`` rows.
    """

    data: int = 1
    space: int = 1
    axis_names: Tuple[str, str] = ("data", "space")

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.data, self.space)

    @property
    def num_devices(self) -> int:
        return self.data * self.space
