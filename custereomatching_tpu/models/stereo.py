"""Flagship model: the end-to-end structured-light stereo matcher.

In the reference the "model" only exists as example-script glue — cost
volume from the CUDA op plus a commented-out disparity pipeline
(reference: examples/verify.py:65-74, examples/test.py:71-86).  Here it
is a first-class, batched, jit/shard-friendly model object: image pair →
ZNCC cost volume → confidence mask → hard + soft disparity → optional
metric depth.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from custereomatching_tpu.config import StereoConfig
from custereomatching_tpu.ops.disparity import DisparityResult, extract_disparity
from custereomatching_tpu.ops.pallas_pipeline import (
    PipelineMaps,
    pallas_stereo_pipeline,
    stereo_pipeline_trainable,
)
from custereomatching_tpu.ops.pallas_zncc import stereo_matching_pallas
from custereomatching_tpu.ops.zncc import (
    _stereo_matching,
    stereo_matching_with_proj_grad,
)
from custereomatching_tpu.parallel.sharded import sharded_cost_volume


def _stack_gap(kernel_size: int) -> int:
    """Zero rows needed between stacked frames.

    One half-window (p rows, shared by both neighbors) covers the ZNCC
    window reach — plus the cancel taps of the subtractive windowed sum
    (ops/pallas_zncc.py::_win_sum reads ``m−k`` rows beyond the window
    when ``box_k = box_{2^⌈log₂k⌉} − extra taps`` is cheaper; those taps
    cancel exactly only over zeros, and bit-exactness demands they see
    the same zeros a single-frame run pads with)."""
    p = kernel_size // 2
    m = 1 << kernel_size.bit_length()
    deficit = m - kernel_size
    extra = (deficit
             if 0 < deficit < bin(kernel_size).count("1") - 1 else 0)
    return p + extra


def _run_stacked(one_fn, camera: jax.Array, projector: jax.Array,
                 kernel_size: int):
    """Run a single-pair map pipeline over a batch in ONE kernel launch.

    Frames are stacked along H with a ``_stack_gap(k)`` zero-row gap
    between them.  Under the zero-padding window convention (reference
    ``query_ij``, custma/src/stereo_matching_kernel.cu:6-12) one
    half-window of shared zeros satisfies BOTH neighbors: frame i's
    bottom windows and frame i+1's top windows each reach p rows into
    the same gap and read zeros, exactly as if each frame ran alone; the
    gap rows' outputs are sliced away.  Versus ``lax.map`` this trades
    ~p/(H+p) extra rows of compute (~2% at KITTI scale) for B−1 fewer
    kernel dispatches and no XLA loop glue.

    Gradients are exact too: un-stacking is a pad/reshape whose transpose
    scatters zeros into the gap rows, satisfying the zero-cotangent
    contract of the fused backward.
    """
    B, H, W = camera.shape
    gap = _stack_gap(kernel_size)
    hs = H + gap

    def stack(x):
        return jnp.pad(x, ((0, 0), (0, gap), (0, 0))).reshape(B * hs, W)

    maps = one_fn(stack(camera), stack(projector))
    return jax.tree_util.tree_map(
        lambda m: m.reshape(B, hs, W)[:, :H], maps)


class StereoOutput(NamedTuple):
    """Batched model outputs.

    Attributes:
      cost_volume: ``[B, H, W, L]`` ZNCC correlation volume.
      disparity: ``[B, H, W]`` hard disparity, confidence-masked.
      soft_disparity: ``[B, H, W]`` differentiable sub-pixel disparity.
      mask: ``[B, H, W]`` confidence mask.
      confidence: ``[B, H, W]`` per-pixel max correlation.
    """

    cost_volume: jax.Array
    disparity: jax.Array
    soft_disparity: jax.Array
    mask: jax.Array
    confidence: jax.Array


@dataclasses.dataclass(frozen=True)
class StereoMatcher:
    """Batched differentiable stereo matcher.

    A frozen-config callable (hashable, so it can be a static argument to
    jit).  ``__call__`` runs the full pipeline on a batch; use
    :meth:`cost_volume` / :meth:`disparity` for the stages separately, and
    :meth:`sharded_cost_volume` for the mesh-parallel path.

    The public-API superset of the reference: `custma.stereo_matching`
    (reference: custma/stereo_matching_wrapper.py:35) covered only the
    cost-volume stage for a single unbatched pair.
    """

    config: StereoConfig = StereoConfig()

    # -- single pair ------------------------------------------------------
    def cost_volume_single(self, camera: jax.Array,
                           projector: jax.Array) -> jax.Array:
        """ZNCC cost volume for one ``[H, W]`` pair.

        With ``config.grad_projector=True`` the op is differentiable in
        BOTH images: on a Pallas backend both gradients run hand-written
        closed-form kernels (the projector backward is the half the
        reference never implemented, custma/stereo_matching_wrapper.py:33);
        the XLA backend uses autodiff of the moments-form forward.
        """
        c = self.config
        backend = c.resolved_backend()
        if c.grad_projector:
            if backend.startswith("pallas") and c.num_disparities is not None:
                return stereo_matching_pallas(
                    camera, projector, c.num_disparities, c.kernel_size,
                    c.epsilon, backend == "pallas_interpret",
                    grad_projector=True)
            return stereo_matching_with_proj_grad(
                camera, projector, c.num_disparities, c.kernel_size,
                c.epsilon, c.precision)
        if backend.startswith("pallas"):
            if c.num_disparities is None:
                from custereomatching_tpu.ops.pallas_allpairs import (
                    stereo_matching_pallas_allpairs,
                )
                return stereo_matching_pallas_allpairs(
                    camera, projector, c.kernel_size, c.epsilon,
                    backend == "pallas_interpret", c.precision)
            return stereo_matching_pallas(
                camera, projector, c.num_disparities, c.kernel_size,
                c.epsilon, backend == "pallas_interpret")
        return _stereo_matching(camera, projector, c.num_disparities,
                                c.kernel_size, c.epsilon, c.precision)

    # -- batched ----------------------------------------------------------
    def cost_volume(self, camera: jax.Array,
                    projector: jax.Array) -> jax.Array:
        """ZNCC cost volume for a ``[B, H, W]`` batch.

        The Pallas backend runs frames through ``lax.map`` (each frame's
        kernel already saturates the chip; mapping avoids relying on a
        batching rule for the hand-rolled DMA kernel); the XLA backend
        vmaps.
        """
        if self.config.resolved_backend().startswith("pallas"):
            return jax.lax.map(
                lambda cp: self.cost_volume_single(cp[0], cp[1]),
                (camera, projector))
        return jax.vmap(self.cost_volume_single)(camera, projector)

    def disparity(self, cost_volume: jax.Array) -> DisparityResult:
        """Batched disparity head over a ``[B, H, W, L]`` volume."""
        c = self.config
        head = functools.partial(
            extract_disparity, num_disparities=c.num_disparities,
            threshold=c.cost_threshold, beta=c.softargmax_beta)
        return jax.vmap(head)(cost_volume)

    def __call__(self, camera: jax.Array,
                 projector: jax.Array) -> StereoOutput:
        """Full pipeline on a ``[B, H, W]`` batch."""
        cv = self.cost_volume(camera, projector)
        d = self.disparity(cv)
        return StereoOutput(cost_volume=cv, disparity=d.disparity,
                            soft_disparity=d.soft_disparity, mask=d.mask,
                            confidence=d.confidence)

    # -- fused inference path ----------------------------------------------
    def disparity_maps(self, camera: jax.Array,
                       projector: jax.Array) -> PipelineMaps:
        """Batched ``[B, H, W]`` pair → disparity maps, volume-free.

        On the Pallas backend this runs the fused kernel
        (:func:`..ops.pallas_pipeline.pallas_stereo_pipeline`): the cost
        volume never reaches HBM, collapsing per-frame memory traffic
        from ~2·volume to ~6 maps.  Inference-only (not differentiable);
        for training go through :meth:`cost_volume` + :meth:`disparity`.
        """
        c = self.config
        backend = c.resolved_backend()
        if backend.startswith("pallas"):
            if c.num_disparities is None:
                raise ValueError("fused pipeline requires banded mode")

            interp = backend == "pallas_interpret"
            hb, dtb = c.pipeline_blocks or (32, 40)

            def one(cam, proj):
                return pallas_stereo_pipeline(
                    cam, proj, c.num_disparities, c.kernel_size,
                    c.epsilon, c.softargmax_beta, c.cost_threshold,
                    hb, dtb, interp)

            if camera.shape[0] == 1:
                # Stacking a single frame only adds gap-row compute.
                maps = one(camera[0], projector[0])
                return jax.tree_util.tree_map(lambda x: x[None], maps)
            # One kernel launch for the whole batch (frames stacked along
            # H) — beats per-frame dispatch (see _run_stacked).
            return _run_stacked(one, camera, projector, c.kernel_size)
        out = self(camera, projector)
        return PipelineMaps(disparity=out.disparity,
                            soft_disparity=out.soft_disparity,
                            mask=out.mask, confidence=out.confidence)

    def trainable_disparity_maps(self, camera: jax.Array,
                                 projector: jax.Array) -> PipelineMaps:
        """Differentiable batched ``[B, H, W]`` pair → disparity maps.

        On the Pallas backend this is the fused trainable pipeline:
        neither the cost volume nor its cotangent ever exists in HBM
        (gradients flow through ``soft_disparity`` and ``confidence``;
        camera-only, reference parity).  Elsewhere it is the volume op +
        XLA head.
        """
        c = self.config
        backend = c.resolved_backend()
        # The fused trainable kernel's VJP is camera-only (reference
        # parity); projector training must take the volume + XLA-head path.
        if backend.startswith("pallas") and not c.grad_projector:
            if c.num_disparities is None:
                raise ValueError("fused pipeline requires banded mode")
            interp = backend == "pallas_interpret"

            def one(cam, proj):
                return stereo_pipeline_trainable(
                    cam, proj, c.num_disparities, c.kernel_size,
                    c.epsilon, c.softargmax_beta, c.cost_threshold, interp,
                    bwd_block_rows=c.trainable_bwd_block_rows or 0)

            if camera.shape[0] == 1:
                maps = one(camera[0], projector[0])
                return jax.tree_util.tree_map(lambda x: x[None], maps)
            return _run_stacked(one, camera, projector, c.kernel_size)
        out = self(camera, projector)
        return PipelineMaps(disparity=out.disparity,
                            soft_disparity=out.soft_disparity,
                            mask=out.mask, confidence=out.confidence)

    def disparity_maps_lr(self, camera: jax.Array, projector: jax.Array,
                          tolerance: float = 1.0) -> PipelineMaps:
        """Disparity maps with left-right consistency checking.

        Runs the fused pipeline in both directions (the right match is
        the left match of the horizontally flipped pair) and zeroes out
        pixels whose two estimates disagree by more than ``tolerance``
        px — occlusions and ambiguous matches that the confidence
        threshold alone misses.  Costs ~2× one pipeline pass.
        """
        from custereomatching_tpu.ops.consistency import lr_consistency_mask

        left = self.disparity_maps(camera, projector)
        right_f = self.disparity_maps(projector[:, :, ::-1],
                                      camera[:, :, ::-1])
        d_right = right_f.soft_disparity[:, :, ::-1]
        nd = self.config.num_disparities
        if nd is None:
            nd = camera.shape[-1] - 1
        check = jax.vmap(lambda dl, dr: lr_consistency_mask(
            dl, dr, nd, tolerance))
        lr = check(left.soft_disparity, d_right)
        mask = left.mask * lr
        return PipelineMaps(disparity=left.disparity * lr,
                            soft_disparity=left.soft_disparity * lr,
                            mask=mask, confidence=left.confidence)

    # -- mesh-sharded -----------------------------------------------------
    def sharded_cost_volume(self, camera: jax.Array, projector: jax.Array,
                            mesh: Mesh) -> jax.Array:
        """Cost volume sharded over a ``(data, space)`` mesh."""
        return sharded_cost_volume(camera, projector, self.config, mesh)

    def sharded_apply(self, camera: jax.Array, projector: jax.Array,
                      mesh: Mesh) -> StereoOutput:
        """Full pipeline with the volume sharded over ``mesh``.

        The disparity head is elementwise over the sharded axes (its
        reductions run along the unsharded disparity axis), so it needs no
        extra collectives — XLA keeps everything on-shard.
        """
        cv = self.sharded_cost_volume(camera, projector, mesh)
        d = self.disparity(cv)
        return StereoOutput(cost_volume=cv, disparity=d.disparity,
                            soft_disparity=d.soft_disparity, mask=d.mask,
                            confidence=d.confidence)
