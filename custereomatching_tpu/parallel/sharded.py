"""Mesh-sharded stereo pipeline: batched, spatially tiled, differentiable.

The reference processes one ``[H, W]`` pair on one GPU with no batch
dimension (reference: custma/stereo_matching_wrapper.py:11-14) and no
distributed layer (survey §2.4).  This module is the TPU-first scale-out
design mandated by the north star:

* frames shard over mesh axis ``data`` (pure DP, zero comms);
* image rows shard over mesh axis ``space`` with a ``kernel_size//2``-row
  halo exchange over ICI (:func:`..parallel.halo.halo_exchange`);
* the cost volume never materializes globally — each shard holds its
  ``[B/dp, H/sp, W, D+1]`` slice, and downstream reductions (disparity
  head, losses) are elementwise or along the *unsharded* disparity axis,
  so XLA inserts collectives only for final scalar metrics.

Bit-parity claim (tested in tests/test_parallel.py): for any mesh shape,
the sharded cost volume equals the single-device one, because the halo
exchange delivers exactly the neighbor rows a window needs and delivers
zeros at true image borders — the reference's ``query_ij`` convention
(reference: custma/src/stereo_matching_kernel.cu:6-12).
"""

from __future__ import annotations

import functools
import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from custereomatching_tpu.config import StereoConfig
from custereomatching_tpu.ops.pallas_pipeline import (
    PipelineMaps,
    pallas_stereo_pipeline,
    stereo_pipeline_trainable,
)
from custereomatching_tpu.ops.pallas_zncc import stereo_matching_pallas
from custereomatching_tpu.ops.zncc import _stereo_matching
from custereomatching_tpu.parallel.halo import halo_exchange

# Canonical shardings for the pipeline's arrays.
IMAGE_SPEC = P("data", "space", None)          # [B, H, W]
VOLUME_SPEC = P("data", "space", None, None)   # [B, H, W, D+1]
MAP_SPEC = P("data", "space", None)            # [B, H, W] disparity/mask


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``[B, H, W]`` image batches on ``mesh``."""
    return NamedSharding(mesh, IMAGE_SPEC)


def volume_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``[B, H, W, L]`` cost volumes on ``mesh``."""
    return NamedSharding(mesh, VOLUME_SPEC)


def _pair_op(config: StereoConfig):
    """Single-pair cost-volume op for the resolved backend."""
    backend = config.resolved_backend()
    if backend.startswith("pallas") and config.num_disparities is not None:
        interp = backend == "pallas_interpret"

        def one(cam, proj):
            return stereo_matching_pallas(
                cam, proj, config.num_disparities, config.kernel_size,
                config.epsilon, interp)

        return one, True  # map sequentially (hand-rolled DMA kernel)

    def one(cam, proj):
        return _stereo_matching(cam, proj, config.num_disparities,
                                config.kernel_size, config.epsilon,
                                config.precision)

    return one, False


def _local_cost_volume(camera, projector, config: StereoConfig):
    """Per-shard computation: halo-extend rows, run the op, crop the halo.

    Runs inside ``shard_map``; ``camera``/``projector`` are the local
    ``[B_local, H_local, W]`` blocks.
    """
    # Single row-shard: the halo would be all zeros — exactly the zero
    # padding the op applies internally — so skip the extend+crop round
    # trip entirely (it costs ~(2·pad/H) extra rows of kernel work).
    halo = config.pad if lax.axis_size("space") > 1 else 0
    cam_e = halo_exchange(camera, halo, "space", axis=1)
    proj_e = halo_exchange(projector, halo, "space", axis=1)

    one, sequential = _pair_op(config)
    if cam_e.shape[0] == 1:
        # Single local frame: skip the map/vmap glue entirely (an 8%-class
        # overhead on the mesh-1×1 path for zero benefit).
        cv_e = one(cam_e[0], proj_e[0])[None]
    elif sequential:
        cv_e = jax.lax.map(lambda cp: one(cp[0], cp[1]), (cam_e, proj_e))
    else:
        cv_e = jax.vmap(one)(cam_e, proj_e)
    # Windows centered in halo rows belong to the neighbor shard; crop them.
    h_local = camera.shape[1]
    return lax.slice_in_dim(cv_e, halo, halo + h_local, axis=1)


def sharded_cost_volume(
    camera: jax.Array,
    projector: jax.Array,
    config: StereoConfig,
    mesh: Mesh,
) -> jax.Array:
    """Batched ZNCC cost volume, sharded over ``(data, space)``.

    Args:
      camera: ``[B, H, W]`` camera frames (B divisible by mesh.data,
        H divisible by mesh.space with ``H/space >= kernel_size//2``).
      projector: ``[B, H, W]`` projector frames.
      config: static op configuration.
      mesh: a ``(data, space)`` mesh from :func:`..parallel.mesh.make_mesh`.

    Returns:
      ``[B, H, W, L]`` cost volume with sharding ``P('data','space')`` on
      the first two axes.  Differentiable in ``camera`` (the analytic VJP
      runs per-shard; halo gradients flow back via the transposed
      ppermute).
    """
    fn = jax.shard_map(
        functools.partial(_local_cost_volume, config=config),
        mesh=mesh,
        in_specs=(IMAGE_SPEC, IMAGE_SPEC),
        out_specs=VOLUME_SPEC,
        # Pallas calls inside shard_map cannot declare varying-mesh-axes
        # metadata on their out_shapes; skip the vma check.
        check_vma=False,
    )
    return fn(camera, projector)


def _local_disparity_maps(camera, projector, config: StereoConfig,
                          trainable: bool):
    """Per-shard fused pipeline: halo-extend rows, run the fused kernel on
    the extended block, crop the halo rows of the output maps."""
    # See _local_cost_volume: one row-shard needs no halo round trip.
    halo = config.pad if lax.axis_size("space") > 1 else 0
    cam_e = halo_exchange(camera, halo, "space", axis=1)
    proj_e = halo_exchange(projector, halo, "space", axis=1)
    backend = config.resolved_backend()
    interp = backend == "pallas_interpret"
    fn = stereo_pipeline_trainable if trainable else pallas_stereo_pipeline

    hb, dtb = config.pipeline_blocks or (32, 40)

    def one(cp):
        if trainable:
            return fn(cp[0], cp[1], config.num_disparities,
                      config.kernel_size, config.epsilon,
                      config.softargmax_beta, config.cost_threshold, interp)
        return fn(cp[0], cp[1], config.num_disparities, config.kernel_size,
                  config.epsilon, config.softargmax_beta,
                  config.cost_threshold, hb, dtb, interp)

    if cam_e.shape[0] == 1:
        maps_e = jax.tree_util.tree_map(
            lambda m: m[None], one((cam_e[0], proj_e[0])))
    else:
        maps_e = jax.lax.map(one, (cam_e, proj_e))
    h_local = camera.shape[1]
    crop = lambda x: lax.slice_in_dim(x, halo, halo + h_local, axis=1)
    return PipelineMaps(*(crop(m) for m in maps_e))


def sharded_disparity_maps(
    camera: jax.Array,
    projector: jax.Array,
    config: StereoConfig,
    mesh: Mesh,
    *,
    trainable: bool = False,
) -> PipelineMaps:
    """Fused volume-free disparity pipeline, sharded over ``(data, space)``.

    Combines the two headline features: the fused Pallas pipeline (no
    cost volume in HBM) and spatial scale-out (row shards + ppermute halo
    exchange over ICI).  ``trainable=True`` uses the differentiable
    variant (camera gradients flow; halo-row gradients return to their
    owner shard via the transposed ppermute).

    Requires a Pallas-capable backend and banded mode.
    """
    if config.num_disparities is None:
        raise ValueError("fused sharded pipeline requires banded mode")
    if not config.resolved_backend().startswith("pallas"):
        raise ValueError(
            "fused sharded pipeline requires a pallas backend; use "
            "sharded_cost_volume + the XLA head instead")
    fn = jax.shard_map(
        functools.partial(_local_disparity_maps, config=config,
                          trainable=trainable),
        mesh=mesh,
        in_specs=(IMAGE_SPEC, IMAGE_SPEC),
        out_specs=PipelineMaps(MAP_SPEC, MAP_SPEC, MAP_SPEC, MAP_SPEC),
        check_vma=False,
    )
    return fn(camera, projector)


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of ``[B, H, W]`` arrays with the pipeline sharding."""
    sharding = image_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
