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
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from custereomatching_tpu.config import StereoConfig
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


def _local_cost_volume(camera, projector, config: StereoConfig):
    """Per-shard computation: halo-extend rows, run the op, crop the halo.

    Runs inside ``shard_map``; ``camera``/``projector`` are the local
    ``[B_local, H_local, W]`` blocks.
    """
    halo = config.pad
    cam_e = halo_exchange(camera, halo, "space", axis=1)
    proj_e = halo_exchange(projector, halo, "space", axis=1)

    def one(cam, proj):
        return _stereo_matching(cam, proj, config.num_disparities,
                                config.kernel_size, config.epsilon,
                                config.precision)

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
    )
    return fn(camera, projector)


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of ``[B, H, W]`` arrays with the pipeline sharding."""
    sharding = image_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
