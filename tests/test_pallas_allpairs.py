"""Pallas all-pairs kernel vs the golden-pinned XLA path.

The all-pairs ``[H, W, W]`` layout is the reference's ACTUAL output
(its D argument is ignored — custma/src/stereo_matching_kernel.cu:194),
so this kernel is the Pallas counterpart of the parity surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custereomatching_tpu.ops.pallas_allpairs import (
    pallas_cost_volume_allpairs,
    stereo_matching_pallas_allpairs,
)
from custereomatching_tpu.ops.zncc import _forward_allpairs, stereo_matching


def _pair(H, W, seed=0):
    rng = np.random.default_rng(seed)
    cam = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    proj = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    return cam, proj


@pytest.mark.parametrize("shape", [
    (24, 60, 5),      # small, W < 128
    (16, 150, 15),    # reference kernel size, W > 128
    (13, 40, 7),      # H not a multiple of the row block (overhang mask)
    (9, 129, 3),      # W just over a lane tile
])
def test_matches_xla_path(shape):
    H, W, K = shape
    cam, proj = _pair(H, W)
    got = pallas_cost_volume_allpairs(cam, proj, K, 1e-8, 8, True)
    want = _forward_allpairs(cam, proj, K, 1e-8, "highest")
    assert got.shape == (H, W, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_y_tiled_matches_single_tile():
    """Round 4: the output's y axis tiles (large-W coverage).  Forcing
    yt=128 at wo=256 (n_y=2) must be bit-identical to the one-tile run —
    the im2col stacks are built once per row block and shared."""
    H, W, K = 16, 150, 15
    cam, proj = _pair(H, W, seed=3)
    one = pallas_cost_volume_allpairs(cam, proj, K, 1e-8, 8, True,
                                      "highest", 0)
    tiled = pallas_cost_volume_allpairs(cam, proj, K, 1e-8, 8, True,
                                        "highest", 128)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(tiled))


def test_matches_public_op_and_grad():
    """Differentiable wrapper: forward equals the public all-pairs op,
    camera grad equals the XLA custom-vjp's, projector grad is zero."""
    H, W, K = 16, 96, 9
    cam, proj = _pair(H, W, seed=3)

    def loss_pl(c, p):
        return jnp.sum(stereo_matching_pallas_allpairs(c, p, K, 1e-8, True))

    def loss_xla(c, p):
        return jnp.sum(stereo_matching(c, p, None, K))

    gc_pl, gp_pl = jax.grad(loss_pl, (0, 1))(cam, proj)
    gc_x, gp_x = jax.grad(loss_xla, (0, 1))(cam, proj)
    np.testing.assert_allclose(np.asarray(gc_pl), np.asarray(gc_x),
                               atol=1e-4, rtol=1e-4)
    assert float(jnp.abs(gp_pl).max()) == 0.0
    assert float(jnp.abs(gp_x).max()) == 0.0


def test_model_routes_allpairs_to_pallas():
    """StereoMatcher with num_disparities=None on a pallas backend now
    runs the kernel (it used to raise)."""
    from custereomatching_tpu import StereoConfig, StereoMatcher

    H, W, K = 16, 64, 5
    cam, proj = _pair(H, W, seed=5)
    m_pl = StereoMatcher(StereoConfig(kernel_size=K, num_disparities=None,
                                      backend="pallas_interpret"))
    m_x = StereoMatcher(StereoConfig(kernel_size=K, num_disparities=None,
                                     backend="xla"))
    got = m_pl.cost_volume_single(cam, proj)
    want = m_x.cost_volume_single(cam, proj)
    assert got.shape == (H, W, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_rejects_bad_kernel_size():
    cam, proj = _pair(8, 32)
    with pytest.raises(ValueError, match="odd"):
        pallas_cost_volume_allpairs(cam, proj, 4, 1e-8, 8, True)


def test_batched_allpairs_on_pallas_backend():
    """Batched cost_volume must lax.map the kernel (vmap of a pallas_call
    has no batching rule)."""
    from custereomatching_tpu import StereoConfig, StereoMatcher

    H, W, K, B = 16, 64, 5, 2
    rng = np.random.default_rng(7)
    cam = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
    proj = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
    m_pl = StereoMatcher(StereoConfig(kernel_size=K, num_disparities=None,
                                      backend="pallas_interpret"))
    m_x = StereoMatcher(StereoConfig(kernel_size=K, num_disparities=None,
                                     backend="xla"))
    got = m_pl.cost_volume(cam, proj)
    want = m_x.cost_volume(cam, proj)
    assert got.shape == (B, H, W, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
