"""Pallas backward-kernel tests (interpreter mode on CPU).

The reference's core feature is its hand-written backward
(custma/src/stereo_matching_kernel.cu:75-179); these tests pin the Pallas
re-derivation — closed-form gathers + box filters, no atomics — against
``jax.grad`` of the golden oracle, in all three cotangent modes:
parity-layout, padded-HDW direct-DMA, and the fully fused trainable
pipeline whose cost-volume cotangent never exists.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custereomatching_tpu.config import StereoConfig
from custereomatching_tpu.models import StereoMatcher
from custereomatching_tpu.ops import (
    extract_disparity,
    extract_disparity_hdw,
    stereo_matching,
    stereo_matching_pallas_hdw,
    stereo_pipeline_trainable,
)
from custereomatching_tpu.ops.golden import zncc_camera_grad
from custereomatching_tpu.ops.pallas_zncc_bwd import (
    pallas_camera_grad_banded,
    pallas_camera_grad_banded_hdw,
)


def _pair(rng, H, W):
    return (jnp.asarray(rng.random((H, W), dtype=np.float32)),
            jnp.asarray(rng.random((H, W), dtype=np.float32)))


@pytest.mark.parametrize("shape", [
    (24, 150, 10, 5, 8, 8),
    (16, 100, 37, 7, 16, 16),
])
def test_bwd_kernel_matches_golden(shape):
    H, W, D, K, hb, dtb = shape
    rng = np.random.default_rng(0)
    cam, proj = _pair(rng, H, W)
    g = jnp.asarray(rng.standard_normal((H, W, D + 1)).astype(np.float32))
    want = np.asarray(zncc_camera_grad(cam, proj, g, D, K))
    got = np.asarray(pallas_camera_grad_banded(
        cam, proj, g, D, K, 1e-8, hb, dtb, True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bwd_kernel_direct_hdw_cotangent():
    """Direct-DMA mode: cotangent in the kernel's padded plane-major
    layout ``[ndt, h_pad, wo]`` (round 4)."""
    H, W, D, K, hb = 24, 150, 10, 5, 8
    rng = np.random.default_rng(1)
    cam, proj = _pair(rng, H, W)
    g = rng.standard_normal((H, W, D + 1)).astype(np.float32)
    want = np.asarray(zncc_camera_grad(cam, proj, jnp.asarray(g), D, K))

    wo, ndt = 256, 16
    h_pad = -(-H // hb) * hb
    gp = np.zeros((ndt, h_pad, wo), np.float32)
    gp[:D + 1, :H, :W] = np.transpose(g, (2, 0, 1))
    got = np.asarray(pallas_camera_grad_banded_hdw(
        cam, proj, jnp.asarray(gp), D, K, 1e-8, hb, 8, True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_padded_hdw_training_path():
    """grad through stereo_matching_pallas_hdw + padded head == XLA path."""
    H, W, D, K = 24, 150, 10, 5
    rng = np.random.default_rng(2)
    cam, proj = _pair(rng, H, W)
    target = jnp.zeros((H, W))

    def loss_pad(c):
        cv = stereo_matching_pallas_hdw(c, proj, D, K, 1e-8, True)
        r = extract_disparity_hdw(cv, D, H, W)
        return jnp.mean((r.soft_disparity - target) ** 2)

    def loss_xla(c):
        r = extract_disparity(stereo_matching(c, proj, D, K),
                              num_disparities=D)
        return jnp.mean((r.soft_disparity - target) ** 2)

    g1 = np.asarray(jax.grad(loss_pad)(cam))
    g2 = np.asarray(jax.grad(loss_xla)(cam))
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-6)


def test_fused_trainable_pipeline_grad():
    """Fused trainable pipeline (volume-free both directions) gradient ==
    XLA volume+head gradient, including the confidence cotangent."""
    H, W, D, K = 24, 150, 10, 5
    rng = np.random.default_rng(3)
    cam, proj = _pair(rng, H, W)
    target = jnp.asarray(rng.random((H, W), dtype=np.float32)) * 3

    def loss_fused(c):
        r = stereo_pipeline_trainable(c, proj, D, K, 1e-8, 50.0, 0.6, True)
        return (jnp.mean((r.soft_disparity - target) ** 2)
                + 0.1 * jnp.mean(r.confidence))

    def loss_xla(c):
        r = extract_disparity(stereo_matching(c, proj, D, K),
                              num_disparities=D)
        return (jnp.mean((r.soft_disparity - target) ** 2)
                + 0.1 * jnp.mean(r.confidence))

    v1, g1 = jax.value_and_grad(loss_fused)(cam)
    v2, g2 = jax.value_and_grad(loss_xla)(cam)
    assert abs(float(v1) - float(v2)) < 1e-4
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-6)


def test_trainable_pipeline_padded_plane_grad():
    """save_volume=True declares the residual volume's plane dim rounded
    up to a multiple of 16 when the tail fits the backward's skipped
    last tile (D=23: 24 planes declared as 32, backward dt=16).  The
    unwritten tail planes must never contaminate the gradient: compare
    against both the volume-free fused mode and the XLA reference."""
    H, W, D, K = 32, 160, 23, 5
    rng = np.random.default_rng(7)
    cam, proj = _pair(rng, H, W)
    target = jnp.asarray(rng.random((H, W), dtype=np.float32)) * 3

    def loss(mode):
        def f(c):
            r = stereo_pipeline_trainable(c, proj, D, K, 1e-8, 50.0, 0.6,
                                          True, save_volume=mode)
            return jnp.mean((r.soft_disparity - target) ** 2)
        return f

    def loss_xla(c):
        r = extract_disparity(stereo_matching(c, proj, D, K),
                              num_disparities=D)
        return jnp.mean((r.soft_disparity - target) ** 2)

    g_vol = np.asarray(jax.grad(loss(True))(cam))
    g_free = np.asarray(jax.grad(loss(False))(cam))
    g_ref = np.asarray(jax.grad(loss_xla)(cam))
    assert np.isfinite(g_vol).all()
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_vol / scale, g_free / scale, atol=2e-5)
    np.testing.assert_allclose(g_vol / scale, g_ref / scale, atol=2e-5)


def test_hdw_with_cost_padding_garbage():
    """Zero-cotangent-padding contract of the with-cost direct-DMA
    backward (ADVICE r3): the in-kernel gradient combine box-filters
    fields across the image's bottom/right edges, so garbage in the
    cotangent's spatial padding corrupts edge-pixel gradients — it is
    NOT merely ignored.  Pins both halves: (a) a contract-respecting
    cotangent reproduces the golden gradient exactly, and (b) padding
    garbage perturbs only pixels within the kernel's reach of the
    bottom/right image edges, leaving the interior bit-identical."""
    from custereomatching_tpu.ops.pallas_zncc import (
        pallas_cost_volume_banded_hdw)
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_camera_grad_banded_hdw_with_cost)

    H, W, D, K, hb = 20, 150, 10, 5, 8   # h_pad=24 > H: real row padding
    p = K // 2
    rng = np.random.default_rng(17)
    cam, proj = _pair(rng, H, W)
    vol = pallas_cost_volume_banded_hdw(cam, proj, D, K, 1e-8, hb, 8,
                                        True, True)
    g = rng.standard_normal((D + 1, H, W)).astype(np.float32)
    gp = np.zeros(vol.shape, np.float32)       # [ndt, h_pad, wo]
    gp[:D + 1, :H, :W] = g

    def run(cot):
        return np.asarray(pallas_camera_grad_banded_hdw_with_cost(
            cam, proj, vol, jnp.asarray(cot), D, K, 1e-8, hb, 8, True))

    clean = run(gp)
    want = np.asarray(zncc_camera_grad(
        cam, proj, jnp.asarray(np.transpose(g, (1, 2, 0))), D, K))
    np.testing.assert_allclose(clean, want, rtol=1e-4, atol=1e-5)

    dirty_cot = gp.copy()
    dirty_cot[:D + 1, H:, :] = 7.5      # padded rows
    dirty_cot[:D + 1, :, W:] = -3.25    # padded columns
    dirty = run(dirty_cot)
    diff = np.abs(dirty - clean)
    assert diff.max() > 0.0, (
        "padding garbage had no effect — the zero-cotangent contract "
        "(and this test) should be retired")
    # Corruption is confined to the kernel's reach of the bottom/right
    # edges; the interior is untouched.
    reach = 2 * p
    assert np.all(diff[:H - reach, :W - reach] == 0.0)


def test_hdw_with_cost_decoupled_producer_tiling():
    """Round 5: the with-cost backward derives its disparity-tile count
    from D (``ceil((D+1)/dt)`` tiles), not from the source volume's plane
    count, so a producer with a WIDER plane padding feeds it exactly.
    D=16 with a dt=16 forward declares 32 planes; the dt=8 backward
    processes 24 — planes [17, 24) are DMA'd but skipped (n_last tail),
    planes [24, 32) never touched.  Poison both regions with NaN: none
    of it may leak into the gradient."""
    from custereomatching_tpu.ops.pallas_zncc import (
        pallas_cost_volume_banded_hdw)
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_camera_grad_banded_hdw_with_cost)

    H, W, D, K = 24, 140, 16, 5
    rng = np.random.default_rng(23)
    cam, proj = _pair(rng, H, W)
    vol = pallas_cost_volume_banded_hdw(cam, proj, D, K, 1e-8, 8, 16,
                                        True, True)
    assert vol.shape[0] == 32   # dt=16 producer: 17 planes declared as 32

    g = rng.standard_normal((D + 1, H, W)).astype(np.float32)
    gp = np.zeros(vol.shape, np.float32)
    gp[:D + 1, :H, :W] = g
    poisoned = np.asarray(vol).copy()
    poisoned[D + 1:] = np.nan

    got = np.asarray(pallas_camera_grad_banded_hdw_with_cost(
        cam, proj, jnp.asarray(poisoned), jnp.asarray(gp), D, K, 1e-8,
        8, 8, True))
    want = np.asarray(zncc_camera_grad(
        cam, proj, jnp.asarray(np.transpose(g, (1, 2, 0))), D, K))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_bwd_c_rejects_non_multiple_planes():
    """A residual volume whose plane count no disparity tile divides must
    fail loudly (ADVICE r3): silent ``n_planes // dt`` truncation would
    drop the tail planes from the gradient.  Unreachable through the
    internal forwards (always 8-multiples); pinned at the impl."""
    from custereomatching_tpu.ops.pallas_pipeline import (
        _fused_train_bwd_c_impl)

    H, W, D, K = 16, 128, 9, 5
    rng = np.random.default_rng(19)
    cam, proj = _pair(rng, H, W)
    maps = tuple(jnp.zeros((16, 128), jnp.float32) for _ in range(7))
    # Plane-major residual: 13 planes (13 % 8 != 0), 24 rows.
    cost = jnp.zeros((13, 24, 128), jnp.float32)
    with pytest.raises(ValueError, match="not a multiple"):
        _fused_train_bwd_c_impl(cam, proj, maps, cost, D, K, 1e-8, 50.0,
                                8, True)


def test_model_training_uses_fused_path():
    """model-level disparity_loss gradient on the pallas_interpret backend
    == xla backend (exercises the dispatch in models/optimize.py)."""
    from custereomatching_tpu.models.optimize import disparity_loss

    H, W, D, K = 16, 64, 6, 5
    rng = np.random.default_rng(4)
    cam = jnp.asarray(rng.random((2, H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((2, H, W), dtype=np.float32))
    target = jnp.zeros((2, H, W))

    m_pl = StereoMatcher(StereoConfig(kernel_size=K, num_disparities=D,
                                      backend="pallas_interpret"))
    m_xla = StereoMatcher(StereoConfig(kernel_size=K, num_disparities=D,
                                       backend="xla"))
    g1 = np.asarray(jax.grad(
        lambda c: disparity_loss(m_pl, c, proj, target))(cam))
    g2 = np.asarray(jax.grad(
        lambda c: disparity_loss(m_xla, c, proj, target))(cam))
    np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-6)


# ---------------------------------------------------------------------------
# Projector gradient (round 3): the backward half the reference never wrote
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [
    (16, 24, 5, 3, 16),
    (24, 150, 10, 5, 8),
    (40, 96, 12, 15, 16),
])
def test_projector_grad_kernel_matches_golden(shape):
    from custereomatching_tpu.ops.golden import zncc_projector_grad
    from custereomatching_tpu.ops.pallas_zncc import (
        pallas_cost_volume_banded_hdw)
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_projector_grad_banded_hdw_with_cost)

    H, W, D, K, hb = shape
    rng = np.random.default_rng(3)
    cam, proj = _pair(rng, H, W)
    vol = pallas_cost_volume_banded_hdw(cam, proj, D, K, 1e-8, hb, 8,
                                        True, True)
    g = rng.standard_normal((D + 1, H, W)).astype(np.float32)
    gp = np.zeros(vol.shape, np.float32)       # [ndt, h_pad, wo]
    gp[:D + 1, :H, :W] = g
    got = np.asarray(pallas_projector_grad_banded_hdw_with_cost(
        cam, proj, vol, jnp.asarray(gp), D, K, 1e-8, hb, 8, True))
    want = np.asarray(zncc_projector_grad(
        cam, proj, jnp.asarray(np.transpose(g, (1, 2, 0))), D, K))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_both_grads_public_op_matches_golden():
    """stereo_matching_pallas(grad_projector=True): both closed-form
    kernels vs golden autodiff, through the public parity surface."""
    from custereomatching_tpu.ops.golden import (
        zncc_camera_grad,
        zncc_projector_grad,
    )
    from custereomatching_tpu.ops.pallas_zncc import stereo_matching_pallas

    H, W, D, K = 24, 64, 9, 5
    rng = np.random.default_rng(4)
    cam, proj = _pair(rng, H, W)
    g = jnp.asarray(rng.standard_normal((H, W, D + 1)).astype(np.float32))

    def loss(c, p):
        return jnp.sum(
            stereo_matching_pallas(c, p, D, K, 1e-8, True, True) * g)

    gc, gp = jax.grad(loss, argnums=(0, 1))(cam, proj)
    np.testing.assert_allclose(np.asarray(gc),
                               np.asarray(zncc_camera_grad(cam, proj, g,
                                                           D, K)),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp),
                               np.asarray(zncc_projector_grad(cam, proj, g,
                                                              D, K)),
                               rtol=1e-4, atol=1e-5)


def test_model_grad_projector_uses_pallas_kernels():
    """StereoMatcher(grad_projector=True) on a pallas backend matches the
    XLA autodiff path bit-for-tolerance, gradients in BOTH images."""
    H, W, D, K = 24, 64, 8, 5
    rng = np.random.default_rng(5)
    cam, proj = _pair(rng, H, W)
    m_pl = StereoMatcher(StereoConfig(kernel_size=K, num_disparities=D,
                                      backend="pallas_interpret",
                                      grad_projector=True))
    m_xla = StereoMatcher(StereoConfig(kernel_size=K, num_disparities=D,
                                       backend="xla", grad_projector=True))

    def loss(model, c, p):
        cv = model.cost_volume_single(c, p)
        return jnp.sum(cv * cv)

    gc1, gp1 = jax.grad(loss, argnums=(1, 2))(m_pl, cam, proj)
    gc2, gp2 = jax.grad(loss, argnums=(1, 2))(m_xla, cam, proj)
    assert float(jnp.max(jnp.abs(gp1))) > 0.0   # projector grad is real
    np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp1), np.asarray(gp2),
                               rtol=1e-4, atol=1e-5)


def test_trainable_volume_free_tile_mismatch():
    """The volume-free forward tiles its residual maps at 32 rows while
    the backward defaults to 48-row tiles; at heights where the two
    padded extents differ (H=56: maps padded to 64, a 48-row backward
    would pad to 96) the backward must shrink its tile rather than let
    the clamped residual-map DMA run past the staging buffer (the
    pre-glue-fusion kernel read out of bounds here)."""
    H, W, D, K = 56, 200, 24, 11
    rng = np.random.default_rng(11)
    cam, proj = _pair(rng, H, W)
    target = jnp.asarray(rng.random((H, W), dtype=np.float32)) * 5

    def loss_free(c):
        r = stereo_pipeline_trainable(c, proj, D, K, 1e-8, 50.0, 0.6,
                                      True, save_volume=False)
        return (jnp.mean((r.soft_disparity - target) ** 2)
                + 0.1 * jnp.mean(r.confidence))

    def loss_xla(c):
        r = extract_disparity(stereo_matching(c, proj, D, K),
                              num_disparities=D)
        return (jnp.mean((r.soft_disparity - target) ** 2)
                + 0.1 * jnp.mean(r.confidence))

    v1, g1 = jax.value_and_grad(loss_free)(cam)
    v2, g2 = jax.value_and_grad(loss_xla)(cam)
    assert np.isfinite(np.asarray(g1)).all()
    assert abs(float(v1) - float(v2)) < 1e-4
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("save_volume", [True, False])
def test_trainable_bwd_block_rows_override(save_volume):
    """bwd_block_rows only retiles the backward: gradients are identical
    (same math, different grid) to the default tiling."""
    H, W, D, K = 40, 160, 16, 7
    rng = np.random.default_rng(13)
    cam, proj = _pair(rng, H, W)
    target = jnp.asarray(rng.random((H, W), dtype=np.float32)) * 3

    def loss(bb):
        def f(c):
            r = stereo_pipeline_trainable(c, proj, D, K, 1e-8, 50.0, 0.6,
                                          True, save_volume=save_volume,
                                          bwd_block_rows=bb)
            return jnp.mean((r.soft_disparity - target) ** 2)
        return f

    g_def = np.asarray(jax.grad(loss(0))(cam))
    g_16 = np.asarray(jax.grad(loss(16))(cam))
    np.testing.assert_allclose(g_def, g_16, rtol=1e-5, atol=1e-7)
