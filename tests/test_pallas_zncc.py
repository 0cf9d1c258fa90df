"""Pallas kernel parity tests (interpreter mode on CPU).

The Pallas interpreter is the TPU analogue of a sanitizer build (survey
§5.2): every test here runs the real kernel logic — DMA staging, rolls,
static-slice unrolled disparity loop — against the golden jnp oracle.
The same kernel is compiled by Mosaic on real TPU hardware, where bench.py
exercises it at KITTI scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custereomatching_tpu.config import StereoConfig
from custereomatching_tpu.models import StereoMatcher
from custereomatching_tpu.ops.golden import (
    zncc_camera_grad,
    zncc_cost_volume,
)
from custereomatching_tpu.ops.pallas_zncc import (
    pallas_cost_volume_banded,
    stereo_matching_pallas,
)


def _pair(rng, H, W):
    return (jnp.asarray(rng.random((H, W), dtype=np.float32)),
            jnp.asarray(rng.random((H, W), dtype=np.float32)))


@pytest.mark.parametrize("shape", [
    # (H, W, D, k, block_rows, block_disparities)
    (24, 150, 10, 5, 8, 4),      # multiple h and d tiles, odd sizes
    (17, 100, 3, 3, 8, 104),     # tiny D, H not divisible by block
    (12, 260, 140, 7, 16, 64),   # D wider than one tile, W > 2 lanes
    (9, 40, 0, 5, 8, 8),         # D=0 (self-correlation band only)
])
def test_pallas_forward_matches_golden(shape):
    H, W, D, K, hb, dtb = shape
    rng = np.random.default_rng(0)
    cam, proj = _pair(rng, H, W)
    want = np.asarray(zncc_cost_volume(cam, proj, D, K))
    got = np.asarray(pallas_cost_volume_banded(
        cam, proj, D, K, block_rows=hb, block_disparities=dtb,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_vjp_matches_golden_grad():
    """Camera gradient through the Pallas op == jax.grad of the oracle,
    with both the all-ones cotangent (the reference's protocol,
    examples/verify.py:67-68) and a random cotangent."""
    H, W, D, K = 16, 64, 6, 5
    rng = np.random.default_rng(1)
    cam, proj = _pair(rng, H, W)

    for seed in (None, 2):
        if seed is None:
            g = jnp.ones((H, W, D + 1), jnp.float32)
        else:
            g = jnp.asarray(np.random.default_rng(seed).standard_normal(
                (H, W, D + 1)).astype(np.float32))

        def loss(c):
            return jnp.sum(stereo_matching_pallas(c, proj, D, K, 1e-8, True)
                           * g)

        got = np.asarray(jax.grad(loss)(cam))
        want = np.asarray(zncc_camera_grad(cam, proj, g, D, K))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pallas_projector_grad_is_zero():
    """Parity with the reference: projector gradient is None/zero
    (custma/stereo_matching_wrapper.py:33)."""
    H, W, D, K = 12, 40, 4, 3
    rng = np.random.default_rng(3)
    cam, proj = _pair(rng, H, W)

    def loss(p):
        return jnp.sum(stereo_matching_pallas(cam, p, D, K, 1e-8, True))

    g = np.asarray(jax.grad(loss)(proj))
    np.testing.assert_array_equal(g, np.zeros_like(g))


def test_model_pallas_interpret_backend():
    """The model layer dispatches to the kernel and batches via lax.map."""
    H, W, D, K = 16, 48, 6, 5
    rng = np.random.default_rng(4)
    cfg_pl = StereoConfig(kernel_size=K, num_disparities=D,
                          backend="pallas_interpret")
    cfg_xla = StereoConfig(kernel_size=K, num_disparities=D, backend="xla")
    cam = jnp.asarray(rng.random((2, H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((2, H, W), dtype=np.float32))
    got = np.asarray(StereoMatcher(cfg_pl).cost_volume(cam, proj))
    want = np.asarray(StereoMatcher(cfg_xla).cost_volume(cam, proj))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_auto_backend_on_cpu_is_xla():
    assert StereoConfig(num_disparities=8).resolved_backend() == "xla"
    assert StereoConfig().resolved_backend() == "xla"


@pytest.mark.parametrize("shape", [
    (24, 150, 10, 5, 8, 4),
    (16, 100, 37, 7, 16, 16),
])
def test_fused_pipeline_matches_head(shape):
    """Fused volume-free pipeline == golden volume + XLA disparity head."""
    from custereomatching_tpu.ops.disparity import extract_disparity
    from custereomatching_tpu.ops.pallas_pipeline import pallas_stereo_pipeline

    H, W, D, K, hb, dtb = shape
    rng = np.random.default_rng(7)
    cam, proj = _pair(rng, H, W)
    cv = zncc_cost_volume(cam, proj, D, K)
    want = extract_disparity(cv, num_disparities=D, threshold=0.6, beta=50.0)
    got = pallas_stereo_pipeline(cam, proj, D, K, 1e-8, 50.0, 0.6, hb, dtb,
                                 True)
    np.testing.assert_array_equal(np.asarray(got.disparity),
                                  np.asarray(want.disparity))
    np.testing.assert_array_equal(np.asarray(got.mask),
                                  np.asarray(want.mask))
    np.testing.assert_allclose(np.asarray(got.confidence),
                               np.asarray(want.confidence),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.soft_disparity),
                               np.asarray(want.soft_disparity),
                               rtol=1e-3, atol=1e-3)


def test_model_disparity_maps_backends_agree():
    """model.disparity_maps: fused pallas path == XLA volume+head path."""
    H, W, D, K = 16, 48, 6, 5
    rng = np.random.default_rng(8)
    cam = jnp.asarray(rng.random((2, H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((2, H, W), dtype=np.float32))
    got = StereoMatcher(StereoConfig(
        kernel_size=K, num_disparities=D,
        backend="pallas_interpret")).disparity_maps(cam, proj)
    want = StereoMatcher(StereoConfig(
        kernel_size=K, num_disparities=D,
        backend="xla")).disparity_maps(cam, proj)
    np.testing.assert_array_equal(np.asarray(got.disparity),
                                  np.asarray(want.disparity))
    np.testing.assert_allclose(np.asarray(got.soft_disparity),
                               np.asarray(want.soft_disparity),
                               rtol=1e-3, atol=1e-3)


def test_default_tile_gate_and_none_blocks():
    """Round 5: the raw HDW kernel's default ``block_disparities=None``
    resolves through the VMEM gate (_vjp_fwd_blocks) — dt=16 where the
    kernel's residents fit, dt=8 otherwise — and the padded output's
    plane count follows the gated choice."""
    from custereomatching_tpu.ops.pallas_zncc import (
        _vjp_fwd_blocks,
        pallas_cost_volume_banded_hdw,
    )

    # KITTI and the reference's verify shape admit dt=16; a 2048-wide
    # D=256 volume does not (its double-buffered staging alone would
    # blow the scoped VMEM).
    assert _vjp_fwd_blocks(375, 1242, 192, 15) == (48, 16)
    assert _vjp_fwd_blocks(330, 422, 200, 15) == (48, 16)
    assert _vjp_fwd_blocks(1024, 2048, 256, 15) == (48, 8)

    H, W, D, K = 24, 140, 16, 5
    rng = np.random.default_rng(31)
    cam, proj = _pair(rng, H, W)
    vol = pallas_cost_volume_banded_hdw(cam, proj, D, K, 1e-8, 8, None,
                                        True, True)
    assert vol.shape[0] == 32   # gated dt=16 declares ceil(17/16)*16
    want = zncc_cost_volume(cam, proj, D, K)
    got = jnp.swapaxes(vol[:D + 1, :H, :W], 0, 1)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.swapaxes(want, 1, 2)),
                               rtol=1e-5, atol=1e-5)
