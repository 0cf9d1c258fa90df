"""Coarse-to-fine pyramid matcher tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from custereomatching_tpu.config import StereoConfig
from custereomatching_tpu.models import PyramidStereoMatcher, StereoMatcher
from custereomatching_tpu.models.pyramid import _avg_pool, _select_shifted
from custereomatching_tpu.data.synthetic import (
    render_camera,
    slanted_plane_disparity,
    speckle_pattern,
)
from custereomatching_tpu.utils import disparity_metrics


def test_select_shifted_matches_gather():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((10, 40), dtype=np.float32))
    k = jnp.asarray(rng.integers(-3, 6, (10, 40)).astype(np.float32))
    got = np.asarray(_select_shifted(src, k, -3, 5))
    cols = np.arange(40)[None, :] - np.asarray(k, np.int64)
    valid = (cols >= 0) & (cols < 40)
    want = np.where(valid,
                    np.asarray(src)[np.arange(10)[:, None],
                                    np.clip(cols, 0, 39)], 0.0)
    np.testing.assert_array_equal(got, want)


def test_avg_pool():
    x = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    got = np.asarray(_avg_pool(x, 2))
    np.testing.assert_allclose(got, [[2.5, 4.5], [10.5, 12.5]])


def _multi_octave(H, W, seed=0):
    """Texture with energy at several scales — the regime the pyramid is
    designed for (pure speckle loses its signal under pooling)."""
    p1 = speckle_pattern(H, W, seed=seed)
    p2 = speckle_pattern(H, W, dot_density=0.02, dot_sigma=4.0, seed=seed + 1)
    p3 = speckle_pattern(H, W, dot_density=0.005, dot_sigma=12.0,
                         seed=seed + 2)
    return (0.4 * p1 + 0.35 * p2 + 0.25 * p3).astype(np.float32)


def test_pyramid_matches_direct_on_smooth_scene():
    H, W, D, K = 96, 256, 48, 11
    proj = _multi_octave(H, W)
    dtrue = slanted_plane_disparity(H, W, d_min=4, d_max=40)
    cam = render_camera(proj, dtrue, noise=0.005)
    cfg = StereoConfig(kernel_size=K, num_disparities=D, backend="xla")

    pyr = PyramidStereoMatcher(cfg, downsample=4, residual=8)
    maps = pyr(jnp.asarray(cam)[None], jnp.asarray(proj)[None])
    m = disparity_metrics(maps.soft_disparity[0], jnp.asarray(dtrue),
                          maps.mask[0])
    assert m["coverage"] > 0.9
    assert m["epe"] < 1.5
    assert m["bad3"] < 0.05


def test_pyramid_pallas_interpret_backend():
    """The pyramid runs the fused kernel at both levels under interpret."""
    H, W, D, K = 48, 128, 16, 7
    proj = _multi_octave(H, W, seed=5)
    dtrue = slanted_plane_disparity(H, W, d_min=2, d_max=12)
    cam = render_camera(proj, dtrue)
    cfg = StereoConfig(kernel_size=K, num_disparities=D,
                       backend="pallas_interpret")
    pyr = PyramidStereoMatcher(cfg, downsample=2, residual=4)
    maps = pyr(jnp.asarray(cam)[None], jnp.asarray(proj)[None])
    m = disparity_metrics(maps.soft_disparity[0], jnp.asarray(dtrue),
                          maps.mask[0])
    assert m["coverage"] > 0.8
    assert m["epe"] < 1.5


def test_pyramid_requires_banded():
    with pytest.raises(ValueError):
        PyramidStereoMatcher(StereoConfig(num_disparities=None))


def test_lr_consistency_improves_occlusions():
    """Left-right checking removes occluded/ambiguous pixels: error rate
    among surviving pixels improves, at some coverage cost."""
    from custereomatching_tpu.data import make_stereo_pair

    cam, proj, dtrue = make_stereo_pair(64, 128, scene="box", d_min=3,
                                        d_max=12, noise=0.01, seed=0)
    model = StereoMatcher(StereoConfig(kernel_size=9, num_disparities=16,
                                       backend="xla"))
    camb, projb = jnp.asarray(cam)[None], jnp.asarray(proj)[None]
    plain = model.disparity_maps(camb, projb)
    lr = model.disparity_maps_lr(camb, projb, tolerance=1.0)
    mp = disparity_metrics(plain.soft_disparity[0], jnp.asarray(dtrue),
                           plain.mask[0])
    ml = disparity_metrics(lr.soft_disparity[0], jnp.asarray(dtrue),
                           lr.mask[0])
    assert ml["epe"] < mp["epe"]
    assert ml["bad3"] < mp["bad3"]
    assert ml["coverage"] > 0.8
