"""Disparity head tests: mask/argmax/soft-argmax semantics from the
reference's example pipeline (examples/test.py:71-86, verify.py:31-39,72-74)."""

import jax.numpy as jnp
import numpy as np
import pytest

from custereomatching_tpu.ops import disparity as disp
from custereomatching_tpu.ops import zncc


def test_soft_argmax_peaked():
    x = jnp.zeros((2, 3, 10), jnp.float32).at[:, :, 7].set(5.0)
    got = disp.soft_argmax(x, beta=50.0)
    np.testing.assert_allclose(np.asarray(got), 7.0, atol=1e-3)


def test_soft_argmax_matches_hard_on_distinct_peaks():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(4, 5, 16)).astype(np.float32))
    hard = jnp.argmax(x, axis=-1)
    soft = disp.soft_argmax(x * 40.0, beta=50.0)  # sharpen
    np.testing.assert_allclose(np.asarray(soft), np.asarray(hard), atol=0.05)


def test_extract_disparity_banded_identity_shift():
    # camera = projector shifted right by 3 -> disparity 3 everywhere the
    # correlation is confident.
    rng = np.random.default_rng(1)
    proj = rng.uniform(size=(20, 40)).astype(np.float32)
    shift = 3
    cam = np.zeros_like(proj)
    cam[:, shift:] = proj[:, :-shift]
    cv = zncc.stereo_matching(jnp.asarray(cam), jnp.asarray(proj), 8, 5)
    res = disp.extract_disparity(cv, num_disparities=8, threshold=0.6)
    # interior pixels (away from borders where padding breaks correlation)
    inner = np.asarray(res.disparity)[6:-6, 10:-6]
    inner_mask = np.asarray(res.mask)[6:-6, 10:-6]
    assert inner_mask.min() == 1.0
    np.testing.assert_array_equal(inner, shift)


def test_extract_disparity_allpairs_identity_shift():
    rng = np.random.default_rng(2)
    proj = rng.uniform(size=(16, 30)).astype(np.float32)
    shift = 2
    cam = np.zeros_like(proj)
    cam[:, shift:] = proj[:, :-shift]
    cv = zncc.stereo_matching(jnp.asarray(cam), jnp.asarray(proj), None, 5)
    res = disp.extract_disparity(cv, num_disparities=None, threshold=0.6)
    inner = np.asarray(res.disparity)[5:-5, 8:-5]
    np.testing.assert_array_equal(inner, shift)


def test_mask_thresholding():
    # uncorrelated noise images: max correlation low in the interior;
    # masked disparity must be 0 there.
    rng = np.random.default_rng(3)
    cam = jnp.asarray(rng.uniform(size=(18, 24)).astype(np.float32))
    proj = jnp.asarray(rng.uniform(size=(18, 24)).astype(np.float32))
    cv = zncc.stereo_matching(cam, proj, 6, 7)
    res = disp.extract_disparity(cv, num_disparities=6, threshold=0.99)
    masked = np.asarray(res.disparity)[np.asarray(res.mask) == 0.0]
    assert (masked == 0.0).all()


def test_disparity_to_depth():
    d = jnp.asarray([[4.0, 0.0], [2.0, 8.0]])
    z = disp.disparity_to_depth(d, focal_length=100.0, baseline=0.2)
    np.testing.assert_allclose(np.asarray(z),
                               [[5.0, 0.0], [10.0, 2.5]])


def test_banded_shape_mismatch_raises():
    cv = jnp.zeros((4, 5, 7))
    with pytest.raises(ValueError):
        disp.extract_disparity(cv, num_disparities=4)
