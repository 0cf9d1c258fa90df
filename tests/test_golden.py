"""Golden jnp oracle vs the brute-force NumPy transliteration.

This formalizes what the reference did manually in an ipdb breakpoint
(examples/verify.py:154-156): numeric parity checks with tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custereomatching_tpu.ops import golden
from tests.np_oracle import zncc_brute


def _pair(H=8, W=10, seed=0):
    rng = np.random.default_rng(seed)
    cam = rng.uniform(size=(H, W)).astype(np.float32)
    proj = rng.uniform(size=(H, W)).astype(np.float32)
    return cam, proj


@pytest.mark.parametrize("k", [1, 3, 5])
def test_allpairs_matches_brute_force(k):
    cam, proj = _pair()
    want = zncc_brute(cam, proj, k)
    got = golden.zncc_cost_volume(jnp.asarray(cam), jnp.asarray(proj),
                                  None, k)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("D", [0, 3])
def test_banded_matches_brute_force(k, D):
    cam, proj = _pair(H=7, W=9, seed=1)
    want = zncc_brute(cam, proj, k, num_disparities=D)
    got = golden.zncc_cost_volume(jnp.asarray(cam), jnp.asarray(proj), D, k)
    assert got.shape == (7, 9, D + 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_banded_is_band_of_allpairs():
    # In-range band entries must agree with the all-pairs volume at the
    # corresponding absolute projector column.
    cam, proj = _pair(H=6, W=8, seed=2)
    D = 4
    ap = np.asarray(golden.zncc_cost_volume(jnp.asarray(cam),
                                            jnp.asarray(proj), None, 3))
    bd = np.asarray(golden.zncc_cost_volume(jnp.asarray(cam),
                                            jnp.asarray(proj), D, 3))
    for w in range(8):
        for d in range(D + 1):
            if w - d >= 0:
                np.testing.assert_allclose(bd[:, w, d], ap[:, w, w - d],
                                           rtol=1e-5, atol=1e-6)


def test_patch_extraction_layout():
    img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    patches = golden.extract_patches(img, 3)
    assert patches.shape == (3, 4, 9)
    # center offset (i=1, j=1) -> flat index 4 reproduces the image
    np.testing.assert_array_equal(np.asarray(patches[..., 4]),
                                  np.asarray(img))
    # top-left offset of pixel (0, 0) is out of bounds -> zero
    assert patches[0, 0, 0] == 0.0


def test_grad_exists_and_is_finite():
    cam, proj = _pair(H=6, W=7, seed=3)
    g = np.ones((6, 7, 7), np.float32)
    grad = golden.zncc_camera_grad(jnp.asarray(cam), jnp.asarray(proj),
                                   jnp.asarray(g), None, 3)
    assert grad.shape == cam.shape
    assert np.all(np.isfinite(np.asarray(grad)))
