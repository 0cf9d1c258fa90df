"""Layout-conversion kernels (ops/pallas_layout.py): plane-major padded
volume ↔ reference-parity ``[H, W, D+1]``, interpret mode.

The parity layout is the reference's (banded) surface
(custma/src/stereo_matching_kernel.cu:30-33,197); the plane-major padded
layout is the round-4 production volume.  Every method must match the
XLA permute bit-exactly, and the parity→plane-major direction must
write exact zeros into all padding (the zero-cotangent contract of the
direct-DMA backwards, ops/pallas_zncc_bwd.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from custereomatching_tpu.ops.pallas_layout import (
    parity_to_plane_major,
    plane_major_to_parity,
)

SHAPES = [
    # (ndt, h_pad, wo, H, W, D)
    (16, 48, 256, 37, 130, 10),     # odd H, W over one lane tile
    (8, 16, 128, 16, 64, 7),        # tiny, D+1 == ndt
    (24, 96, 384, 96, 384, 20),     # exact multiples (no overhang)
]

METHODS = ["mxu", "t2d", "t2d1", "dot", "naive"]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("method", METHODS)
def test_plane_major_to_parity(shape, method):
    ndt, h_pad, wo, H, W, D = shape
    rng = np.random.default_rng(ndt + H)
    vol = jnp.asarray(rng.random((ndt, h_pad, wo), dtype=np.float32))
    got = plane_major_to_parity(vol, H, W, D, 16, 256, True, method)
    want = jnp.transpose(vol[: D + 1, :H, :W], (1, 2, 0))
    assert got.shape == (H, W, D + 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("method", ["mxu", "t2d1", "dot", "naive"])
def test_parity_to_plane_major(shape, method):
    ndt, h_pad, wo, H, W, D = shape
    rng = np.random.default_rng(ndt + W)
    g = jnp.asarray(rng.random((H, W, D + 1), dtype=np.float32))
    got = parity_to_plane_major(g, ndt, h_pad, wo, D, 16, 256, True,
                                method)
    want = jnp.zeros((ndt, h_pad, wo), jnp.float32)
    want = want.at[: D + 1, :H, :W].set(jnp.transpose(g, (2, 0, 1)))
    assert got.shape == (ndt, h_pad, wo)
    # Bit-exact INCLUDING the zero padding (the zero-cotangent contract).
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_unaligned_lanes_rejected_on_compiled_path():
    """parity→plane-major must reject (D+1) % 128 != 0 at trace time:
    Mosaic cannot DMA lane-dim slices that are not 128-aligned, and the
    interpret path accepting what Mosaic rejects is the exact blind
    spot that shipped broken kernels in round 3 (sweep9_layout.py)."""
    g = jnp.zeros((16, 64, 8), jnp.float32)
    with pytest.raises(ValueError, match="128-aligned"):
        parity_to_plane_major(g, 8, 16, 128, 7, 16, 256, False, "mxu")


def test_block_shape_knobs():
    ndt, h_pad, wo, H, W, D = 16, 48, 256, 37, 130, 10
    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.random((ndt, h_pad, wo), dtype=np.float32))
    want = jnp.transpose(vol[: D + 1, :H, :W], (1, 2, 0))
    for hb2, wc in [(8, 128), (24, 256), (48, 128)]:
        got = plane_major_to_parity(vol, H, W, D, hb2, wc, True, "mxu")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
