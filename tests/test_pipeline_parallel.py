"""Pipeline parallelism over disparity-range stages (parallel/pipeline.py).

The frame stream flows through S stages, each owning (D+1)/S disparity
planes; only the four head-state maps travel between stages.  The merged
result must equal the single-device full-range matcher.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custereomatching_tpu.config import StereoConfig
from custereomatching_tpu.models import StereoMatcher
from custereomatching_tpu.parallel.pipeline import (
    HeadState,
    chunk_state,
    empty_state,
    finalize_state,
    merge_states,
    pipelined_video_maps,
    stage_mesh,
)


def _video(T=5, H=20, W=36, seed=0):
    rng = np.random.default_rng(seed)
    cams = jnp.asarray(rng.uniform(size=(T, H, W)).astype(np.float32))
    projs = jnp.asarray(rng.uniform(size=(T, H, W)).astype(np.float32))
    return cams, projs


@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
def test_chunk_merge_equals_full_range(backend):
    """Merging per-chunk head states == the full-range head (no mesh)."""
    cams, projs = _video(T=1)
    cam, proj = cams[0], projs[0]
    D, k = 7, 5
    cfg = StereoConfig(kernel_size=k, num_disparities=D, backend=backend)
    S, chunk = 4, (D + 1) // 4

    state = empty_state(cam.shape)
    for s in range(S):
        part = chunk_state(cam, proj, s * chunk, chunk, cfg)
        state = merge_states(state, part)
    got = finalize_state(state, cfg)

    model = StereoMatcher(StereoConfig(kernel_size=k, num_disparities=D,
                                       backend="xla"))
    want = model(cam[None], proj[None])
    np.testing.assert_array_equal(np.asarray(got.disparity),
                                  np.asarray(want.disparity[0]))
    np.testing.assert_allclose(np.asarray(got.soft_disparity),
                               np.asarray(want.soft_disparity[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.confidence),
                               np.asarray(want.confidence[0]),
                               rtol=1e-5, atol=1e-6)


def test_merge_tie_breaks_to_lower_disparity():
    """First-max semantics: equal maxima resolve to the LOW chunk."""
    shape = (2, 2)
    low = HeadState(m=jnp.full(shape, 5.0), am=jnp.full(shape, 3.0),
                    s=jnp.ones(shape), t=jnp.full(shape, 3.0))
    high = HeadState(m=jnp.full(shape, 5.0), am=jnp.full(shape, 9.0),
                     s=jnp.ones(shape), t=jnp.full(shape, 9.0))
    merged = merge_states(low, high)
    np.testing.assert_array_equal(np.asarray(merged.am), 3.0)
    np.testing.assert_allclose(np.asarray(merged.s), 2.0)


@pytest.mark.parametrize("S,backend", [(2, "xla"), (4, "xla"),
                                       (2, "pallas_interpret"),
                                       (4, "pallas_interpret")])
def test_pipelined_video_matches_single_device(S, backend):
    cams, projs = _video(T=5)
    D, k = 7, 5
    cfg = StereoConfig(kernel_size=k, num_disparities=D, backend=backend)
    mesh = stage_mesh(S)
    got = pipelined_video_maps(cams, projs, cfg, mesh)

    model = StereoMatcher(cfg)
    want = model(cams, projs)
    np.testing.assert_array_equal(np.asarray(got.disparity),
                                  np.asarray(want.disparity))
    np.testing.assert_allclose(np.asarray(got.soft_disparity),
                               np.asarray(want.soft_disparity),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.mask),
                               np.asarray(want.mask))


def test_pipelined_requires_exact_tiling():
    cams, projs = _video(T=2)
    cfg = StereoConfig(kernel_size=5, num_disparities=8)  # 9 planes
    with pytest.raises(ValueError, match="divide evenly"):
        pipelined_video_maps(cams, projs, cfg, stage_mesh(2))
