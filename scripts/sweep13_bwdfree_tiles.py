"""Same-window A/B of the volume-free fused backward's row tile.

sweep7 ablated the volume-free backward's stages at hb ∈ {32, 48};
round 5's sweep12 found the camera with-cost backward prefers hb=96.
This checks whether the volume-free (recompute-mode) backward does
too, through the production knob (``bwd_block_rows``), interleaved in
one process like sweep12.

Usage:  python scripts/sweep13_bwdfree_tiles.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (375, 1242, 192, 15)


def _readback(x) -> float:
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def _chain(fn, args, n):
    out = fn(*args)
    for _ in range(n - 1):
        out = fn(*args)
    return out


def _time_once(fn, args, n1=4, n2=16, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _readback(_chain(fn, args, n1))
        t1 = time.perf_counter()
        _readback(_chain(fn, args, n2))
        t2 = time.perf_counter()
        slope = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
        if slope > 0:
            best = min(best, slope)
    return best


def main():
    from custereomatching_tpu.ops.pallas_pipeline import (
        stereo_pipeline_trainable)

    H, W, D, K = SHAPE
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((H, W), dtype=np.float32))
    tgt = jnp.zeros_like(cam)

    cases = {}
    for hb in (48, 96):
        def step(c, p, t, hb=hb):
            def loss(cc):
                maps = stereo_pipeline_trainable(
                    cc, p, D, K, save_volume=False, bwd_block_rows=hb)
                return jnp.mean((maps.soft_disparity - t) ** 2)
            return jax.value_and_grad(loss)(c)
        cases[f"volfree{hb}"] = (jax.jit(step), (cam, proj, tgt))

    live = {}
    for name, (fn, args) in cases.items():
        try:
            _readback(_chain(fn, args, 2))
            live[name] = (fn, args)
        except Exception as e:
            print(f"{name:>10}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    results = {name: [] for name in live}
    for _ in range(3):
        for name, (fn, args) in live.items():
            results[name].append(_time_once(fn, args))
    for name, ts in results.items():
        passes = " ".join(f"{t * 1e3:.3f}" for t in ts)
        print(f"{name:>10}: {min(ts) * 1e3:7.3f} ms  (passes: {passes})",
              flush=True)


if __name__ == "__main__":
    main()
