"""Block-size sweep for the three Pallas kernels on the real TPU.

Run: python scripts/sweep_blocks.py [pipeline|volume|bwd|all]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from custereomatching_tpu.ops.pallas_pipeline import _pipeline_forward
from custereomatching_tpu.ops.pallas_zncc import pallas_cost_volume_banded_hdw
from custereomatching_tpu.ops.pallas_zncc_bwd import (
    pallas_camera_grad_banded_hdw,
)

H, W, D, K = 375, 1242, 192, 15


def _readback(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


def _chain(fn, args, n, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _readback(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _time(fn, *args):
    for _ in range(3):
        _readback(fn(*args))
    t1 = _chain(fn, args, 8)
    t2 = _chain(fn, args, 32)
    return max((t2 - t1) / 24, 1e-9)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((H, W), dtype=np.float32))

    if which in ("pipeline", "all"):
        for hb, dt in [(32, 40), (48, 40), (64, 40), (80, 40), (64, 104)]:
            try:
                fn = jax.jit(lambda c, p, hb=hb, dt=dt: _pipeline_forward(
                    c, p, D, K, 1e-8, 50.0, 0.6, hb, dt).soft_disparity)
                t = _time(fn, cam, proj)
                print(f"pipeline hb={hb} dt={dt}: {t*1e3:.3f} ms "
                      f"({1/t:.1f} fps)", flush=True)
            except Exception as e:
                print(f"pipeline hb={hb} dt={dt}: FAIL "
                      f"{str(e).splitlines()[0][:120]}", flush=True)

    if which in ("volume", "all"):
        for hb, dt in [(24, 40), (48, 8), (64, 8), (96, 8), (64, 16)]:
            try:
                fn = jax.jit(
                    lambda c, p, hb=hb, dt=dt: pallas_cost_volume_banded_hdw(
                        c, p, D, K, 1e-8, hb, dt, False, True))
                t = _time(fn, cam, proj)
                print(f"volume-hdw hb={hb} dt={dt}: {t*1e3:.3f} ms "
                      f"({1/t:.1f} fps)", flush=True)
            except Exception as e:
                print(f"volume-hdw hb={hb} dt={dt}: FAIL "
                      f"{str(e).splitlines()[0][:120]}", flush=True)

    if which in ("bwd", "all"):
        n_planes = 200
        wo = 1280
        # Plane-major padded cotangent (round 4).
        g = jnp.asarray(
            rng.random((n_planes, 384, wo), dtype=np.float32))
        for hb, dt in [(48, 8), (64, 8), (96, 8), (112, 8), (64, 40)]:
            try:
                fn = jax.jit(
                    lambda c, p, gg, hb=hb, dt=dt:
                    pallas_camera_grad_banded_hdw(c, p, gg, D, K, 1e-8,
                                                  hb, dt))
                t = _time(fn, cam, proj, g)
                print(f"bwd-hdw hb={hb} dt={dt}: {t*1e3:.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"bwd-hdw hb={hb} dt={dt}: FAIL "
                      f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
