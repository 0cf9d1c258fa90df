"""Tile sweep of the PRODUCTION projector-gradient kernel on TPU.

sweep5 ablates a rows-major mirror of the kernel's stages; this sweeps
the shipped plane-major kernel itself
(``pallas_projector_grad_banded_hdw_with_cost``) over (block_rows,
block_disparities), including the XLA epilogue boxes, at the KITTI
bench shape.  The shipped default is (48, 8).

Usage:  python scripts/sweep11_projbwd_tiles.py [--tiles 48x8,32x8,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (375, 1242, 192, 15)
EPS = 1e-8


def _readback(x) -> float:
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def _chain(fn, args, n):
    out = fn(*args)
    for _ in range(n - 1):
        out = fn(*args)
    return out


def _time(fn, *args, n1=6, n2=30, repeats=5):
    _readback(_chain(fn, args, 2))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _readback(_chain(fn, args, n1))
        t1 = time.perf_counter()
        _readback(_chain(fn, args, n2))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


DEFAULT_TILES = "48x8,32x8,64x8,40x8,48x4,48x16,32x16,56x8,48x24"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default=DEFAULT_TILES)
    args = ap.parse_args()

    from custereomatching_tpu.ops.pallas_zncc import (
        pallas_cost_volume_banded_hdw)
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_projector_grad_banded_hdw_with_cost)

    H, W, D, K = SHAPE
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((H, W), dtype=np.float32))
    vol = jax.jit(lambda c, p: pallas_cost_volume_banded_hdw(
        c, p, D, K, EPS, 48, 8, False, True))(cam, proj)
    g = jnp.ones(vol.shape, vol.dtype)

    base = None
    for tile in args.tiles.split(","):
        hb, dt = (int(x) for x in tile.split("x"))
        try:
            fn = jax.jit(
                lambda c, p, v, gg, hb=hb, dt=dt:
                pallas_projector_grad_banded_hdw_with_cost(
                    c, p, v, gg, D, K, EPS, hb, dt))
            t = _time(fn, cam, proj, vol, g)
            if base is None:
                base = t
            print(f"({hb:>2},{dt:>2}): {t * 1e3:7.3f} ms "
                  f"({t / base:5.2f}x of first)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:150]
            print(f"({hb:>2},{dt:>2}): FAILED {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
