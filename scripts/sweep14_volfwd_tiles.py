"""Same-window interleaved A/B of the HDW volume forward's tiles.

The plane-major volume forward (round 4) sits at 89-91% of its bound
across r5 windows with the shipped (48, 8).  sweep6 ablated its stages;
this checks the tile lattice with the sweep12 protocol (compile all,
then three interleaved timing passes) now that the backward no longer
pins dt=8 (round 3 decoupled the tilings; the residual plane count
still has to divide by the backward's dt, which 16 does at KITTI's 208
declared planes).

Usage:  python scripts/sweep14_volfwd_tiles.py
"""

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
    _readback(out)


def _time_median(fn, args, n1=8, n2=32, reps=5):
    _chain(fn, args, 2)
    _chain(fn, args, n2)
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _chain(fn, args, n1)
        t1 = time.perf_counter()
        _chain(fn, args, n2)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    slopes.sort()
    return slopes[len(slopes) // 2]


def main():
    from custereomatching_tpu.ops.pallas_zncc import (
        pallas_cost_volume_banded_hdw)

    H, W, D, K = SHAPE
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((H, W), dtype=np.float32))

    tiles = [(48, 8), (48, 16), (96, 8), (32, 8), (48, 24), (96, 16)]
    cases = {}
    for hb, dt in tiles:
        cases[f"({hb},{dt})"] = (
            jax.jit(lambda c, p, hb=hb, dt=dt: pallas_cost_volume_banded_hdw(
                c, p, D, K, EPS, hb, dt, False, True)),
            (cam, proj))

    live = {}
    for name, (fn, args) in cases.items():
        try:
            _chain(fn, args, 2)
            live[name] = (fn, args)
        except Exception as e:
            print(f"{name:>9}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    results = {name: [] for name in live}
    for _ in range(3):
        for name, (fn, args) in live.items():
            results[name].append(_time_median(fn, args))
    for name, ts in results.items():
        passes = " ".join(f"{t * 1e3:.3f}" for t in ts)
        print(f"{name:>9}: {min(ts) * 1e3:7.3f} ms  (passes: {passes})",
              flush=True)


if __name__ == "__main__":
    main()
