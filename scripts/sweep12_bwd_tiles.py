"""Same-window head-to-head of backward-kernel row tiles on TPU.

The projector sweep (sweep11) found hb=96 beating the shipped hb=48 by
18% WITHIN one run, but the tunnel's window drift makes cross-run
comparisons meaningless (a later run read the same configs 60% slower).
This script measures every contender in ONE process, interleaved A/B/A
style (each config timed in two passes, first-pass-only numbers are
window-poisoned), for the three backward kernels that share the
hb-tiled band structure:

  proj48/proj96/proj128   projector-gradient kernel row tiles
  cam48/cam96/cam128      camera volume backward (with-cost) row tiles
  trainbwd48/trainbwd96   the fused train step's cost-residual backward

Usage:  python scripts/sweep12_bwd_tiles.py
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
    return out


def _time_once(fn, args, n1=6, n2=30, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _readback(_chain(fn, args, n1))
        t1 = time.perf_counter()
        _readback(_chain(fn, args, n2))
        t2 = time.perf_counter()
        slope = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
        if slope <= 0:
            continue        # relay hiccup corrupted the short chain
        best = min(best, slope)
    return best


def main():
    from custereomatching_tpu.ops.pallas_pipeline import (
        _fused_train_bwd_c_impl,
        _pipeline_forward_full,
    )
    from custereomatching_tpu.ops.pallas_zncc import (
        pallas_cost_volume_banded_hdw)
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_camera_grad_banded_hdw_with_cost,
        pallas_projector_grad_banded_hdw_with_cost,
    )

    H, W, D, K = SHAPE
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((H, W), dtype=np.float32))
    vol = jax.jit(lambda c, p: pallas_cost_volume_banded_hdw(
        c, p, D, K, EPS, 48, 8, False, True))(cam, proj)
    g = jnp.ones(vol.shape, vol.dtype)

    am, _, mask, conf, s, t, cv = _pipeline_forward_full(
        cam, proj, D, K, EPS, 50.0, 0.6, 48, 8, False, write_volume=True)
    h_pad, wo = am.shape
    gsoft = jnp.ones((h_pad, wo), cam.dtype)
    gconf = jnp.zeros((h_pad, wo), cam.dtype)

    cases = {}
    for hb in (48, 96, 128):
        cases[f"proj{hb}"] = (
            jax.jit(lambda c, p, v, gg, hb=hb:
                    pallas_projector_grad_banded_hdw_with_cost(
                        c, p, v, gg, D, K, EPS, hb, 8)),
            (cam, proj, vol, g))
        cases[f"cam{hb}"] = (
            jax.jit(lambda c, p, v, gg, hb=hb:
                    pallas_camera_grad_banded_hdw_with_cost(
                        c, p, v, gg, D, K, EPS, hb, 8)),
            (cam, proj, vol, g))
    for hb in (48, 96):
        cases[f"trainbwd{hb}"] = (
            jax.jit(lambda c, p, *r, hb=hb: _fused_train_bwd_c_impl(
                c, p, r[:7], r[7], D, K, EPS, 50.0, hb, False)),
            (cam, proj, am, mask, conf, s, t, gsoft, gconf, cv))

    # Compile + warm everything FIRST so the timed passes share a window.
    live = {}
    for name, (fn, args) in cases.items():
        try:
            _readback(_chain(fn, args, 2))
            live[name] = (fn, args)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{name:>11}: FAILED {type(e).__name__}: {msg}", flush=True)

    # Interleaved passes; report the min (window-drift resistant) and
    # the per-pass values so a drifting window is visible in the output.
    results = {name: [] for name in live}
    for _ in range(3):
        for name, (fn, args) in live.items():
            results[name].append(_time_once(fn, args))
    for name, ts in results.items():
        passes = " ".join(f"{t * 1e3:.3f}" for t in ts)
        print(f"{name:>11}: {min(ts) * 1e3:7.3f} ms  (passes: {passes})",
              flush=True)


if __name__ == "__main__":
    main()
