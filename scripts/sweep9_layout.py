"""Timing decision sweep: XLA permute vs the Pallas layout kernels.

The parity adapter (``stereo_matching_pallas`` / ``..._banded``) pays a
leading-axis permute between the plane-major padded volume and the
reference's ``[H, W, D+1]`` layout
(custma/src/stereo_matching_kernel.cu:200-201).  BENCH r4 measured the
XLA permute at ~2.3 ms each way at KITTI scale — 62%/77% adapter
achievement, the weakest priced path.  ``ops/pallas_layout.py`` holds
tiled DMA->relayout->DMA kernels for both directions; this sweep times
every (method, tile) candidate against the XLA path on-device and
asserts bit-exactness at the production shape, so the adapter can be
wired to the measured winner (the decision VERDICT r3 #2/#4 style:
measured, not guessed).

Run:  python scripts/sweep9_layout.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from custereomatching_tpu.ops.pallas_layout import (
    parity_to_plane_major,
    plane_major_to_parity,
)

H, W, D, K = 375, 1242, 192, 15
NDT, H_PAD, WO = 200, 384, 1280


def _readback(x):
    # Scalar fence: slice ON DEVICE, fetch one element (a full np.asarray
    # readback of a ~360 MB volume takes seconds through the tunnel).
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def _time(fn, args, n1=8, n2=32, repeats=5):
    """Paired-median slope (bench.py::_time)."""
    for _ in range(3):
        _readback(fn(*args))

    def chain(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _readback(out)
        return time.perf_counter() - t0

    chain(n2)
    slopes = sorted((chain(n2) - chain(n1)) / (n2 - n1)
                    for _ in range(repeats))
    return max(slopes[len(slopes) // 2], 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="one tile per method instead of the full lattice")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    vol = jax.random.normal(key, (NDT, H_PAD, WO), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(1), (H, W, D + 1), jnp.float32)
    vol, g = jax.device_put(vol), jax.device_put(g)

    # --- XLA references -------------------------------------------------
    @jax.jit
    def xla_fwd(v):
        return jnp.transpose(v[:D + 1, :H, :W], (1, 2, 0))

    @jax.jit
    def xla_bwd(gg):
        out = jnp.zeros((NDT, H_PAD, WO), jnp.float32)
        return lax.dynamic_update_slice(out, jnp.transpose(gg, (2, 0, 1)),
                                        (0, 0, 0))

    ref_fwd = xla_fwd(vol)
    ref_bwd = xla_bwd(g)

    t = _time(xla_fwd, (vol,))
    print(f"fwd  xla permute              : {t*1e3:7.3f} ms", flush=True)
    best_f = ("xla", None, None, t)
    t = _time(xla_bwd, (g,))
    print(f"bwd  xla zeros+dus+permute    : {t*1e3:7.3f} ms", flush=True)
    best_b = ("xla", None, None, t)

    tiles = [(16, 256)] if args.quick else [
        (8, 256), (16, 128), (16, 256), (16, 640), (24, 256),
        (32, 256), (32, 640), (48, 1280),
    ]
    for method in (("dot",) if args.quick else ("dot", "mxu", "t2d")):
        for hb, wc in tiles:
            try:
                fn = jax.jit(lambda v, hb=hb, wc=wc, m=method:
                             plane_major_to_parity(v, H, W, D, hb, wc,
                                                   False, m))
                out = fn(vol)
                err = float(jnp.max(jnp.abs(out - ref_fwd)))
                if err != 0.0:
                    print(f"fwd  pallas {method} ({hb:3d},{wc:5d}): "
                          f"MISMATCH {err:g}", flush=True)
                    continue
                t = _time(fn, (vol,))
                mark = " <-- beats xla" if t < best_f[3] else ""
                if t < best_f[3]:
                    best_f = (method, hb, wc, t)
                print(f"fwd  pallas {method} ({hb:3d},{wc:5d}): "
                      f"{t*1e3:7.3f} ms{mark}", flush=True)
            except Exception as e:
                print(f"fwd  pallas {method} ({hb:3d},{wc:5d}): FAIL "
                      f"{str(e).splitlines()[0][:110]}", flush=True)
    for method in (("dot",) if args.quick else ("dot", "mxu")):
        for hb, wc in tiles:
            try:
                fn = jax.jit(lambda gg, hb=hb, wc=wc, m=method:
                             parity_to_plane_major(gg, NDT, H_PAD, WO, D,
                                                   hb, wc, False, m))
                out = fn(g)
                err = float(jnp.max(jnp.abs(out - ref_bwd)))
                if err != 0.0:
                    print(f"bwd  pallas {method} ({hb:3d},{wc:5d}): "
                          f"MISMATCH {err:g}", flush=True)
                    continue
                t = _time(fn, (g,))
                mark = " <-- beats xla" if t < best_b[3] else ""
                if t < best_b[3]:
                    best_b = (method, hb, wc, t)
                print(f"bwd  pallas {method} ({hb:3d},{wc:5d}): "
                      f"{t*1e3:7.3f} ms{mark}", flush=True)
            except Exception as e:
                print(f"bwd  pallas {method} ({hb:3d},{wc:5d}): FAIL "
                      f"{str(e).splitlines()[0][:110]}", flush=True)

    print(f"WINNER fwd: {best_f[0]} {best_f[1:3]} {best_f[3]*1e3:.3f} ms")
    print(f"WINNER bwd: {best_b[0]} {best_b[1:3]} {best_b[3]*1e3:.3f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
