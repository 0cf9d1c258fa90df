"""Automated parity verification — the reference's verify.py, done right.

The reference's verification is manual: it computes the cost volume +
camera gradient along its CUDA path and its pure-torch path, then drops
into ipdb so the author can eyeball the two (reference:
examples/verify.py:154-156 — no assert anywhere).  This script formalizes
it: golden-oracle vs XLA vs Pallas forward values AND gradients under the
reference's own protocol (all-ones cotangent, verify.py:67-68) plus
random cotangents, with numeric tolerances and a nonzero exit code on
failure.

Default workload matches the reference's constants (H=330, W=422, k=15,
D=200; verify.py:10-13) on synthetic speckle data (the reference's input
PNGs are not in its repo).  Banded parity always runs; the all-pairs
[H, W, W] parity (the reference's actual output layout) is included
unless --skip-allpairs.

Usage:
  python examples/verify.py                # reference-sized workload
  python examples/verify.py --height 64 --width 96 --disparities 16 -k 9
  python examples/verify.py --pair pair.npz  # your own data
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu even when the interpreter pre-registered a
# hardware platform via jax.config at startup (sitecustomize).
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from custereomatching_tpu.data import load_stereo_pair_npy, make_stereo_pair
from custereomatching_tpu.ops import (
    stereo_matching,
    stereo_matching_pallas,
)
from custereomatching_tpu.ops.golden import (
    zncc_camera_grad,
    zncc_cost_volume,
)
from custereomatching_tpu.utils import Timer


def check(name: str, got, want, rtol: float, atol: float) -> bool:
    got, want = np.asarray(got), np.asarray(want)
    err = np.abs(got - want)
    tol = atol + rtol * np.abs(want)
    ok = bool((err <= tol).all())
    print(f"  {'PASS' if ok else 'FAIL'}  {name}: max_abs_err="
          f"{err.max():.3e} (rtol={rtol:g}, atol={atol:g})")
    return ok


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--height", type=int, default=330)   # verify.py:10
    ap.add_argument("--width", type=int, default=422)
    ap.add_argument("--disparities", "-D", type=int, default=200)
    ap.add_argument("--kernel-size", "-k", type=int, default=15)
    ap.add_argument("--pair", type=str, default=None,
                    help=".npz/.npy stereo pair instead of synthetic data")
    ap.add_argument("--skip-allpairs", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="run Pallas kernels in interpreter mode (CPU)")
    args = ap.parse_args()

    H, W, D, K = args.height, args.width, args.disparities, args.kernel_size
    if args.pair:
        cam_np, proj_np = load_stereo_pair_npy(args.pair)
        H, W = cam_np.shape
    else:
        cam_np, proj_np, _ = make_stereo_pair(
            H, W, d_min=2.0, d_max=min(D, 12.0), noise=0.01, seed=0)
    cam, proj = jnp.asarray(cam_np), jnp.asarray(proj_np)
    print(f"workload: H={H} W={W} D={D} k={K} "
          f"device={jax.devices()[0].device_kind!r}")

    ok = True

    # The patch-based golden oracle materializes [H, W, D+1, k²] in the
    # banded mode — intentionally simple, intentionally memory-hungry
    # (ops/golden.py docstring).  At reference/KITTI scale that exceeds
    # HBM, so the large-scale banded oracle is the XLA moments path,
    # which is itself pinned against the golden oracle at small scale
    # (here and in tests/).
    golden_banded = H * W * (D + 1) * K * K * 4 < 2_000_000_000
    oracle_name = "golden" if golden_banded else "xla (golden-pinned)"

    # ---- banded mode ----------------------------------------------------
    print("banded forward:")
    with Timer("  xla fwd    {:.3f}s"):
        cv_xla = jax.block_until_ready(stereo_matching(cam, proj, D, K))
    with Timer("  pallas fwd {:.3f}s"):
        cv_pl = jax.block_until_ready(stereo_matching_pallas(
            cam, proj, D, K, 1e-8, args.interpret))
    if golden_banded:
        with Timer("  golden fwd {:.3f}s"):
            cv_ref = jax.block_until_ready(zncc_cost_volume(cam, proj, D, K))
        ok &= check("xla vs golden", cv_xla, cv_ref, 1e-4, 1e-5)
    else:
        cv_ref = cv_xla
    ok &= check(f"pallas vs {oracle_name}", cv_pl, cv_ref, 1e-4, 1e-5)

    print("banded backward (all-ones cotangent, reference protocol):")
    g_xla = jax.grad(lambda c: jnp.sum(stereo_matching(c, proj, D, K)))(cam)
    g_pl = jax.grad(lambda c: jnp.sum(stereo_matching_pallas(
        c, proj, D, K, 1e-8, args.interpret)))(cam)
    if golden_banded:
        g_ref = zncc_camera_grad(cam, proj, jnp.ones_like(cv_ref), D, K)
        scale = float(jnp.abs(g_ref).max())
        ok &= check("xla grad vs golden", g_xla / scale, g_ref / scale,
                    1e-4, 5e-6)
    else:
        g_ref = g_xla
        scale = float(jnp.abs(g_ref).max())
    ok &= check(f"pallas grad vs {oracle_name}", g_pl / scale,
                g_ref / scale, 1e-4, 5e-6)

    print("banded backward (random cotangent):")
    rng = np.random.default_rng(7)
    gr = jnp.asarray(rng.standard_normal(cv_ref.shape).astype(np.float32))
    if golden_banded:
        g_ref = zncc_camera_grad(cam, proj, gr, D, K)
    else:
        g_ref = jax.grad(lambda c: jnp.sum(
            stereo_matching(c, proj, D, K) * gr))(cam)
    g_pl = jax.grad(lambda c: jnp.sum(stereo_matching_pallas(
        c, proj, D, K, 1e-8, args.interpret) * gr))(cam)
    scale = float(jnp.abs(g_ref).max())
    ok &= check(f"pallas grad vs {oracle_name}", g_pl / scale,
                g_ref / scale, 1e-4, 5e-6)

    # ---- all-pairs mode (the reference's actual [H, W, W] output) ------
    if not args.skip_allpairs:
        print("all-pairs forward + backward (reference layout [H, W, W]):")
        del cv_xla, cv_pl, cv_ref, g_pl, g_ref, gr  # free HBM for [H, W, W]
        with Timer("  golden fwd {:.3f}s"):
            cv_gold = jax.block_until_ready(
                zncc_cost_volume(cam, proj, None, K))
        with Timer("  xla fwd    {:.3f}s"):
            cv_xla = jax.block_until_ready(
                stereo_matching(cam, proj, None, K))
        ok &= check("xla vs golden", cv_xla, cv_gold, 1e-4, 1e-5)
        del cv_xla
        from custereomatching_tpu.ops import stereo_matching_pallas_allpairs

        with Timer("  pallas fwd {:.3f}s"):
            cv_pl_ap = jax.block_until_ready(stereo_matching_pallas_allpairs(
                cam, proj, K, 1e-8, args.interpret))
        ok &= check("pallas all-pairs vs golden", cv_pl_ap, cv_gold,
                    1e-4, 1e-5)
        del cv_gold, cv_pl_ap
        g_gold = jax.block_until_ready(zncc_camera_grad(
            cam, proj, jnp.ones((H, W, W), jnp.float32), None, K))
        g_xla = jax.grad(
            lambda c: jnp.sum(stereo_matching(c, proj, None, K)))(cam)
        scale = float(jnp.abs(g_gold).max())
        ok &= check("xla grad vs golden", g_xla / scale, g_gold / scale,
                    1e-4, 5e-6)

    print("VERIFY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
