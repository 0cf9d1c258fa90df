"""Hardware smoke sweep: compile + golden-check every Pallas kernel
path on the REAL device across shape classes.

Motivation (round 3): the CPU test suite runs every kernel in Pallas
interpreter mode, which accepts programs Mosaic rejects — the fused
trainable backward was interpret-green for several commits while being
uncompilable on hardware (unaligned sublane DMA + scoped-VMEM OOM).
This sweep is the cheap guard: for each kernel path × a set of
alignment-stressing shapes it compiles ON DEVICE, runs once, and
asserts the result against the golden oracle (forward paths) or for
finiteness + XLA agreement (gradients).

Shape classes stress: k whose halo p rounds to different sublane
multiples (k=19 → pa=16), H below one row tile / not a multiple of 8,
W below one lane tile / crossing a tile boundary, and D+1 hitting the
{16-aligned, 8-aligned, odd} plane-declaration cases.

Run:  python scripts/hw_smoke.py            (~10-25 min of compiles)
Exit: 0 all paths pass, 1 otherwise.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [
    # (H, W, D, k)     — stress note
    (64, 200, 24, 15),   # baseline small
    (37, 130, 16, 15),   # H odd, W just over a lane tile
    (24, 96, 10, 5),     # W below one lane tile
    (80, 256, 31, 9),    # D+1 = 32 (16-aligned declaration)
    (48, 160, 23, 19),   # k=19: p=9 → pa=16 (second alignment class)
    (16, 64, 7, 3),      # tiny everything, D+1 = 8
]


def _pair(H, W, seed):
    rng = np.random.default_rng(seed)
    proj = rng.uniform(size=(H, W)).astype(np.float32)
    cam = np.zeros_like(proj)
    d = min(max(D_SHIFT, 0), W - 1)
    cam[:, d:] = proj[:, : W - d] if d else proj
    # Mix in noise so gradients are non-degenerate.
    cam = 0.8 * cam + 0.2 * rng.uniform(size=(H, W)).astype(np.float32)
    return jnp.asarray(cam), jnp.asarray(proj)


D_SHIFT = 3


def _finite(x):
    return bool(np.isfinite(np.asarray(x)).all())


def run_case(H, W, D, K):
    from custereomatching_tpu.ops import golden
    from custereomatching_tpu.ops.pallas_allpairs import (
        stereo_matching_pallas_allpairs,
    )
    from custereomatching_tpu.ops.pallas_pipeline import (
        stereo_pipeline_trainable,
    )
    from custereomatching_tpu.ops.pallas_zncc import (
        stereo_matching_pallas_hdw,
    )
    from custereomatching_tpu.ops.zncc import (
        stereo_matching,
        stereo_matching_with_proj_grad,
    )

    cam, proj = _pair(H, W, seed=H * 7 + W)
    failures = []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            fn()
            print(f"    {name:<28} OK   ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:110]
            print(f"    {name:<28} FAIL {type(e).__name__}: {msg}",
                  flush=True)
            failures.append(name)

    # Banded HDW volume op: forward vs golden, grad vs XLA autodiff path.
    def hdw():
        vol = jax.jit(lambda c, p: stereo_matching_pallas_hdw(
            c, p, D, K))(cam, proj)
        want = golden.zncc_cost_volume(cam, proj, D, K)
        got = np.swapaxes(np.asarray(vol)[:H, :D + 1, :W], 1, 2)
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-5,
                                   rtol=2e-5)

    def hdw_grad():
        def loss(c):
            v = stereo_matching_pallas_hdw(c, proj, D, K)
            hi = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) < H
            di = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) <= D
            wi = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2) < W
            return jnp.sum(jnp.where(hi & di & wi, v, 0.0))
        g = jax.jit(jax.grad(loss))(cam)
        want = golden.zncc_camera_grad(cam, proj,
                                       jnp.ones((H, W, D + 1)), D, K)
        scale = float(jnp.abs(want).max()) + 1e-30
        np.testing.assert_allclose(np.asarray(g) / scale,
                                   np.asarray(want) / scale, atol=2e-5)

    # Fused trainable pipeline: both residual modes, grad finite + equal.
    def trainable():
        def loss(c, save):
            r = stereo_pipeline_trainable(c, proj, D, K, 1e-8, 50.0, 0.6,
                                          False, save)
            return jnp.sum(r.soft_disparity) + jnp.sum(r.confidence)
        g_v = jax.jit(jax.grad(lambda c: loss(c, True)))(cam)
        g_f = jax.jit(jax.grad(lambda c: loss(c, False)))(cam)
        assert _finite(g_v) and _finite(g_f)
        scale = float(jnp.abs(g_v).max()) + 1e-30
        np.testing.assert_allclose(np.asarray(g_f) / scale,
                                   np.asarray(g_v) / scale, atol=1e-4)

    # Both-gradients path (camera + projector closed-form kernels).
    def both_grads():
        def loss(c, p):
            return jnp.sum(stereo_matching_with_proj_grad(c, p, D, K))
        gc, gp = jax.jit(jax.grad(loss, (0, 1)))(cam, proj)
        assert _finite(gc) and _finite(gp)
        assert float(jnp.abs(gp).max()) > 0

    # All-pairs Pallas kernel vs the golden-pinned XLA path.
    def allpairs():
        got = jax.jit(lambda c, p: stereo_matching_pallas_allpairs(
            c, p, K, 1e-8, False, "highest"))(cam, proj)
        want = jax.jit(lambda c, p: stereo_matching(
            c, p, None, K))(cam, proj)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    check("hdw volume fwd", hdw)
    check("hdw volume grad", hdw_grad)
    check("trainable grads (both modes)", trainable)
    check("both-gradients step", both_grads)
    check("all-pairs kernel", allpairs)
    return failures


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if dev.platform != "tpu":
        print("NOTE: not a TPU — this sweep only means something on "
              "real hardware (interpret mode accepts what Mosaic "
              "rejects)", file=sys.stderr)
    failed = []
    for (H, W, D, K) in SHAPES:
        print(f"shape H={H} W={W} D={D} k={K}:", flush=True)
        failed += [f"{n} @ {(H, W, D, K)}" for n in run_case(H, W, D, K)]
    print("HW-SMOKE", "PASS" if not failed else f"FAIL: {failed}")
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
