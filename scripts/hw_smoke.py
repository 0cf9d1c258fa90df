"""Hardware smoke sweep: compile + golden-check every Pallas kernel
path on the REAL device across shape classes, and record the result.

Motivation (round 3): the CPU test suite runs every kernel in Pallas
interpreter mode, which accepts programs Mosaic rejects — the fused
trainable backward was interpret-green for several commits while being
uncompilable on hardware (unaligned sublane DMA + scoped-VMEM OOM).
This sweep is the cheap guard: for each kernel path × a set of
alignment-stressing shapes it compiles ON DEVICE, runs once, and
asserts the result against the golden oracle (forward paths) or for
finiteness + XLA agreement (gradients).

Round 4 closes the round-3 gaps (VERDICT #5): the sweep now also covers
the parity-layout op (``stereo_matching_pallas``), the plain inference
pipeline entry (``pallas_stereo_pipeline``), and every NON-DEFAULT tile
the autotuner has persisted for this device (a winning tile that
compiles at probe time but mis-executes at another alignment class must
not ship uncaught), and it RECORDS its verdict as a JSON artifact
(``HWSMOKE.json`` at the repo root) which bench.py surfaces — a stale
or failing record is flagged on every benchmark run.

Shape classes stress: k whose halo p rounds to different sublane
multiples (k=19 → pa=16), H below one row tile / not a multiple of 8,
W below one lane tile / crossing a tile boundary, and D+1 hitting the
{16-aligned, 8-aligned, odd} plane-declaration cases.

Run:  python scripts/hw_smoke.py            (~10-30 min of compiles)
Exit: 0 all paths pass, 1 otherwise.
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT = os.path.join(_ROOT, "HWSMOKE.json")


def ops_digest(root: str = _ROOT) -> str:
    """SHA-256 over the kernel sources the sweep certifies.

    Recorded in the artifact so a PASS cannot outlive the code it
    tested: round 4 shipped a Mosaic-uncompilable projector backward
    under a PASS recorded 20 minutes earlier (the plane-major migration
    kept editing ops/ after the sweep ran).  bench.py recomputes this
    and flags a mismatch."""
    import hashlib

    h = hashlib.sha256()
    ops_dir = os.path.join(root, "custereomatching_tpu", "ops")
    for name in sorted(os.listdir(ops_dir)):
        if name.endswith(".py"):
            h.update(name.encode())
            with open(os.path.join(ops_dir, name), "rb") as f:
                h.update(f.read())
    return h.hexdigest()

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


def _check(records, name, shape, fn):
    t0 = time.perf_counter()
    rec = {"name": name, "shape": list(shape)}
    try:
        fn()
        rec["ok"] = True
        rec["seconds"] = round(time.perf_counter() - t0, 2)
        print(f"    {name:<28} OK   ({rec['seconds']:.1f}s)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        rec["ok"] = False
        rec["error"] = f"{type(e).__name__}: {msg}"
        print(f"    {name:<28} FAIL {rec['error'][:120]}", flush=True)
    records.append(rec)


def run_case(records, H, W, D, K):
    from custereomatching_tpu.ops import extract_disparity, golden
    from custereomatching_tpu.ops.pallas_allpairs import (
        stereo_matching_pallas_allpairs,
    )
    from custereomatching_tpu.ops.pallas_pipeline import (
        pallas_stereo_pipeline,
        stereo_pipeline_trainable,
    )
    from custereomatching_tpu.ops.pallas_zncc import (
        stereo_matching_pallas,
        stereo_matching_pallas_hdw,
    )
    from custereomatching_tpu.ops.zncc import (
        stereo_matching,
        stereo_matching_with_proj_grad,
    )

    cam, proj = _pair(H, W, seed=H * 7 + W)
    shape = (H, W, D, K)

    # Banded HDW volume op: forward vs golden, grad vs XLA autodiff path.
    def hdw():
        vol = jax.jit(lambda c, p: stereo_matching_pallas_hdw(
            c, p, D, K))(cam, proj)
        want = golden.zncc_cost_volume(cam, proj, D, K)
        # Plane-major padded volume [ndt, h_pad, wo] (round 4).
        got = np.transpose(np.asarray(vol)[:D + 1, :H, :W], (1, 2, 0))
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-5,
                                   rtol=2e-5)

    def hdw_grad():
        def loss(c):
            v = stereo_matching_pallas_hdw(c, proj, D, K)
            di = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) <= D
            hi = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) < H
            wi = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2) < W
            return jnp.sum(jnp.where(hi & di & wi, v, 0.0))
        g = jax.jit(jax.grad(loss))(cam)
        want = golden.zncc_camera_grad(cam, proj,
                                       jnp.ones((H, W, D + 1)), D, K)
        scale = float(jnp.abs(want).max()) + 1e-30
        np.testing.assert_allclose(np.asarray(g) / scale,
                                   np.asarray(want) / scale, atol=2e-5)

    # Parity-layout op [H, W, D+1] (round-4 addition): fwd vs golden,
    # all-ones-cotangent grad vs golden (the reference's protocol).
    def parity_layout():
        got = jax.jit(lambda c, p: stereo_matching_pallas(
            c, p, D, K))(cam, proj)
        want = golden.zncc_cost_volume(cam, proj, D, K)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
        g = jax.jit(jax.grad(lambda c: jnp.sum(
            stereo_matching_pallas(c, proj, D, K))))(cam)
        gw = golden.zncc_camera_grad(cam, proj, jnp.ones((H, W, D + 1)),
                                     D, K)
        scale = float(jnp.abs(gw).max()) + 1e-30
        np.testing.assert_allclose(np.asarray(g) / scale,
                                   np.asarray(gw) / scale, atol=2e-5)

    # Plain inference pipeline entry (round-4 addition): hard disparity
    # bit-equal to the XLA head, soft to fp rounding.
    def pipeline():
        maps = jax.jit(lambda c, p: pallas_stereo_pipeline(
            c, p, D, K))(cam, proj)
        ref = extract_disparity(stereo_matching(cam, proj, D, K),
                                num_disparities=D)
        np.testing.assert_array_equal(np.asarray(maps.disparity),
                                      np.asarray(ref.disparity))
        np.testing.assert_allclose(np.asarray(maps.soft_disparity),
                                   np.asarray(ref.soft_disparity),
                                   atol=1e-4, rtol=1e-4)

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

    # Layout-conversion kernels (round 4): plane-major ↔ parity must be
    # bit-exact vs the XLA permute, including the zero-cotangent padding.
    def layout():
        from custereomatching_tpu.ops.pallas_layout import (
            parity_to_plane_major,
            plane_major_to_parity,
        )
        from custereomatching_tpu.ops.pallas_zncc import (
            pallas_cost_volume_banded_hdw,
        )

        vol = jax.jit(lambda c, p: pallas_cost_volume_banded_hdw(
            c, p, D, K, 1e-8, 48, 8, False, True))(cam, proj)
        got = jax.jit(lambda v: plane_major_to_parity(
            v, H, W, D))(vol)
        want = jnp.transpose(vol[:D + 1, :H, :W], (1, 2, 0))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        ndt, h_pad, wo = vol.shape
        g = jnp.asarray(np.random.default_rng(3).random(
            (H, W, D + 1), dtype=np.float32))
        if (D + 1) % 128:
            # Mosaic cannot DMA lane-dim slices of extent D+1 unless
            # 128-aligned; the op must reject loudly at trace time
            # instead of dying in the compiler (sweep9_layout.py).
            try:
                parity_to_plane_major(g, ndt, h_pad, wo, D)
            except ValueError:
                pass
            else:
                raise AssertionError(
                    "parity_to_plane_major accepted unaligned D+1 on "
                    "the compiled path")
        else:
            got_g = jax.jit(lambda x: parity_to_plane_major(
                x, ndt, h_pad, wo, D))(g)
            want_g = jnp.zeros((ndt, h_pad, wo), jnp.float32)
            want_g = want_g.at[:D + 1, :H, :W].set(
                jnp.transpose(g, (2, 0, 1)))
            np.testing.assert_array_equal(np.asarray(got_g),
                                          np.asarray(want_g))

    # All-pairs Pallas kernel vs the golden-pinned XLA path.
    def allpairs():
        got = jax.jit(lambda c, p: stereo_matching_pallas_allpairs(
            c, p, K, 1e-8, False, "highest"))(cam, proj)
        want = jax.jit(lambda c, p: stereo_matching(
            c, p, None, K))(cam, proj)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    _check(records, "hdw volume fwd", shape, hdw)
    _check(records, "hdw volume grad", shape, hdw_grad)
    _check(records, "parity-layout op", shape, parity_layout)
    _check(records, "inference pipeline", shape, pipeline)
    _check(records, "trainable grads (both modes)", shape, trainable)
    _check(records, "both-gradients step", shape, both_grads)
    _check(records, "layout kernels", shape, layout)
    _check(records, "all-pairs kernel", shape, allpairs)


def run_autotuned_tiles(records) -> None:
    """Re-execute every NON-DEFAULT tile the autotuner persisted for this
    device, with a golden/XLA check at the persisted shape.

    The autotuner's probe only proves a tile COMPILES and is fast; a tile
    that mis-executes at another alignment class would ship uncaught
    (VERDICT r3 #5).  Entries for other devices / interpret mode are
    skipped."""
    from custereomatching_tpu.ops import extract_disparity, golden
    from custereomatching_tpu.ops import tuning
    from custereomatching_tpu.ops.pallas_pipeline import (
        _pipeline_forward,
        stereo_pipeline_trainable,
    )
    from custereomatching_tpu.ops.pallas_zncc import (
        pallas_cost_volume_banded_hdw,
    )
    from custereomatching_tpu.ops.zncc import stereo_matching

    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = "unknown"
    disk = tuning._load_disk_cache()
    n_run = 0
    for key, entry in sorted(disk.items()):
        parts = key.split("|")
        if len(parts) < 9 or parts[0] != tuning._SCHEMA or parts[1] != kind:
            continue
        kernel, h, w, D, k, interp = (parts[2], int(parts[3]),
                                      int(parts[4]), int(parts[5]),
                                      int(parts[6]), parts[7])
        if interp == "True":
            continue
        hb, dt = tuning._disk_blocks(entry)
        cam, proj = _pair(h, w, seed=h * 7 + w + 1)
        name = f"autotuned {kernel} ({hb},{dt}) @{h}x{w} D={D}"
        shape = (h, w, D, k)
        n_run += 1

        if kernel == "pipeline":
            def chk(hb=hb, dt=dt, h=h, w=w, D=D, k=k, cam=cam, proj=proj):
                maps = jax.jit(lambda c, p: _pipeline_forward(
                    c, p, D, k, 1e-8, 50.0, 0.6, hb, dt))(cam, proj)
                ref = extract_disparity(stereo_matching(cam, proj, D, k),
                                        num_disparities=D)
                np.testing.assert_array_equal(np.asarray(maps.disparity),
                                              np.asarray(ref.disparity))
                np.testing.assert_allclose(
                    np.asarray(maps.soft_disparity),
                    np.asarray(ref.soft_disparity), atol=1e-4, rtol=1e-4)
        elif kernel == "volume":
            def chk(hb=hb, dt=dt, h=h, w=w, D=D, k=k, cam=cam, proj=proj):
                vol = jax.jit(lambda c, p: pallas_cost_volume_banded_hdw(
                    c, p, D, k, 1e-8, hb, dt, False, False))(cam, proj)
                want = golden.zncc_cost_volume(cam, proj, D, k)
                np.testing.assert_allclose(
                    np.swapaxes(np.asarray(vol), 1, 2), np.asarray(want),
                    atol=2e-5, rtol=2e-5)
        elif kernel == "trainable_bwd":
            def chk(hb=hb, h=h, w=w, D=D, k=k, cam=cam, proj=proj):
                def loss(c, bb):
                    r = stereo_pipeline_trainable(c, proj, D, k, 1e-8,
                                                  50.0, 0.6, False, True,
                                                  bwd_block_rows=bb)
                    return jnp.sum(r.soft_disparity)
                g_tile = jax.jit(jax.grad(
                    lambda c: loss(c, hb)))(cam)
                g_def = jax.jit(jax.grad(lambda c: loss(c, 0)))(cam)
                scale = float(jnp.abs(g_def).max()) + 1e-30
                np.testing.assert_allclose(np.asarray(g_tile) / scale,
                                           np.asarray(g_def) / scale,
                                           atol=1e-5)
        else:
            continue
        _check(records, name, shape, chk)
    if not n_run:
        print("  (no persisted autotune winners for this device)",
              flush=True)


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if dev.platform != "tpu":
        print("NOTE: not a TPU — this sweep only means something on "
              "real hardware (interpret mode accepts what Mosaic "
              "rejects); the artifact will say so", file=sys.stderr)
    records: list = []
    for (H, W, D, K) in SHAPES:
        print(f"shape H={H} W={W} D={D} k={K}:", flush=True)
        run_case(records, H, W, D, K)
    print("autotuned tiles:", flush=True)
    run_autotuned_tiles(records)

    failed = [f"{r['name']} @ {tuple(r['shape'])}" for r in records
              if not r["ok"]]
    artifact = {
        "unix_time": int(time.time()),
        "time_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "device": dev.device_kind,
        "platform": dev.platform,
        "pass": not failed,
        "n_cases": len(records),
        "n_failed": len(failed),
        "ops_digest": ops_digest(),
        "cases": records,
    }
    try:
        with open(ARTIFACT, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"recorded {ARTIFACT}")
    except OSError as e:
        print(f"could not write {ARTIFACT}: {e}", file=sys.stderr)
    print("HW-SMOKE", "PASS" if not failed else f"FAIL: {failed}")
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
