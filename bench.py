"""Benchmark harness: KITTI-scale ZNCC cost volume on one chip.

Workload = BASELINE.json config 3: a full-resolution KITTI stereo pair
(1242×375) with 192 disparities, banded cost volume ``[375, 1242, 193]``,
kernel_size 15 — the production configuration of the framework.  The
reference publishes no numbers (BASELINE.md), so the comparison point is
the derived speed-of-light bound: the banded volume is ~0.346 GB of
mandatory HBM writes per frame, giving an upper bound of
``HBM_bandwidth / bytes_per_frame`` frames/s; ``vs_baseline`` reports the
measured fraction of that bound (1.0 == HBM-bandwidth-bound, i.e.
speed of light).

Timing uses ``jax.block_until_ready`` (the reference's Timer never
synchronizes the device and therefore measured launch overhead only —
reference: custma/utils.py + examples/verify.py:65-68).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
Extra detail (bwd timing, device, bound) goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from custereomatching_tpu import StereoConfig
from custereomatching_tpu.models import StereoMatcher

H, W, D, K = 375, 1242, 192, 15

# Peak HBM bandwidth (bytes/s) by device kind, for the speed-of-light
# denominator.  Unknown kinds fall back to v5e.
_HBM_BW = {
    "TPU v4": 1.2e12,
    "TPU v5 lite": 8.19e11,   # v5e
    "TPU v5": 2.765e12,       # v5p
    "TPU v6 lite": 1.64e12,   # v6e / Trillium
}


def _device_bandwidth() -> float:
    kind = jax.devices()[0].device_kind
    for name, bw in _HBM_BW.items():
        if kind.startswith(name):
            return bw
    return _HBM_BW["TPU v5 lite"]


def _readback(x) -> float:
    """Force completion by reading one element back to the host.

    ``block_until_ready`` alone is not trusted here: on relayed/async
    platforms it can return before execution finishes; a host readback of
    the result cannot.
    """
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


def _chain(fn, args, n: int, repeats: int) -> float:
    """Best total wall time of ``n`` back-to-back dispatches + one fence."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _readback(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _time(fn, *args, n1: int = 10, n2: int = 50, repeats: int = 5,
          warmup: int = 3) -> float:
    """Steady-state seconds per call, measured as a slope.

    Device execution is in-order; a chain of n dispatches fenced by one
    host readback costs ``fixed + n·t`` where ``fixed`` is the
    host↔device roundtrip (tens of ms through the tunnel on this
    platform).  Timing two chain lengths and taking the slope cancels
    ``fixed`` exactly — this measures pure device throughput, the number
    that governs a production stream of frames.

    The two chains of each repetition are timed back-to-back and the
    MEDIAN of the per-pair slopes is reported: minimizing the short and
    long chains independently (best-of-N each) deflates the slope — it
    once reported a rate above the compute bound — while a paired median
    resists noise in both directions.
    """
    for _ in range(warmup):
        _readback(fn(*args))
    # Throwaway chain at the larger length: the first chain at a new
    # length grows allocator pools for the in-flight buffers, which
    # would otherwise inflate t1 and deflate the slope.
    _chain(fn, args, n2, 1)
    slopes = sorted(
        (_chain(fn, args, n2, 1) - _chain(fn, args, n1, 1)) / (n2 - n1)
        for _ in range(repeats))
    return max(slopes[len(slopes) // 2], 1e-9)


def _epe_parity_check(model) -> str:
    """EPE of the Pallas pipeline vs ground truth AND vs the XLA
    (golden-pinned) path on a synthetic KITTI-scale scene — the parity
    clause of the BASELINE metric."""
    from custereomatching_tpu.data import make_stereo_pair
    from custereomatching_tpu.ops import extract_disparity
    from custereomatching_tpu.utils import disparity_metrics

    cam, proj, truth = make_stereo_pair(H, W, d_min=4.0, d_max=40.0,
                                        noise=0.01, seed=0)
    cam, proj = jnp.asarray(cam), jnp.asarray(proj)
    maps = model.disparity_maps(cam[None], proj[None])
    m = disparity_metrics(maps.soft_disparity[0], jnp.asarray(truth),
                          maps.mask[0])
    from custereomatching_tpu.ops import stereo_matching

    ref = extract_disparity(stereo_matching(cam, proj, D, K),
                            num_disparities=D)
    dvs = float(jnp.max(jnp.abs(maps.disparity[0] - ref.disparity)))
    return (f"EPE vs truth {m['epe']:.4f} px (bad3 {m['bad3']:.4f}, "
            f"coverage {m['coverage']:.4f}); hard-disparity max diff vs "
            f"XLA path {dvs:g}")


def _secondary_reports(model, backend: str, fps: float) -> None:
    """Reference-workload timing, pyramid accuracy, serving latency."""
    from custereomatching_tpu.data import make_stereo_pair
    from custereomatching_tpu.ops import stereo_matching
    from custereomatching_tpu.utils import disparity_metrics

    # The reference's OWN verify workload (330x422, D=200 ignored →
    # all-pairs [H, W, W], k=15; /root/reference/examples/verify.py:10-13)
    # through the MXU einsum path — BASELINE configs 1-2.
    Hr, Wr = 330, 422
    rng = np.random.default_rng(1)
    cam_r = jnp.asarray(rng.random((Hr, Wr), dtype=np.float32))
    proj_r = jnp.asarray(rng.random((Hr, Wr), dtype=np.float32))
    if backend.startswith("pallas"):
        from custereomatching_tpu.ops import stereo_matching_pallas_allpairs

        interp = backend == "pallas_interpret"
        ap_op = jax.jit(lambda c, p: stereo_matching_pallas_allpairs(
            c, p, K, 1e-8, interp, "highest"))
        ap_label = "Pallas/MXU im2col kernel"
    else:
        ap_op = jax.jit(lambda c, p: stereo_matching(c, p, None, K))
        ap_label = "XLA/MXU path"

    def ap_loss(c, p):
        # all-ones cotangent: the reference's backward protocol
        # (examples/verify.py:67-68).
        return jnp.sum(ap_op(c, p))

    ap_fwd_bwd = jax.jit(jax.grad(ap_loss))
    # (8, 40): the backward-alone number below is a DIFFERENCE of two
    # slopes, so each needs a chain delta well above the tunnel's noise
    # floor — at (4, 16) the 0.6 ms backward leg rode on ~7 ms of delta
    # and read bimodally (0.58 vs 0.70 ms across BENCH r4/r5 runs).
    t_ap = _time(ap_op, cam_r, proj_r, n1=8, n2=40)
    t_ap_fb = _time(ap_fwd_bwd, cam_r, proj_r, n1=8, n2=40)
    ap_bound = ""
    if backend.startswith("pallas"):
        try:
            from custereomatching_tpu.utils import (
                allpairs_backward_cost,
                allpairs_forward_cost,
                kernel_bound,
                measure_vpu_rates,
            )

            r = measure_vpu_rates(measure_if_missing=False)
            if r is not None and r.get("mxuhi"):
                b = kernel_bound(allpairs_forward_cost(Hr, Wr, K),
                                 r)["bound_s"]
                ap_bound = (f"; fwd bound {b*1e3:.2f} ms -> "
                            f"{b/t_ap*100:.1f}% achieved")
                # Backward alone = fwd+bwd minus fwd; its bound is the
                # mandatory-traffic (speed-of-light) leg — the backward
                # is an XLA program, not a Pallas kernel.
                bb = kernel_bound(allpairs_backward_cost(Hr, Wr, K),
                                  r)["bound_s"]
                t_apb = max(t_ap_fb - t_ap, 1e-9)
                ap_bound += (f"; bwd {t_apb*1e3:.2f} ms vs traffic bound "
                             f"{bb*1e3:.2f} -> {bb/t_apb*100:.1f}%")
        except Exception:
            pass
    print(f"[bench] reference verify workload {Hr}x{Wr} all-pairs k={K}: "
          f"fwd {t_ap*1e3:.2f} ms ({1.0/t_ap:.1f} fps), fwd+bwd "
          f"{t_ap_fb*1e3:.2f} ms ({1.0/t_ap_fb:.1f} fps) "
          f"[{ap_label}{ap_bound}]",
          file=sys.stderr)

    # Pyramid accuracy next to its speed (approximate algorithm).
    from custereomatching_tpu.models import PyramidStereoMatcher

    cam, proj, truth = make_stereo_pair(H, W, d_min=4.0, d_max=40.0,
                                        noise=0.01, seed=0)
    cam, proj = jnp.asarray(cam), jnp.asarray(proj)
    pyr = PyramidStereoMatcher(model.config)
    pm = pyr(cam[None], proj[None])
    met = disparity_metrics(pm.soft_disparity[0], jnp.asarray(truth),
                            pm.mask[0])
    print(f"[bench] pyramid accuracy: EPE {met['epe']:.4f} px, bad3 "
          f"{met['bad3']:.4f}, coverage {met['coverage']:.4f} "
          f"(approximate model; compare headline EPE above)",
          file=sys.stderr)

    # Pipeline-parallel stage op: one stage of an S-stage disparity-range
    # pipeline runs the fused kernel over (D+1)/S planes (parallel/
    # pipeline.py routes through the Pallas kernel on this backend); its
    # latency vs the full-range pipeline is the basis of the S× steady-
    # state throughput claim.
    try:
        from custereomatching_tpu.parallel.pipeline import chunk_state

        S = 4
        chunk = (D + 1) // S
        cam_pp, proj_pp = cam, proj

        def stage_op(c, p):
            # Return the FULL head state: a stage's consumer (the next
            # stage's merge) reads all four maps, and returning only one
            # lets XLA dead-code-eliminate the others' tracking work —
            # the same elision class as the adapter's old grad-of-sum
            # protocol (this report printed a nonsense 117-120%
            # "achieved" in BENCH r4/r5 until round 5 fixed it).
            st = chunk_state(c, p, 0, chunk, model.config)
            return st.m, st.am, st.s, st.t

        stage_op = jax.jit(stage_op)
        # Long chains for a sub-millisecond op: at (8, 32) the chain
        # delta is ~14 ms against the tunnel's ~50-80 ms roundtrip, and
        # one relay hiccup in the short chain deflates the slope — a
        # BENCH r5 run read 0.37 ms -> "164% achieved", a physical
        # impossibility.  (32, 160) puts ~80 ms of real work in the
        # delta.
        t_stage = _time(stage_op, cam_pp, proj_pp, n1=32, n2=160)
        stage_bound = ""
        try:
            from custereomatching_tpu.utils import (
                kernel_bound,
                measure_vpu_rates,
                stage_op_cost,
            )

            r = measure_vpu_rates(measure_if_missing=False)
            if r is not None:
                bs = kernel_bound(stage_op_cost(H, W, D, S, K), r)["bound_s"]
                suspect = (" [SUSPECT: beats bound — window drift or "
                           "relay hiccup; re-run]" if t_stage < 0.95 * bs
                           else "")
                stage_bound = (f"; bound {bs*1e3:.2f} ms -> "
                               f"{bs/t_stage*100:.1f}% achieved{suspect}")
        except Exception:
            pass
        print(f"[bench] pipeline-parallel stage op (S={S}, {chunk} planes, "
              f"fused kernel): {t_stage*1e3:.2f} ms vs full-range pipeline "
              f"{1e3/fps:.2f} ms -> steady-state pipeline speedup "
              f"~{(1.0/fps)/t_stage:.2f}x at {S} stages{stage_bound}",
              file=sys.stderr)
    except Exception as e:
        print(f"[bench] PP stage report skipped: {e}", file=sys.stderr)

    # Serving-engine bucket latency: KITTI 375x1242 pads to the 384x1280
    # bucket; measures the padded-bucket device time (the pad overhead the
    # engine pays for warm shapes).  Host↔device copies are excluded —
    # through this tunnel they'd measure the relay, not the engine.
    from custereomatching_tpu.models.engine import StereoEngine

    eng = StereoEngine(model.config, buckets=[(384, 1280)])
    eng.warmup()
    bc = jnp.zeros((1, 384, 1280), jnp.float32).at[0, :H, :W].set(cam)
    bp = jnp.zeros((1, 384, 1280), jnp.float32).at[0, :H, :W].set(proj)
    t_eng = _time(lambda c, p: eng._fn(c, p).soft_disparity, bc, bp,
                  n1=8, n2=40)
    print(f"[bench] serving engine bucket 384x1280 (warm, device-side): "
          f"{t_eng*1e3:.2f} ms/frame ({1.0/t_eng:.1f} fps); bucket-pad "
          f"overhead vs raw pipeline {(t_eng*fps-1)*100:+.1f}%",
          file=sys.stderr)


def _e2e_report(model) -> None:
    """End-to-end throughput WITH host decode: disk PNG → native
    prefetching loader → host→device feed → fused pipeline → maps.

    Every other number in this bench is device-kernel-only; this is the
    production frames/s a host-fed stream actually sustains.  The legs
    are reported separately so the binding resource is explicit —
    through the axon debug tunnel the host→device feed pays a relayed
    copy that a production PCIe/ICI host never would, so the e2e number
    here is a LOWER bound on a real deployment."""
    import shutil
    import tempfile

    from custereomatching_tpu import native

    if not native.native_available():
        print("[bench] e2e report skipped (native loader unavailable)",
              file=sys.stderr)
        return
    from PIL import Image

    from custereomatching_tpu.data import make_stereo_pair

    n_frames = 24
    cam, proj, _ = make_stereo_pair(H, W, d_min=4.0, d_max=40.0,
                                    noise=0.01, seed=1)
    base = (np.clip(cam, 0.0, 1.0) * 255).round().astype(np.uint8)
    rng = np.random.default_rng(5)
    tmp = tempfile.mkdtemp(prefix="custereo_e2e_")
    try:
        paths = []
        for f in range(n_frames):
            img = np.clip(base.astype(np.int16)
                          + rng.integers(-2, 3, size=base.shape),
                          0, 255).astype(np.uint8)
            p = os.path.join(tmp, f"f{f:03d}.png")
            Image.fromarray(img).save(p)
            paths.append(p)
        proj_d = jnp.asarray(proj)

        # Host leg: decode-only rate through the prefetching loader.
        t0 = time.perf_counter()
        with native.FrameLoader(paths) as frames:
            n = sum(1 for _ in frames)
        t_dec = (time.perf_counter() - t0) / n

        pipe = jax.jit(lambda c, p:
                       model.disparity_maps(c[None], p[None]).soft_disparity)
        warm = pipe(jnp.asarray(base.astype(np.float32) / 255.0), proj_d)
        _readback(warm)

        # E2E: decode of frame n+1 overlaps device compute of frame n;
        # one fence at stream end.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            with native.FrameLoader(paths) as frames:
                for cam_f in frames:
                    out = pipe(jnp.asarray(cam_f), proj_d)
            _readback(out)
            best = min(best, (time.perf_counter() - t0) / len(paths))
        feed = max(best - max(t_dec, 0.0), 0.0)
        ncpu = os.cpu_count() or 1
        print(f"[bench] e2e (disk PNG decode -> device -> maps): "
              f"{best*1e3:.2f} ms/frame ({1.0/best:.1f} fps); legs: "
              f"native decode pool {t_dec*1e3:.2f} ms/frame "
              f"({1.0/max(t_dec,1e-9):.0f} fps on {ncpu} host core(s) — "
              f"the pool scales with cores), device pipeline ~2.1 ms; "
              f"residual (host feed through the debug tunnel) "
              f"~{feed*1e3:.2f} ms/frame — production PCIe hosts do not "
              f"pay this relay",
              file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _projector_bwd_report(camera, projector, rates) -> None:
    """Measure + price the projector-gradient kernel (the backward half
    the reference never implemented) and the both-gradients step."""
    from custereomatching_tpu.ops.pallas_zncc import (
        stereo_matching_pallas_hdw)
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_projector_grad_banded_hdw_with_cost)
    from custereomatching_tpu.utils import (
        kernel_bound,
        projector_backward_cost,
    )

    vol = jax.jit(lambda c, p: stereo_matching_pallas_hdw(
        c, p, D, K))(camera, projector)
    di = jax.lax.broadcasted_iota(jnp.int32, vol.shape, 0) <= D
    hi = jax.lax.broadcasted_iota(jnp.int32, vol.shape, 1) < H
    wi = jax.lax.broadcasted_iota(jnp.int32, vol.shape, 2) < W
    ones = jnp.where(hi & di & wi, 1.0, 0.0).astype(vol.dtype)
    vol = jnp.where(hi & di & wi, vol, 0.0)   # scrub unwritten planes

    fn = jax.jit(lambda c, p, v, g:
                 pallas_projector_grad_banded_hdw_with_cost(
                     c, p, v, g, D, K))
    t_pb = _time(fn, camera, projector, vol, ones, n1=4, n2=16)

    def both(c, p):
        def loss(cc, pp):
            v = stereo_matching_pallas_hdw(cc, pp, D, K,
                                           grad_projector=True)
            return jnp.sum(jnp.where(hi & di & wi, v, 0.0))
        return jax.grad(loss, argnums=(0, 1))(c, p)

    t_both = _time(jax.jit(both), camera, projector, n1=4, n2=12)
    b_pb = kernel_bound(projector_backward_cost(H, W, D, K),
                        rates)["bound_s"]
    print(f"[bench] projector-grad kernel (reference's None): "
          f"{t_pb*1e3:.2f} ms, bound {b_pb*1e3:.2f} ms -> "
          f"{b_pb/t_pb*100:.1f}% achieved; both-gradients step "
          f"{t_both*1e3:.2f} ms ({1.0/t_both:.1f} steps/s)",
          file=sys.stderr)


def _preflight(attempts: int = 2, wait_s: float = 60.0) -> None:
    """Fail fast when the device is unreachable or degraded.

    The tunneled TPU can hang outright (BASELINE.md): a bench run started
    in that state would block at the first dispatch and the round would
    record nothing intelligible.  Probe in a SUBPROCESS (the hang lives
    in backend init, which cannot be timed out in-process), retry once —
    the tunnel flaps — then exit 2 with a clear stderr message and no
    JSON line, so a harness never records a garbage headline.
    """
    import os
    import subprocess

    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "device_probe.py")
    if not os.path.exists(probe):
        return
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, probe], timeout=240,
                capture_output=True, text=True)
            if r.returncode == 0:
                return
            reason = (r.stdout + r.stderr).strip().splitlines()[-1:]
            reason = reason[0] if reason else "probe failed"
        except subprocess.TimeoutExpired:
            reason = "device probe hung (tunnel unresponsive)"
        print(f"bench preflight attempt {i + 1}/{attempts}: {reason}",
              file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(wait_s)
    print("bench: device unreachable or degraded; refusing to emit "
          "numbers from a bad window", file=sys.stderr, flush=True)
    raise SystemExit(2)


def _smoke_status() -> None:
    """Surface the last recorded hardware-smoke verdict (HWSMOKE.json,
    written by scripts/hw_smoke.py).  The CPU suite cannot catch
    Mosaic-rejects-what-interpret-accepts failures; a benchmark of
    kernels whose last on-device smoke is missing, failing, or stale is
    flagged so the number is never read as "all paths verified"."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "HWSMOKE.json")
    try:
        with open(path) as f:
            rec = json.load(f)
    except Exception:
        print("[bench] WARNING: no recorded hardware smoke (HWSMOKE.json "
              "missing) — run scripts/hw_smoke.py", file=sys.stderr)
        return
    age_d = (time.time() - rec.get("unix_time", 0)) / 86400.0
    kind = jax.devices()[0].device_kind
    issues = []
    if not rec.get("pass"):
        issues.append(f"last smoke FAILED ({rec.get('n_failed')} cases)")
    if rec.get("device") != kind:
        issues.append(f"recorded on {rec.get('device')!r}, benching "
                      f"{kind!r}")
    if age_d > 14:
        issues.append(f"stale ({age_d:.0f} days old)")
    # A PASS must not outlive the kernel sources it tested (round 4: a
    # Mosaic-uncompilable projector backward shipped under a PASS
    # recorded minutes before the code kept changing).
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from hw_smoke import ops_digest

        if rec.get("ops_digest") and rec["ops_digest"] != ops_digest():
            issues.append("kernel sources (ops/) changed since the "
                          "recorded sweep")
    except Exception:
        pass
    if issues:
        print(f"[bench] WARNING: hardware smoke record: "
              f"{'; '.join(issues)} — re-run scripts/hw_smoke.py",
              file=sys.stderr)
    else:
        print(f"[bench] hw-smoke: PASS recorded {rec.get('time_utc')} on "
              f"{rec.get('device')} ({rec.get('n_cases')} cases)",
              file=sys.stderr)


def main() -> None:
    _preflight()
    _smoke_status()
    rng = np.random.default_rng(0)
    camera = jnp.asarray(rng.random((H, W), dtype=np.float32))
    projector = jnp.asarray(rng.random((H, W), dtype=np.float32))

    model = StereoMatcher(StereoConfig(kernel_size=K, num_disparities=D))
    backend = model.config.resolved_backend()

    # Headline: the full fused pipeline (pair → disparity maps) — what a
    # user of the reference's example pipeline actually runs per frame.
    pipeline = jax.jit(
        lambda c, p: model.disparity_maps(c[None], p[None]).soft_disparity)
    # Volume op (reference-parity surface) forward and forward+backward.
    fwd = jax.jit(model.cost_volume_single)

    def fwd_bwd(cam, proj):
        # The reference's protocol: the [H, W, D+1] cost volume is a
        # REAL output (verify.py reads it), then backward with an
        # all-ones cotangent (examples/verify.py:64-68).  Returning the
        # cost alongside the gradient matters: a grad-of-sum protocol
        # lets XLA elide the adapter's forward permute entirely
        # (sum∘transpose = sum — sweep10 measured 6.3 vs 8.4 ms, which
        # is how BENCH r4 printed a nonsense 112% achieved).
        cost, pullback = jax.vjp(
            lambda c: model.cost_volume_single(c, proj), cam)
        return cost, pullback(jnp.ones_like(cost))[0]

    fwd_bwd = jax.jit(fwd_bwd)

    # Fused trainable step: the production training configuration.
    target = jnp.zeros_like(camera)

    def train_step(cam, proj, tgt):
        def loss(c):
            maps = model.trainable_disparity_maps(c[None], proj[None])
            return jnp.mean((maps.soft_disparity[0] - tgt) ** 2)
        return jax.value_and_grad(loss)(cam)

    train_step = jax.jit(train_step)

    # Batched video throughput (BASELINE config 4): frames stream through
    # the fused kernel back-to-back; reports per-frame rate at B=4.
    B = 4
    cam_b = jnp.stack([camera] * B)
    proj_b = jnp.stack([projector] * B)
    batched = jax.jit(
        lambda c, p: model.disparity_maps(c, p).soft_disparity)

    # Pyramid model family (coarse-to-fine; approximate algorithm, so it
    # is reported but is NOT the headline parity metric).
    from custereomatching_tpu.models import PyramidStereoMatcher

    pyr_model = PyramidStereoMatcher(model.config)
    pyramid = jax.jit(
        lambda c, p: pyr_model(c[None], p[None]).soft_disparity)

    t_pipe = _time(pipeline, camera, projector)
    fps = 1.0 / t_pipe

    # Emit the headline JSON line FIRST so a harness timeout during the
    # secondary measurements cannot lose it.  The bound is the
    # CALIBRATED op-level model when per-class VPU rates are available
    # (measured microbenchmarks, cached in vpu_rates.json — see
    # utils/kernel_model.py and BASELINE.md); datasheet fallback
    # otherwise.
    rates = None
    try:
        from custereomatching_tpu.utils import (
            fused_forward_cost,
            kernel_bound,
            measure_vpu_rates,
        )

        rates = measure_vpu_rates(measure_if_missing=False)
        if rates is not None:
            bound_fps = kernel_bound(fused_forward_cost(H, W, D, K, 32, 40),
                                     rates)["bound_fps"]
    except Exception:
        rates = None
    if rates is None:
        try:
            from custereomatching_tpu.utils import zncc_roofline

            bound_fps = zncc_roofline(H, W, D, K,
                                      materialize_volume=False)["bound_fps"]
        except Exception:
            bound_fps = _device_bandwidth() / (H * W * (D + 1) * 4)
    print(json.dumps({
        "metric": "kitti_stereo_pipeline_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / bound_fps, 4),
    }), flush=True)

    # Production-layout volume op (padded HDW, no parity transpose): the
    # training path's actual volume surface; the parity [H, W, D+1] layout
    # is an explicitly-priced adapter on top (docs/PARITY.md).
    from custereomatching_tpu.ops.pallas_zncc import (
        stereo_matching_pallas_hdw)
    from custereomatching_tpu.ops.disparity import extract_disparity_hdw

    use_pallas = backend.startswith("pallas")
    if use_pallas:
        # The inference volume surface: the raw padded-HDW kernel at its
        # default (VMEM-gated, dt=16 at KITTI) tiles.  The DIFFERENTIABLE
        # op pins dt=8 — its padded output doubles as the backward's
        # residual/cotangent layout and the protocol measured faster
        # that way (scripts/sweep15_vjp_dt.py) — so the fwd and fwd+bwd
        # lines below legitimately run different forward tiles.
        from custereomatching_tpu.ops.pallas_zncc import (
            EPSILON as _EPS,
            pallas_cost_volume_banded_hdw,
        )

        fwd_hdw = jax.jit(
            lambda c, p: pallas_cost_volume_banded_hdw(
                c, p, D, K, _EPS, 48, None, False, True))

        def fwd_bwd_hdw(cam, proj):
            # The reference's protocol: backward with an all-ones
            # cotangent (examples/verify.py:67-68) — here ones on the
            # valid extent, zeros on the padding (the zero-cotangent
            # contract), built as a constant so no volume-sized slice
            # sits on the timed path.
            out, pullback = jax.vjp(
                lambda c: stereo_matching_pallas_hdw(c, proj, D, K), cam)
            # Plane-major padded volume [ndt, h_pad, wo] (round 4).
            di = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0) <= D
            hi = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) < H
            wi = jax.lax.broadcasted_iota(jnp.int32, out.shape, 2) < W
            ones = jnp.where(hi & di & wi, 1.0, 0.0).astype(out.dtype)
            return pullback(ones)[0]

        fwd_bwd_hdw = jax.jit(fwd_bwd_hdw)

    t_batch = _time(batched, cam_b, proj_b) / B
    t_pyr = _time(pyramid, camera, projector)
    t_train = _time(train_step, camera, projector, target)
    t_fwd = _time(fwd, camera, projector)
    t_fwdbwd = _time(fwd_bwd, camera, projector)
    t_fwd_h = _time(fwd_hdw, camera, projector) if use_pallas else t_fwd
    t_fwdbwd_h = (_time(fwd_bwd_hdw, camera, projector)
                  if use_pallas else t_fwdbwd)

    volume_bytes = H * W * (D + 1) * 4
    image_bytes = 2 * H * W * 4
    sol_fps = _device_bandwidth() / (volume_bytes + image_bytes)

    kind = jax.devices()[0].device_kind
    print(
        f"[bench] device={kind!r} backend={backend} kitti {H}x{W} D={D} k={K}: "
        f"fused pipeline {t_pipe*1e3:.2f} ms ({fps:.1f} fps), "
        f"batched B={B} {t_batch*1e3:.2f} ms/frame ({1.0/t_batch:.1f} fps), "
        f"pyramid {t_pyr*1e3:.2f} ms ({1.0/t_pyr:.1f} fps), "
        f"fused train step {t_train*1e3:.2f} ms ({1.0/t_train:.1f} steps/s), "
        f"volume fwd {t_fwd_h*1e3:.2f} ms ({1.0/t_fwd_h:.1f} fps) "
        f"/ fwd+bwd {t_fwdbwd_h*1e3:.2f} ms ({1.0/t_fwdbwd_h:.1f} fps), "
        f"parity-layout adapter fwd {t_fwd*1e3:.2f} ms "
        f"/ fwd+bwd {t_fwdbwd*1e3:.2f} ms, "
        f"volume-write speed-of-light {sol_fps:.1f} fps "
        f"({volume_bytes/1e9:.3f} GB/frame)",
        file=sys.stderr,
    )
    try:
        _secondary_reports(model, backend, fps)
    except Exception as e:  # secondary reporting must never break the bench
        print(f"[bench] secondary reports skipped: {e}", file=sys.stderr)
    try:
        _e2e_report(model)
    except Exception as e:
        print(f"[bench] e2e report skipped: {e}", file=sys.stderr)
    try:
        print(f"[bench] parity: {_epe_parity_check(model)}", file=sys.stderr)
    except Exception as e:  # parity report must never break the bench
        print(f"[bench] parity check skipped: {e}", file=sys.stderr)
    try:
        if rates is not None:
            from custereomatching_tpu.utils import (
                fused_backward_c_cost,
                fused_forward_cost,
                kernel_bound,
                volume_backward_cost,
                volume_forward_cost,
            )

            b_fwd = kernel_bound(fused_forward_cost(H, W, D, K, 32, 40),
                                 rates)["bound_s"]
            b_tfwd = kernel_bound(
                fused_forward_cost(H, W, D, K, 48, 8, write_volume=True),
                rates)["bound_s"]
            b_tbwd = kernel_bound(fused_backward_c_cost(H, W, D, K, 48),
                                  rates)["bound_s"]
            # Two volume-forward bounds since round 5 (sweep14/15): the
            # inference surface ships the VMEM-gated tiles (dt=16 at
            # KITTI, 1.87 vs 1.97 ms) and prices at them; the trainable
            # hdw op pins (48, 8) — its padded output doubles as the
            # backward's residual/cotangent layout, where dt=16's extra
            # planes cost more than the forward saves.
            from custereomatching_tpu.ops.pallas_zncc import (
                _vjp_fwd_blocks)

            hbf, dtf = _vjp_fwd_blocks(H, W, D, K)
            b_vfwd = kernel_bound(volume_forward_cost(H, W, D, K, hbf, dtf),
                                  rates)["bound_s"]
            b_vfwd8 = kernel_bound(volume_forward_cost(H, W, D, K, 48, 8),
                                   rates)["bound_s"]
            # hb=96 since round 5: the camera with-cost backward measured
            # 2.55 vs 2.72 ms at hb=48 (sweep12, interleaved same-window,
            # reproduced twice) and sits AT its recomputed bound.
            b_vbwd = kernel_bound(
                volume_backward_cost(H, W, D, K, 96, 8, True),
                rates)["bound_s"]
            b_train = b_tfwd + b_tbwd
            # Parity-layout adapter: the volume kernel + the explicitly
            # priced minor-dims transpose (measured xla_t3d rate — the
            # pre-round-4 runs fell back to datasheet bandwidth, ~2.6x
            # optimistic, which is where the "62% achieved, weakest
            # path" rows in BENCH r3/r4 came from).  The backward runs
            # the with-cost direct kernel on the forward's saved padded
            # volume (since round 4's residual-strategy switch — 7.51 vs
            # 9.12 ms measured); its cotangent leg prices the restage of
            # the parity-layout cotangent into the padded plane-major
            # kernel layout (zeros + DUS of the transpose) at the
            # measured ``xla_dus3d`` rate — sweep10 measured ~1.0 ms,
            # neither free (BENCH r4 priced only a streaming ones-write,
            # 0.34 ms) nor a full xla_t3d relayout (2.3 ms).
            from custereomatching_tpu.utils import transpose_volume_cost

            t3d_bytes = transpose_volume_cost(H, W, D).bytes
            r_t3d = rates.get("xla_t3d", 1.0 / _device_bandwidth())
            b_t3d = t3d_bytes * r_t3d
            b_pfwd = b_vfwd + b_t3d
            from custereomatching_tpu.ops.pallas_zncc import _round_up

            # Padded plane counts of the SHIPPED forwards: the parity
            # op's forward runs the gated tiles (dt=16 at KITTI -> 208
            # planes), the trainable hdw op pins dt=8 (200 planes); each
            # protocol's cotangent volume is built at its forward's
            # padded shape, so the write legs price those extents.
            def _planes(dtv):
                n_dv = -(-(D + 1) // dtv)
                dtv = _round_up(-(-(D + 1) // n_dv), 8)
                return -(-(D + 1) // dtv) * dtv

            wo4 = _round_up(max(W, 128), 128) * 4
            pad_vol_w = _round_up(H, hbf) * _planes(dtf) * wo4
            pad_vol_w8 = _round_up(H, 48) * _planes(8) * wo4
            # Write-only bytes: this protocol's cotangent is all-ones,
            # whose transpose XLA folds to a broadcast — the restage
            # reads no volume.  A REAL cotangent adds the read leg
            # (sweep10: rand_ct − faithful = 0.83 ms ≈ the 0.36 GB read
            # at this rate), priced in BASELINE.md's adapter table.
            b_dus = pad_vol_w * rates.get("xla_dus3d", r_t3d)
            b_pfb = b_pfwd + b_vbwd + b_dus
            # The HDW-volume fwd+bwd protocol materializes the masked
            # all-ones cotangent volume directly in the kernel layout —
            # price its HBM write so achieved % compares like with like.
            b_ones = pad_vol_w8 * rates.get("hbm_w3d", 0.0)
            b_vfb = b_vfwd8 + b_vbwd + b_ones
            print(
                "[bench] calibrated rooflines (microbenchmarked op rates, "
                "utils/kernel_model.py): "
                f"fused fwd bound {b_fwd*1e3:.2f} ms -> "
                f"{b_fwd/t_pipe*100:.1f}% achieved; "
                f"train step bound {b_train*1e3:.2f} ms "
                f"(fwd+vol {b_tfwd*1e3:.2f} + bwd {b_tbwd*1e3:.2f}) -> "
                f"{b_train/t_train*100:.1f}% achieved; "
                f"volume fwd bound {b_vfwd*1e3:.2f} ms -> "
                f"{b_vfwd/t_fwd_h*100:.1f}%; "
                f"volume fwd+bwd bound {b_vfb*1e3:.2f} ms "
                f"(incl. cotangent build {b_ones*1e3:.2f}) -> "
                f"{b_vfb/t_fwdbwd_h*100:.1f}%; "
                f"parity adapter fwd bound {b_pfwd*1e3:.2f} ms "
                f"(transpose {b_t3d*1e3:.2f}) -> {b_pfwd/t_fwd*100:.1f}%; "
                f"parity fwd+bwd bound {b_pfb*1e3:.2f} ms "
                f"(incl. cotangent restage {b_dus*1e3:.2f}) -> "
                f"{b_pfb/t_fwdbwd*100:.1f}%",
                file=sys.stderr,
            )
            if use_pallas:
                _projector_bwd_report(camera, projector, rates)
        else:
            from custereomatching_tpu.utils import zncc_roofline

            rl = zncc_roofline(H, W, D, K, materialize_volume=False)
            print(
                f"[bench] fused-pipeline roofline (datasheet fallback): "
                f"bound {rl['bound_fps']:.1f} fps -> achieving "
                f"{fps/rl['bound_fps']*100:.1f}% of bound",
                file=sys.stderr,
            )
    except Exception as e:
        print(f"[bench] roofline report skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
