"""Device health probe: is the chip delivering its normal throughput?

The tunneled TPU occasionally enters a DEGRADED WINDOW where every
kernel runs uniformly ~an order of magnitude slower (correctness is
unaffected), and can hang outright (BASELINE.md).  Benchmark numbers
taken in such a window say nothing about the kernels.

What to probe follows from what the benchmarks run: every production
kernel in this framework is VPU/DMA-bound (elementwise + windowed sums;
utils/kernel_model.py), so the health criterion is a **VPU madd chain**
measured by the same microbenchmark that calibrates the cost model,
compared against the rate cached in ``vpu_rates.json`` for this device
kind.  A bf16 matmul is ALSO timed, for two reasons: it detects outright
hangs cheaply (it runs first), and it discriminates the observed
catastrophic windows (15-27 Tflop/s vs ~200 normal).  It is deliberately
NOT the health criterion above its catastrophic floor: a 2026-08-17
window measured the 4096³ matmul at a stable 61 Tflop/s (3× down,
likely MXU contention from a co-tenant) while every Pallas/VPU path ran
at full speed — a matmul-only probe would have refused a perfectly
valid benchmark window.

Exit codes: 0 healthy (for the workloads benchmarked here), 1 degraded
or unreachable.

Run:  python scripts/device_probe.py [--floor-tflops 35] [--max-slowdown 2.0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe_matmul(size: int, iters: int) -> float:
    """Tflop/s of a bf16 matmul (hang detector + MXU report)."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((size, size), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    t0 = time.perf_counter()
    r = f(x)
    # Host readback: block_until_ready alone is not a reliable fence on
    # relayed platforms (CLAUDE.md).
    float(jnp.asarray(r, jnp.float32)[0, 0])
    print(f"first call (incl. compile): {time.perf_counter() - t0:.1f} s")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(x)
        float(jnp.asarray(out, jnp.float32)[0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return 2 * size**3 / best / 1e12


def _probe_vpu() -> tuple:
    """(measured madd s/elem, cached reference or None).

    Uses the cost model's own microbenchmark so the probe measures
    exactly the op class the production kernels are priced in.
    """
    import jax

    from custereomatching_tpu.utils.kernel_model import (
        _run_rate,
        measure_vpu_rates,
    )

    cached = measure_vpu_rates(measure_if_missing=False)
    ref = cached.get("madd") if cached else None
    return _run_rate("madd"), ref


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--floor-tflops", type=float, default=35.0,
                    help="matmul floor below which the window is "
                    "catastrophic regardless of the VPU leg (observed "
                    "bad windows: 15-27; observed healthy-VPU MXU "
                    "contention: 61)")
    ap.add_argument("--max-slowdown", type=float, default=2.0,
                    help="max VPU madd slowdown vs the vpu_rates.json "
                    "reference before the window is degraded")
    ap.add_argument("--abs-madd-ps", type=float, default=1.0,
                    help="fallback absolute madd threshold (ps/elem) "
                    "when no cached reference exists")
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if dev.platform not in ("tpu",):
        print("not a TPU — probe measures whatever backend is active",
              file=sys.stderr)

    tflops = _probe_matmul(args.size, args.iters)
    print(f"matmul {args.size}^3 bf16: {tflops:.1f} Tflop/s "
          f"(floor {args.floor_tflops:.0f})")
    if tflops < args.floor_tflops:
        print(f"DEVICE-PROBE DEGRADED (matmul < {args.floor_tflops:.0f} "
              f"Tflop/s: catastrophic window)")
        return 1

    try:
        madd, ref = _probe_vpu()
    except Exception as e:  # non-TPU backends, missing Pallas, etc.
        print(f"VPU probe unavailable ({type(e).__name__}: {e}); "
              f"falling back to the matmul criterion", file=sys.stderr)
        ok = tflops >= 80.0
        print("DEVICE-PROBE", "HEALTHY" if ok else
              "DEGRADED (< 80 Tflop/s, matmul-only fallback)")
        return 0 if ok else 1

    if ref is not None:
        limit = ref * args.max_slowdown
        rel = f"{madd / ref:.2f}x cached reference ({ref * 1e12:.2f})"
    else:
        limit = args.abs_madd_ps * 1e-12
        rel = "no cached reference"
    print(f"vpu madd: {madd * 1e12:.2f} ps/elem ({rel}; "
          f"limit {limit * 1e12:.2f})")
    ok = madd <= limit
    verdict = "HEALTHY" if ok else "DEGRADED (VPU below normal rate)"
    if ok and tflops < 80.0:
        verdict += " [MXU below normal — VPU paths unaffected]"
    print("DEVICE-PROBE", verdict)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
