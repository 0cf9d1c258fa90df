"""Device health probe: is the chip delivering its normal throughput?

The tunneled TPU occasionally enters a DEGRADED WINDOW where every
kernel runs uniformly ~an order of magnitude slower (correctness is
unaffected), and can hang outright (BASELINE.md).  Benchmark numbers
taken in such a window say nothing about the kernels.  This probe times
a bf16 matmul — compute-bound, trivial to sanity-check against the
device's datasheet rate — and exits nonzero when the device is absent,
hung, or running below ``--min-tflops``.

Run:  python scripts/device_probe.py [--min-tflops 80]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--min-tflops", type=float, default=80.0,
                    help="healthy threshold (v5e peaks near 200 bf16)")
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    if dev.platform not in ("tpu",):
        print("not a TPU — probe measures whatever backend is active",
              file=sys.stderr)

    n = args.size
    x = jnp.ones((n, n), jnp.bfloat16)
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
        for _ in range(args.iters):
            out = f(x)
        float(jnp.asarray(out, jnp.float32)[0, 0])
        best = min(best, (time.perf_counter() - t0) / args.iters)
    tflops = 2 * n**3 / best / 1e12
    print(f"matmul {n}^3 bf16: {best*1e3:.2f} ms/iter = {tflops:.1f} Tflop/s")
    ok = tflops >= args.min_tflops
    print("DEVICE-PROBE", "HEALTHY" if ok else
          f"DEGRADED (< {args.min_tflops:.0f} Tflop/s)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
