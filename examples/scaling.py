"""Mesh-scaling report: throughput and efficiency across mesh shapes.

The reference has no multi-device story at all (survey §2.4).  This
script runs the sharded pipeline over a sweep of ``(data, space)`` mesh
shapes and reports weak-scaling efficiency (per-device workload held
constant).  On real multi-chip hardware the halo ppermutes ride ICI; on a
single-host checkout you can still validate the scaling *logic* with
virtual CPU devices:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python examples/scaling.py --backend xla --height 64 --width 128

(CPU-mesh timings are indicative only — the point of the CPU run is the
collective/sharding correctness and the efficiency accounting; absolute
numbers come from TPU runs.)
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

import jax
import jax.numpy as jnp
import numpy as np

from custereomatching_tpu.config import MeshConfig, StereoConfig
from custereomatching_tpu.data import make_video_batch
from custereomatching_tpu.models import StereoMatcher
from custereomatching_tpu.parallel import (
    make_mesh,
    shard_batch,
    sharded_cost_volume,
    sharded_disparity_maps,
)
from custereomatching_tpu.utils import benchmark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--height", type=int, default=128,
                    help="rows PER space-shard (weak scaling)")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--frames", type=int, default=1,
                    help="frames PER data-shard (weak scaling)")
    ap.add_argument("--disparities", "-D", type=int, default=32)
    ap.add_argument("--kernel-size", "-k", type=int, default=9)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--pipeline", choices=["fused", "volume"],
                    default="fused")
    args = ap.parse_args()

    n = len(jax.devices())
    config = StereoConfig(kernel_size=args.kernel_size,
                          num_disparities=args.disparities,
                          backend=args.backend)
    backend = config.resolved_backend()
    print(f"devices: {n} x {jax.devices()[0].device_kind!r}  "
          f"backend: {backend}  pipeline: {args.pipeline}")

    # Mesh sweep: every (data, space) factorization of 1, 2, 4, ..., n.
    shapes = []
    d = 1
    while d <= n:
        for s in (1, 2, 4, 8):
            if d * s <= n and (d * s) & (d * s - 1) == 0:
                shapes.append((d, s))
        d *= 2
    shapes = sorted(set(shapes), key=lambda x: (x[0] * x[1], x[1]))

    base_rate = None
    print(f"{'mesh':>10} {'devices':>8} {'frames/s':>10} {'per-dev':>9} "
          f"{'weak-eff':>9}")
    for (dd, ss) in shapes:
        B = args.frames * dd
        H = args.height * ss
        cams, projs, _ = make_video_batch(B, H, args.width,
                                          d_min=2.0, d_max=12.0)
        mesh = make_mesh(MeshConfig(data=dd, space=ss))
        cam_s, proj_s = shard_batch(
            (jnp.asarray(cams), jnp.asarray(projs)), mesh)

        if args.pipeline == "fused" and backend.startswith("pallas"):
            fn = jax.jit(lambda c, p, m=mesh: sharded_disparity_maps(
                c, p, config, m).soft_disparity)
        else:
            fn = jax.jit(lambda c, p, m=mesh: sharded_cost_volume(
                c, p, config, m))
        stats = benchmark(fn, cam_s, proj_s, iters=10, warmup=2)
        rate = B / stats["median_s"]
        per_dev = rate / (dd * ss)
        if base_rate is None:
            base_rate = per_dev
        eff = per_dev / base_rate
        print(f"{dd}x{ss:>8} {dd*ss:>8} {rate:>10.2f} {per_dev:>9.2f} "
              f"{eff*100:>8.1f}%")


if __name__ == "__main__":
    main()
