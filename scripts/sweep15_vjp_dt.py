"""Same-window interleaved A/B of the differentiable ops' FORWARD tile
choice (dt=8 vs dt=16) through the full fwd+bwd protocols.

sweep14 measured the raw volume forward 5% faster at (48, 16); this
checks the choice END TO END, where dt=16 also changes what the
backward legs touch: the padded volume grows 200 -> 208 planes at
KITTI D=192, so the hdw protocol's masked-ones cotangent build and the
parity protocol's zeros+DUS cotangent restage write 4% more bytes,
while the backward kernels themselves skip the extra planes outright
(their tile count derives from D since round 5).

The forward tile is trace-time state (ops/pallas_zncc._vjp_fwd_blocks),
so each variant traces its jit under a monkeypatch; timing then follows
the sweep12 protocol (compile everything first, three interleaved
passes in one process).

Usage:  python scripts/sweep15_vjp_dt.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W, D, K = 375, 1242, 192, 15


def _readback(x) -> float:
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def _chain(fn, args, n):
    out = fn(*args)
    for _ in range(n - 1):
        out = fn(*args)
    _readback(out)


def _time_median(fn, args, n1=6, n2=24, reps=5):
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
    from custereomatching_tpu.ops import pallas_zncc as pz

    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((H, W), dtype=np.float32))

    def hdw_fwd_bwd(camera, projector):
        out, pullback = jax.vjp(
            lambda c: pz.stereo_matching_pallas_hdw(c, projector, D, K),
            camera)
        di = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0) <= D
        hi = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) < H
        wi = jax.lax.broadcasted_iota(jnp.int32, out.shape, 2) < W
        ones = jnp.where(hi & di & wi, 1.0, 0.0).astype(out.dtype)
        return pullback(ones)[0]

    def parity_fwd_bwd(camera, projector):
        # The reference's faithful protocol: the volume is an OUTPUT
        # (read by the caller), then backward(ones) — sweep10.
        out, pullback = jax.vjp(
            lambda c: pz.stereo_matching_pallas(c, projector, D, K),
            camera)
        return out, pullback(jnp.ones_like(out))[0]

    cases = {}
    real = pz._vjp_fwd_blocks
    for dt in (8, 16):
        pz._vjp_fwd_blocks = lambda *a, dt=dt: (48, dt)
        for label, proto in (("hdw", hdw_fwd_bwd), ("parity", parity_fwd_bwd),
                             ("hdw_fwd", lambda c, p: pz.
                              stereo_matching_pallas_hdw(c, p, D, K))):
            fn = jax.jit(proto)
            _chain(fn, (cam, proj), 1)   # trace+compile under the patch
            cases[f"{label}/dt{dt}"] = (fn, (cam, proj))
    pz._vjp_fwd_blocks = real

    results = {name: [] for name in cases}
    for _ in range(3):
        for name, (fn, args) in cases.items():
            results[name].append(_time_median(fn, args))
    for name, ts in results.items():
        passes = " ".join(f"{t * 1e3:.3f}" for t in ts)
        print(f"{name:>13}: {min(ts) * 1e3:7.3f} ms  (passes: {passes})",
              flush=True)


if __name__ == "__main__":
    main()
