"""Block-size autotuning for the Pallas kernels.

The shipped defaults (pipeline 32×40, volume 48×8, backward 64×8) are
tuned for the KITTI production shape (375×1242, D=192, k=15) on a TPU
v5e; other image sizes, disparity ranges or device generations can
prefer different tiles (the trade-offs: halo-inflation of the row pass
vs VMEM pressure vs padded-plane waste — see docs and the sweep scripts
under ``scripts/``).  :func:`autotune_pipeline_blocks` measures a small
candidate set on the live device with the slope method (fixed
round-trips cancelled) and caches the winner per shape in-process.

Opt-in by design: pass the result through
``dataclasses.replace(config, pipeline_blocks=...)`` — defaults stay
deterministic and compile-count stays bounded unless you ask.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence, Tuple

import jax

# Candidate tiles bracketing the trade-offs seen in the round-1/2 sweeps.
PIPELINE_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    (32, 40), (24, 40), (48, 40), (32, 64), (16, 40))
VOLUME_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    (48, 8), (64, 8), (32, 8), (48, 16), (24, 40))

_CACHE: Dict[tuple, Tuple[int, int]] = {}


def _readback(x) -> float:
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


def _slope_time(fn, args, n1: int = 4, n2: int = 12) -> float:
    """Per-call steady-state seconds (two-chain slope, pools pre-grown)."""

    def chain(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _readback(out)
        return time.perf_counter() - t0

    _readback(fn(*args))          # compile
    chain(n2)                     # grow allocator pools
    best = float("inf")
    for _ in range(3):
        best = min(best, (chain(n2) - chain(n1)) / (n2 - n1))
    return max(best, 1e-9)


def _tune(key, candidates, build):
    if key in _CACHE:
        return _CACHE[key]
    best, best_t = None, float("inf")
    for hb, dt in candidates:
        try:
            fn, args = build(hb, dt)
            t = _slope_time(fn, args)
        except Exception:
            continue  # candidate does not compile (e.g. VMEM) — skip
        if t < best_t:
            best, best_t = (hb, dt), t
    if best is None:
        raise RuntimeError("no autotune candidate compiled")
    _CACHE[key] = best
    return best


def autotune_pipeline_blocks(
    height: int,
    width: int,
    num_disparities: int,
    kernel_size: int = 15,
    candidates: Optional[Sequence[Tuple[int, int]]] = None,
    interpret: bool = False,
) -> Tuple[int, int]:
    """Best ``(block_rows, block_disparities)`` for the fused pipeline at
    this shape, measured on the live device.  Cached per shape."""
    import jax.numpy as jnp
    import numpy as np

    from custereomatching_tpu.ops.pallas_pipeline import _pipeline_forward

    cands = tuple(candidates) if candidates else PIPELINE_CANDIDATES
    key = ("pipeline", height, width, num_disparities, kernel_size,
           interpret, cands)
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((height, width), dtype=np.float32))
    proj = jnp.asarray(rng.random((height, width), dtype=np.float32))

    def build(hb, dt):
        fn = jax.jit(lambda c, p: _pipeline_forward(
            c, p, num_disparities, kernel_size, 1e-8, 50.0, 0.6, hb, dt,
            interpret).soft_disparity)
        return fn, (cam, proj)

    return _tune(key, cands, build)


def autotune_volume_blocks(
    height: int,
    width: int,
    num_disparities: int,
    kernel_size: int = 15,
    candidates: Optional[Sequence[Tuple[int, int]]] = None,
    interpret: bool = False,
) -> Tuple[int, int]:
    """Best ``(block_rows, block_disparities)`` for the HDW volume kernel
    at this shape.  Cached per shape."""
    import jax.numpy as jnp
    import numpy as np

    from custereomatching_tpu.ops.pallas_zncc import (
        pallas_cost_volume_banded_hdw)

    cands = tuple(candidates) if candidates else VOLUME_CANDIDATES
    key = ("volume", height, width, num_disparities, kernel_size,
           interpret, cands)
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((height, width), dtype=np.float32))
    proj = jnp.asarray(rng.random((height, width), dtype=np.float32))

    def build(hb, dt):
        fn = jax.jit(lambda c, p: pallas_cost_volume_banded_hdw(
            c, p, num_disparities, kernel_size, 1e-8, hb, dt, interpret,
            True))
        return fn, (cam, proj)

    return _tune(key, cands, build)
