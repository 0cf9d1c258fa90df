"""Calibrated op-level cost model for the ZNCC Pallas kernels.

Round 2's roofline priced the kernels with a datasheet VPU rate and a
schematic op count, leaving a permanent ~13% "model error" between the
measured kernel and its bound (BASELINE.md).  This module replaces that
with an honest two-part bound:

1. **Measured per-op-class rates** (:func:`measure_vpu_rates`): tiny
   Pallas microkernels measure what the device actually sustains for the
   op classes the kernels are built from — dependent fused multiply-adds
   on aligned tiles (``madd``), the same with a lane-shifted /
   sublane-shifted operand (``lshift``/``sshift`` — every shifted slice
   on TPU is a relayout, the dominant hidden cost of windowed sums), and
   the transcendentals (``exp``, ``rsqrt``).  Rates are measured once
   per device kind and cached.  Nothing is calibrated against the
   production kernels themselves — the bound stays falsifiable.

2. **Structural op counts** (:func:`fused_forward_cost` etc.): the
   element counts of each op class, mirrored from the kernels' actual
   tile geometry — including the halo inflation of row/column passes
   (a ``band_rows``-row pass for ``hb`` output rows), the subtractive
   window-sum tree, per-tile rolls, and per-plane head work.  The model
   therefore moves when the kernel geometry moves.

The bound of a kernel = max(compute leg from 1+2, HBM DMA leg).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "..", "vpu_rates.json")

_OP_MODES = ("madd", "lshift", "sshift", "exp", "rsqrt", "boxadd",
             "mxuhi")
# "mxubmm" exists as a measurable mode (see _rate_kernel) but is NOT a
# pricing class: it was built to test whether the all-pairs kernel's 80%
# achievement is explained by both-operands-streaming dots being slower
# than mxuhi's value-chained repeat — measured, the streaming pattern is
# FASTER (0.86x mxuhi), so the hypothesis is refuted and pricing with it
# would only tighten the bound (sweep8, BASELINE.md).
# Measured DMA rates (seconds per byte) for the kernels' two bulk HBM
# access patterns: 3D tile reads ([rows, dt, W] slices of a volume, the
# backward's cotangent/cost stream) and 3D tile writes (the forward's
# volume output through the out_specs pipeline).  Like the compute
# classes these are measured by microbenchmarks that reproduce the
# access pattern, never calibrated against the production kernels.
_DMA_MODES = ("hbm_r3d", "hbm_w3d")
# Measured XLA (non-Pallas) volume-op rates: ``xla_t3d`` is seconds per
# byte (read+write counted) of the parity adapter's slice+transpose of
# a plane-major volume to [H, W, D+1] — a minor-dims relayout, several
# times slower than a streaming copy, which datasheet bandwidth would
# badly understate.  ``xla_dus3d`` is the adapter BACKWARD's cotangent
# restage (zeros + dynamic_update_slice of the (2, 0, 1) transpose into
# the padded plane-major layout — ops/pallas_zncc.py::_pallas_stereo_bwd),
# measured over read+write bytes (~3.1 ps/B on this v5e, reproducible
# where one-shot in-context measurements of the same op are bimodal);
# it is 2.3x FASTER than a jnp.pad of the same transpose — XLA fuses
# the transpose into the DUS write (sweep10).  Pricing note: a protocol
# whose cotangent transpose constant-folds (the verify all-ones)
# charges only the WRITE bytes at this rate (bench.py), which
# reproduces the measured in-context delta (1.20 ms at KITTI scale).
_XLA_MODES = ("xla_t3d", "xla_dus3d")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Microbenchmarks: measured per-op-class throughput
# ---------------------------------------------------------------------------

def _rate_kernel(out_ref, acc, wide, *, mode: str, inner: int, rows: int,
                 cols: int, ilp: int = 4):
    """One grid step = ``inner`` iterations of the class op on a
    ``[rows, cols]`` tile, spread across ``ilp`` independent accumulator
    chains (round-robin) so the measurement reflects pipelined VPU
    *throughput*, not op latency.  Chains are value-dependent so Mosaic
    cannot fold or hoist them; shifted operands use a different static
    offset per iteration so relayouts cannot be shared."""
    from jax.experimental import pallas as pl

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        acc[:, :] = jnp.full((rows, cols), 0.6, jnp.float32)
        wide[:, :] = jnp.full(wide.shape, 0.015625, jnp.float32)

    a = acc[:, :]
    for i in range(inner):
        if mode == "madd":
            a = a * 0.9996 + 0.00025
        elif mode == "lshift":
            off = (i * 13) % 128 + 1
            a = a * 0.9996 + wide[:rows, off:off + cols]
        elif mode == "sshift":
            off = (i * 3) % 8 + 1
            a = a * 0.9996 + wide[off:off + rows, :cols]
        elif mode == "exp":
            a = jnp.exp(a * 0.25)
        elif mode == "rsqrt":
            a = lax.rsqrt(a + 1.0)
        elif mode == "boxadd":
            # A REAL separable window-sum pass at the forward kernel's
            # geometry, so the calibration carries the kernels' true
            # slice-offset mix (sublane tree + lane tree).
            from custereomatching_tpu.ops.pallas_zncc import _box_from_band

            off = i % 8
            band = wide[off:off + rows + 14, :cols + 128]
            a = a * 0.9996 + _box_from_band(band, 15, rows, cols)
        elif mode == "mxuhi":
            # Exact-fp32 (HIGHEST, 6 bf16 passes) MXU contraction at the
            # all-pairs kernel's geometry: [256, cols]^T @ [256, cols].
            # Rate is seconds per NOMINAL f32 flop (the multi-pass cost
            # is inside the rate, as it is inside the kernels priced
            # with it).
            b = a[0:256, :]
            a = lax.dot_general(
                b, b, (((0,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32) * (1.0 / 256.0)
        elif mode == "mxubmm":
            # Like mxuhi but BOTH operands are fresh VMEM reads per dot
            # (different offsets each iteration) and the dots are
            # independent rather than value-chained: the batched-matmul
            # pattern of the all-pairs kernel.  Built to test whether
            # operand streaming explains that kernel's 80% achievement;
            # measured on the v5e it is FASTER than mxuhi (0.86x — the
            # independent dots pipeline better than the value chain), so
            # the hypothesis is refuted and this mode is diagnostic
            # only, not a pricing class (sweep8, BASELINE.md).
            ro = (i * 8) % 24
            co = (i * 128) % 256
            b = wide[ro:ro + 256, 0:cols]
            c = wide[0:256, co:co + cols]
            a = a * 1e-6 + lax.dot_general(
                b, c, (((0,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    acc[:, :] = a

    @pl.when(g == pl.num_programs(0) - 1)
    def _done():
        out_ref[:, :] = acc[:, :]


def _rate_call(mode: str, inner: int, rows: int, cols: int, grid: int,
               ilp: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_rate_kernel, mode=mode, inner=inner,
                               rows=rows, cols=cols, ilp=ilp)
    return jax.jit(lambda: pl.pallas_call(
        kernel,
        grid=(grid,),
        out_specs=pl.BlockSpec((rows, cols), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, cols), jnp.float32),
            pltpu.VMEM((rows + 24, cols + 256), jnp.float32),
        ],
        interpret=interpret,
    )())


def _run_rate(mode: str, *, rows: int = 32, cols: int = 1280,
              inner: int = 48, grid: int = 1024, ilp: int = 1,
              interpret: bool = False) -> float:
    """Measured per-element time (seconds) for one op class.

    Tile and unroll sit at the VMEM-stack limit for value chains
    (Mosaic keeps every unrolled iteration's temporary live:
    tile_bytes × inner must stay under ~14 MB); the grid supplies the
    total work (~2 G element-ops/call) and the chain-length slope
    cancels the host↔device round-trip (same estimator as bench.py).
    """
    import time

    if mode == "boxadd":
        inner, grid = 6, 768
    elif mode in ("mxuhi", "mxubmm"):
        rows = cols = 512
        inner, grid = 4, 64
    fn = _rate_call(mode, inner, rows, cols, grid, ilp, interpret)

    def _fence(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    def chain(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        _fence(out)
        return time.perf_counter() - t0

    n1, n2 = 2, 8
    _fence(fn())
    chain(n2)
    slopes = sorted((chain(n2) - chain(n1)) / (n2 - n1) for _ in range(7))
    per_call = slopes[len(slopes) // 2]
    if mode == "boxadd":
        # Normalize by the COUNTED tree-add elements of the real box pass
        # (same counting the cost models use), plus the madd combine.
        per_box = _box_tree_elems(15, rows + 14, rows, cols + 128, cols)
        elems = grid * inner * (per_box + rows * cols)
    elif mode in ("mxuhi", "mxubmm"):
        elems = grid * inner * 2 * cols * cols * 256   # nominal f32 flops
    else:
        elems = grid * inner * rows * cols
    return max(per_call, 1e-12) / elems


def _dma_read_kernel(src_hbm, out_ref, buf, acc, sems,
                     *, rows: int, dt: int, wo: int, src_rows: int):
    """Double-buffered [rows, dt, wo] tile reads from a [R, P, wo] HBM
    volume — the backward kernels' cotangent/cost stream, including its
    prefetch discipline (issue step s+1's copy before consuming step
    s's)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    step = h_idx * n_d + d_idx
    slot = lax.rem(step, 2)

    def _issue(s, sl):
        hi = s // n_d
        di = lax.rem(s, n_d)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(jnp.clip(hi * rows, 0, src_rows - rows), rows),
                       pl.ds(di * dt, dt), :],
            buf.at[sl], sems.at[sl])

    @pl.when(step == 0)
    def _first():
        acc[:, :] = jnp.zeros((8, wo), acc.dtype)
        _issue(step, slot).start()

    @pl.when(step + 1 < pl.num_programs(0) * n_d)
    def _prefetch():
        _issue(step + 1, lax.rem(step + 1, 2)).start()

    _issue(step, slot).wait()
    # Touch one sublane so the transfers are observably consumed.
    acc[0:1, :] = acc[0:1, :] + buf[slot, 0:1, 0, :]

    @pl.when(step + 1 == pl.num_programs(0) * n_d)
    def _done():
        out_ref[:, :] = acc[:, :]


def _dma_write_kernel(out_ref, *, hb: int, dt: int, wo: int):
    """[hb, dt, wo] volume-tile writes through the out_specs pipeline —
    the forward kernels' output stream."""
    from jax.experimental import pallas as pl

    v = (pl.program_id(0) * pl.num_programs(1)
         + pl.program_id(1)).astype(jnp.float32)
    out_ref[:, :, :] = jnp.full((hb, dt, wo), v, jnp.float32)


def _run_dma_rate(mode: str, *, interpret: bool = False) -> float:
    """Measured seconds-per-byte of one bulk HBM access pattern (KITTI-
    scale tile geometry: the rate is what a production-sized stream
    sustains, fixed DMA issue overheads amortized exactly as the kernels
    amortize them)."""
    import time

    from jax.experimental import pallas as pl  # noqa: F811
    from jax.experimental.pallas import tpu as pltpu  # noqa: F811

    wo, dt = 1280, 8
    n_h, n_d = 8, 25
    if mode == "hbm_r3d":
        rows, src_rows = 56, 8 * 48 + 56
        src = jnp.ones((src_rows, n_d * dt, wo), jnp.float32)
        kernel = functools.partial(_dma_read_kernel, rows=rows, dt=dt,
                                   wo=wo, src_rows=src_rows)
        fn = jax.jit(lambda s: pl.pallas_call(
            kernel,
            grid=(n_h, n_d),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, wo), lambda h, d: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, wo), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, rows, dt, wo), jnp.float32),
                pltpu.VMEM((8, wo), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(s))
        args = (src,)
        total_bytes = n_h * n_d * rows * dt * wo * 4
    elif mode == "hbm_w3d":
        hb = 48
        kernel = functools.partial(_dma_write_kernel, hb=hb, dt=dt, wo=wo)
        fn = jax.jit(lambda: pl.pallas_call(
            kernel,
            grid=(n_h, n_d),
            out_specs=pl.BlockSpec((hb, dt, wo), lambda h, d: (h, d, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_h * hb, n_d * dt, wo),
                                           jnp.float32),
            interpret=interpret,
        )())
        args = ()
        total_bytes = n_h * hb * n_d * dt * wo * 4
    else:
        raise ValueError(mode)

    def _fence(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    def chain(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _fence(out)
        return time.perf_counter() - t0

    _fence(fn(*args))
    chain(4)
    slopes = sorted((chain(8) - chain(2)) / 6 for _ in range(7))
    return max(slopes[len(slopes) // 2], 1e-15) / total_bytes


def _run_xla_rate(mode: str) -> float:
    """Measured seconds-per-byte of an XLA volume op (KITTI-scale)."""
    import time

    P, Hh, Ww = 200, 384, 1280
    D1, H1, W1 = 193, 375, 1242
    if mode == "xla_t3d":
        src = jnp.ones((P, Hh, Ww), jnp.float32)
        fn = jax.jit(lambda v: jnp.transpose(v[:D1, :H1, :W1], (1, 2, 0)))
        total_bytes = 2 * D1 * H1 * W1 * 4    # read + write
    elif mode == "xla_dus3d":
        src = jnp.ones((H1, W1, D1), jnp.float32)

        def _restage(g):
            z = jnp.zeros((P, Hh, Ww), jnp.float32)
            return lax.dynamic_update_slice(
                z, jnp.transpose(g, (2, 0, 1)), (0, 0, 0))

        fn = jax.jit(_restage)
        total_bytes = (D1 * H1 * W1 + P * Hh * Ww) * 4    # read + write
    else:
        raise ValueError(mode)

    def _fence(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    def chain(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(src)
        _fence(out)
        return time.perf_counter() - t0

    _fence(fn(src))
    chain(4)
    slopes = sorted((chain(12) - chain(4)) / 8 for _ in range(5))
    return max(slopes[len(slopes) // 2], 1e-15) / total_bytes


def _box_tree_elems(k: int, in_rows: int, out_rows: int, in_cols: int,
                    out_cols: int) -> float:
    """Counted tree-add elements of one _box_from_band call."""
    c = _box_ops(k, in_rows, out_rows, in_cols, out_cols)
    return sum(c[m] for m in _OP_MODES)


def measure_vpu_rates(force: bool = False,
                      cache_path: Optional[str] = None,
                      measure_if_missing: bool = True,
                      ) -> Optional[Dict[str, float]]:
    """Per-op-class per-element times (seconds), measured on this device.

    Cached on disk per device kind (first run costs a few minutes of
    compiles; a pre-measured cache ships in the repo).  Keys: ``madd``,
    ``lshift``, ``sshift``, ``exp``, ``rsqrt``, ``boxadd`` — seconds per
    element per iteration of that class.  With
    ``measure_if_missing=False`` a cache miss returns None instead of
    spending compile time (for benchmark harnesses under a timeout).
    """
    kind = jax.devices()[0].device_kind
    path = cache_path or os.path.abspath(_CACHE_PATH)
    cache = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    have = cache.get(kind, {})
    missing_op = [m for m in _OP_MODES if m not in have]
    missing_dma = [m for m in _DMA_MODES if m not in have]
    missing_xla = [m for m in _XLA_MODES if m not in have]
    if not force and kind in cache and not (missing_op or missing_dma
                                            or missing_xla):
        return dict(have)
    if not measure_if_missing and not force:
        # A partial cache (written before newer classes existed) is
        # still usable: pricing skips zero-count classes and
        # kernel_bound falls back to datasheet bandwidth for the memory
        # leg.
        return dict(have) if kind in cache else None
    if not force and kind in cache:
        # Top up an older cache without redoing the existing classes.
        rates = dict(have)
        if missing_op:
            op_rounds = [{m: _run_rate(m) for m in missing_op}
                         for _ in range(3)]
            rates.update({m: sorted(r[m] for r in op_rounds)[1]
                          for m in missing_op})
        if missing_dma:
            dma_rounds = [{m: _run_dma_rate(m) for m in missing_dma}
                          for _ in range(3)]
            rates.update({m: sorted(r[m] for r in dma_rounds)[1]
                          for m in missing_dma})
        if missing_xla:
            xla_rounds = [{m: _run_xla_rate(m) for m in missing_xla}
                          for _ in range(3)]
            rates.update({m: sorted(r[m] for r in xla_rounds)[1]
                          for m in missing_xla})
        cache[kind] = rates
        try:
            with open(path, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
        except OSError:
            pass
        return dict(rates)
    # Three measurement rounds, per-class median: the cheap classes are
    # allocator-state sensitive at the ±30% level run to run.
    rounds = [{m: _run_rate(m) for m in _OP_MODES} for _ in range(3)]
    rates = {m: sorted(r[m] for r in rounds)[1] for m in _OP_MODES}
    dma_rounds = [{m: _run_dma_rate(m) for m in _DMA_MODES}
                  for _ in range(3)]
    rates.update({m: sorted(r[m] for r in dma_rounds)[1]
                  for m in _DMA_MODES})
    xla_rounds = [{m: _run_xla_rate(m) for m in _XLA_MODES}
                  for _ in range(3)]
    rates.update({m: sorted(r[m] for r in xla_rounds)[1]
                  for m in _XLA_MODES})
    cache[kind] = rates
    try:
        with open(path, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except OSError:
        pass
    return rates


# ---------------------------------------------------------------------------
# Structural op counting
# ---------------------------------------------------------------------------

class OpCount(dict):
    """Per-class element counts; supports ``+`` and scalar ``*``."""

    def __init__(self, **kw):
        super().__init__({m: 0.0 for m in _OP_MODES})
        self.update({k: float(v) for k, v in kw.items()})
        self.bytes = 0.0
        # Optional read/write split of ``bytes``; when populated (and the
        # rate cache carries measured DMA rates) the memory leg is priced
        # with the measured per-pattern rates instead of datasheet BW.
        self.bytes_r = 0.0
        self.bytes_w = 0.0

    def __add__(self, other):
        out = OpCount()
        for m in _OP_MODES:
            out[m] = self[m] + other[m]
        out.bytes = self.bytes + getattr(other, "bytes", 0.0)
        out.bytes_r = self.bytes_r + getattr(other, "bytes_r", 0.0)
        out.bytes_w = self.bytes_w + getattr(other, "bytes_w", 0.0)
        return out

    def scaled(self, f):
        out = OpCount()
        for m in _OP_MODES:
            out[m] = self[m] * f
        out.bytes = self.bytes * f
        out.bytes_r = self.bytes_r * f
        out.bytes_w = self.bytes_w * f
        return out

    def time(self, rates: Dict[str, float], hbm_bw: float) -> Dict[str, float]:
        # Zero-count classes are skipped so an older rate cache (missing
        # a newer class) still prices every kernel that does not use it.
        t_c = sum(self[m] * rates[m] for m in _OP_MODES if self[m])
        if (self.bytes_r + self.bytes_w > 0
                and all(m in rates for m in _DMA_MODES)):
            t_m = (self.bytes_r * rates["hbm_r3d"]
                   + self.bytes_w * rates["hbm_w3d"])
        else:
            t_m = self.bytes / hbm_bw
        return {"t_compute_s": t_c, "t_memory_s": t_m,
                "bound_s": max(t_c, t_m),
                "bound_by": "compute" if t_c >= t_m else "memory"}


def _win_sum_ops(k: int, in_len: int, out_len: int, other: int,
                 axis: int) -> OpCount:
    """Element-op count of ``_win_sum`` (the subtractive/binary windowed
    sum) along ``axis`` (0 = sublane shifts, 1 = lane shifts), mirroring
    ops/pallas_zncc.py::_win_sum."""
    cls = "sshift" if axis == 0 else "lshift"
    m = 1 << k.bit_length()
    deficit = m - k
    total = 0
    if 0 < deficit < bin(k).count("1") - 1 and in_len >= out_len + m - 1:
        half = m // 2
        span, ln = 1, in_len
        while span < half:
            ln -= span
            total += ln
            span *= 2
        total += out_len            # bh[start] + bh[start+half]
        total += (m - k) * out_len  # subtract the extra taps
    else:
        span, ln = 1, in_len
        while 2 * span <= k:
            ln -= span
            total += ln
            span *= 2
        total += max(bin(k).count("1") - 1, 0) * out_len
    return OpCount(**{cls: total * other})


def _box_ops(k: int, in_rows: int, out_rows: int, in_cols: int,
             out_cols: int) -> OpCount:
    """_box_from_band = rows pass (sublane) then cols pass (lane).

    Priced with the ``boxadd`` class — calibrated from a microbenchmark
    that runs a REAL box pass, so the sublane/lane slice mix is measured,
    not assumed."""
    c = (_win_sum_ops(k, in_rows, out_rows, in_cols, axis=0)
         + _win_sum_ops(k, in_cols, out_cols, out_rows, axis=1))
    return OpCount(boxadd=sum(c[m] for m in _OP_MODES))


def _stats_ops(k: int, rows_in: int, rows_out: int, cam_w: int, out_w: int,
               proj_w: int, stat_w: int) -> OpCount:
    """Per-row-tile window statistics: 4 box passes (x, x², y, y²) plus
    the elementwise moment combines (mirrors the _load_and_stats blocks)."""
    c = OpCount()
    c = c + _box_ops(k, rows_in, rows_out, cam_w, out_w)          # Σx
    c = c + _box_ops(k, rows_in, rows_out, cam_w, out_w)          # Σx²
    c = c + OpCount(madd=rows_in * cam_w)                         # x·x
    c = c + OpCount(madd=2 * rows_out * out_w)                    # μx, ex2
    c = c + _box_ops(k, rows_in, rows_out, proj_w, stat_w)        # Σy
    c = c + _box_ops(k, rows_in, rows_out, proj_w, stat_w)        # Σy²
    c = c + OpCount(madd=rows_in * proj_w)                        # y·y
    c = c + OpCount(madd=2 * rows_out * stat_w)                   # μy, ey2
    return c


def _roll_ops(rows: int, pw: int, stat_rows: int, syw: int) -> OpCount:
    """Per-disparity-tile band/stat rolls (one dynamic lane roll each)."""
    return OpCount(lshift=rows * pw + 2 * stat_rows * syw)


def fused_forward_cost(H: int, W: int, D: int, k: int,
                       hb: int = 32, dt: int = 40,
                       write_volume: bool = False) -> OpCount:
    """Op/byte counts of the fused pipeline forward
    (ops/pallas_pipeline.py::_fused_kernel), geometry mirrored from
    _pipeline_forward_full.  ``write_volume`` adds the training
    variant's per-plane volume store + its HBM write."""
    p = k // 2
    hb = _round_up(hb, 8)
    n_d = -(-(D + 1) // dt)
    dt = _round_up(-(-(D + 1) // n_d), 8)
    n_d = -(-(D + 1) // dt)
    if n_d == 1:
        hb = min(hb, 16)
    wo = _round_up(max(W, 128), 128)
    wcc = _round_up(wo + 2 * p, 128)
    lp = _round_up(max(D + 1, n_d * dt), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)
    n_h = -(-H // hb)
    band_rows = _round_up(hb + 2 * p, 8)

    per_plane = OpCount()
    per_plane = per_plane + OpCount(lshift=band_rows * wcc)   # band·psh slice
    per_plane = per_plane + _box_ops(k, band_rows, hb, wcc, wo)
    per_plane = per_plane + OpCount(lshift=2 * hb * wo)       # exy, ey2b·ex2
    per_plane = per_plane + OpCount(rsqrt=hb * wo)
    per_plane = per_plane + OpCount(madd=2 * hb * wo)         # bc, pad select
    # Unnormalized head: exp + s/t accumulate + argmax track + scratch
    # round-trips (counted as one slot each store/load pair).
    per_plane = per_plane + OpCount(exp=hb * wo, madd=6 * hb * wo)
    if write_volume:
        per_plane = per_plane + OpCount(madd=hb * wo)         # c store

    tile = per_plane.scaled(D + 1)
    tile = tile + _stats_ops(k, band_rows, hb, wcc, wo, pw, syw)
    tile = tile + _roll_ops(band_rows, pw, hb, syw).scaled(n_d)
    tile = tile + OpCount(madd=4 * hb * wo)                   # epilogue maps

    total = tile.scaled(n_h)
    total.bytes_r = n_h * band_rows * (wcc + pw) * 4     # band DMA (halo'd)
    total.bytes_w = 6 * n_h * hb * wo * 4                # six output maps
    if write_volume:
        total.bytes_w += n_h * hb * n_d * dt * wo * 4    # volume write
    total.bytes = total.bytes_r + total.bytes_w
    return total


def fused_backward_c_cost(H: int, W: int, D: int, k: int,
                          hb: int = 48) -> OpCount:
    """Op/byte counts of the cost-residual fused trainable backward
    (ops/pallas_pipeline.py::_fused_bwd_c_kernel): per plane one DMA'd
    cost read, head cotangent, one box pass, three accumulations (b and
    grmu at the extended row extent), plus the per-tile head prep and
    the fused gradient-combine epilogue (the kernel consumes the raw
    residual maps and emits the finished gradient — no XLA glue)."""
    p = k // 2
    hb = _round_up(hb, 8)
    # Mirror the driver's clamp: no row tile may straddle the residual
    # volume's padded extent (the training forward tiles 48 rows; the
    # shipped hb=48 divides it exactly at KITTI height).
    g_rows = _round_up(H, 48)
    while hb > 8 and -(-H // hb) * hb > max(g_rows, H):
        hb -= 8
    hbe = hb + 2 * p
    # Mirrors the training forward's plane declaration: rounded up to a
    # multiple of 16 when the unwritten tail fits the skipped last tile,
    # which lets this backward run dt=16 instead of dt=8.
    n_planes = _round_up(D + 1, 8)
    decl = _round_up(n_planes, 16)
    if decl - (D + 1) < 16:
        n_planes = decl
    wo = _round_up(max(W, 128), 128)
    woe = wo + 2 * p
    wcc = _round_up(woe + 2 * p, 128)
    lp = _round_up(max(D + 1, n_planes), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)
    # The driver's VMEM-aware tile choice, imported (not mirrored) so
    # pricing can never drift from what the kernel actually runs.
    from custereomatching_tpu.ops.pallas_pipeline import (
        bwd_c_disparity_tile,
    )
    dt = bwd_c_disparity_tile(W, D, k, hb, n_planes)
    n_d = n_planes // dt
    n_h = -(-H // hb)
    band_rows = _round_up(hbe + 2 * p, 8)

    per_plane = OpCount()
    per_plane = per_plane + OpCount(lshift=hbe * wo)          # ey2c slice
    per_plane = per_plane + OpCount(rsqrt=hbe * wo)
    per_plane = per_plane + OpCount(madd=2 * hbe * wo)        # c mask, w sel
    per_plane = per_plane + OpCount(exp=hbe * wo)
    per_plane = per_plane + OpCount(madd=4 * hbe * wo)        # w·invs, g_d
    per_plane = per_plane + OpCount(madd=2 * hbe * wo)        # gr + store
    per_plane = per_plane + _box_ops(k, hbe, hb, woe, wo)
    per_plane = per_plane + OpCount(lshift=2 * hb * wo)       # a1 += ·psh
    per_plane = per_plane + OpCount(madd=4 * hbe * wo)        # B term (ext)
    per_plane = per_plane + OpCount(lshift=2 * hbe * wo)      # grmu (ext)

    tile = per_plane.scaled(D + 1)
    tile = tile + _stats_ops(k, band_rows, hbe, wcc, woe, pw, syw)
    # Per-tile head prep (1/s, t/s, β·mask premul, out-of-image selects —
    # fused in; previously an XLA stack + per-STEP re-masking).
    tile = tile + OpCount(madd=10 * hbe * wo, rsqrt=hbe * wo)
    tile = tile + _roll_ops(band_rows, pw, hbe, syw).scaled(n_d)
    # Fused gradient-combine epilogue: three staged boxes + combine
    # (replaces the old 4×box2d XLA epilogue and two extra output maps).
    tile = tile + _box_ops(k, hbe, hb, woe, wo).scaled(3)
    tile = tile + OpCount(madd=4 * hbe * wo + 3 * hb * wo,
                          lshift=hb * wo)
    total = tile.scaled(n_h)
    total.bytes_r = (n_h * band_rows * (wcc + pw) * 4
                     + 6 * n_h * hbe * wo * 4                # residual maps
                     + n_h * hbe * n_planes * wo * 4)        # cost read
    total.bytes_w = n_h * hb * wo * 4                        # one grad map
    total.bytes = total.bytes_r + total.bytes_w
    return total


def fused_backward_cost(H: int, W: int, D: int, k: int,
                        hb: int = 48, dt: int = 8) -> OpCount:
    """Op/byte counts of the volume-free fused trainable backward
    (ops/pallas_pipeline.py::_fused_bwd_kernel): per plane the
    cross-term recompute (prod + its box pass, center columns), head
    cotangent, one box pass, three accumulations (b and grmu at the
    extended row extent), plus the per-tile head prep and the fused
    gradient-combine epilogue (raw residual maps in, one finished
    gradient map out — no XLA glue)."""
    p = k // 2
    hb = _round_up(hb, 8)
    # Mirror the driver's clamp against the residual maps' padded extent
    # (the volume-free forward tiles 32 rows).
    mr = _round_up(H, 32)
    while hb > 8 and -(-H // hb) * hb > max(mr, H):
        hb -= 8
    hbe = hb + 2 * p
    n_d = -(-(D + 1) // dt)
    dt = _round_up(-(-(D + 1) // n_d), 8)
    n_d = -(-(D + 1) // dt)
    wo = _round_up(max(W, 128), 128)
    woe = wo + 2 * p
    wcc = _round_up(woe + 2 * p, 128)
    lp = _round_up(max(D + 1, n_d * dt), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)
    n_h = -(-H // hb)
    band_rows = _round_up(hbe + 2 * p, 8)

    per_plane = OpCount()
    per_plane = per_plane + OpCount(lshift=band_rows * wcc)   # prod
    per_plane = per_plane + _box_ops(k, band_rows, hbe, wcc, wo)   # sxy
    per_plane = per_plane + OpCount(lshift=2 * hbe * wo)      # exy, ex2·ey2b
    per_plane = per_plane + OpCount(rsqrt=hbe * wo)
    per_plane = per_plane + OpCount(madd=hbe * wo)            # c
    # Head cotangent: exp + w·inv_s + g_d combine.
    per_plane = per_plane + OpCount(exp=hbe * wo, madd=4 * hbe * wo)
    per_plane = per_plane + OpCount(madd=2 * hbe * wo)        # gr + store
    per_plane = per_plane + _box_ops(k, hbe, hb, woe, wo)     # box(gr)
    per_plane = per_plane + OpCount(lshift=2 * hb * wo)       # a1 += ·psh
    per_plane = per_plane + OpCount(madd=4 * hbe * wo)        # B term (ext)
    per_plane = per_plane + OpCount(lshift=2 * hbe * wo)      # grmu (ext)

    tile = per_plane.scaled(D + 1)
    tile = tile + _stats_ops(k, band_rows, hbe, wcc, woe, pw, syw)
    # Per-tile head prep (1/s, t/s, β·mask premul, out-of-image selects —
    # fused in; previously a per-grid-STEP map_ext re-masking).
    tile = tile + OpCount(madd=10 * hbe * wo, rsqrt=hbe * wo)
    tile = tile + _roll_ops(band_rows, pw, hbe, syw).scaled(n_d)
    # Fused gradient-combine epilogue: three staged boxes + combine.
    tile = tile + _box_ops(k, hbe, hb, woe, wo).scaled(3)
    tile = tile + OpCount(madd=4 * hbe * wo + 3 * hb * wo,
                          lshift=hb * wo)

    total = tile.scaled(n_h)
    total.bytes_r = (n_h * band_rows * (wcc + pw) * 4
                     + 6 * n_h * hbe * wo * 4)               # residual maps
    total.bytes_w = n_h * hb * wo * 4                        # one grad map
    total.bytes = total.bytes_r + total.bytes_w
    return total


def volume_forward_cost(H: int, W: int, D: int, k: int,
                        hb: int = 48, dt: int = 8) -> OpCount:
    """Op/byte counts of the banded HDW volume forward
    (ops/pallas_zncc.py::_banded_kernel)."""
    p = k // 2
    hb = _round_up(hb, 8)
    n_d = -(-(D + 1) // dt)
    dt = _round_up(-(-(D + 1) // n_d), 8)
    n_d = -(-(D + 1) // dt)
    wo = _round_up(max(W, 128), 128)
    wcc = _round_up(wo + 2 * p, 128)
    lp = _round_up(max(D + 1, n_d * dt), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)
    n_h = -(-H // hb)
    band_rows = _round_up(hb + 2 * p, 8)

    per_plane = OpCount()
    per_plane = per_plane + OpCount(lshift=band_rows * wcc)
    per_plane = per_plane + _box_ops(k, band_rows, hb, wcc, wo)
    per_plane = per_plane + OpCount(lshift=2 * hb * wo)
    per_plane = per_plane + OpCount(rsqrt=hb * wo, madd=hb * wo)

    tile = per_plane.scaled(D + 1)
    tile = tile + _stats_ops(k, band_rows, hb, wcc, wo, pw, syw)
    tile = tile + _roll_ops(band_rows, pw, hb, syw).scaled(n_d)

    total = tile.scaled(n_h)
    total.bytes_r = n_h * band_rows * (wcc + pw) * 4
    total.bytes_w = n_h * hb * n_d * dt * wo * 4             # volume write
    total.bytes = total.bytes_r + total.bytes_w
    return total


def volume_backward_cost(H: int, W: int, D: int, k: int,
                         hb: int = 48, dt: int = 8,
                         with_cost: bool = True) -> OpCount:
    """Op/byte counts of the direct-DMA volume backward
    (ops/pallas_zncc_bwd.py::_bwd_kernel, ``have_c=with_cost``)."""
    p = k // 2
    hb = _round_up(hb, 8)
    # Mirror _run_bwd's clamp against the padded-HDW cotangent extent
    # (the volume forward tiles 48 rows; the shipped hb=48 divides it
    # exactly at KITTI height).
    g_rows = _round_up(H, 48)
    while hb > 8 and -(-H // hb) * hb > max(g_rows, H):
        hb -= 8
    hbe = hb + 2 * p
    n_planes = _round_up(D + 1, 8)
    dtv = 8
    for cand in range(8, _round_up(dt, 8) + 1, 8):
        if n_planes % cand == 0:
            dtv = cand
    n_d = n_planes // dtv
    wo = _round_up(max(W, 128), 128)
    woe = wo + 2 * p
    wcc = _round_up(woe + 2 * p, 128)
    lp = _round_up(max(D + 1, n_d * dtv), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)
    n_h = -(-H // hb)
    band_rows = _round_up(hbe + 2 * p, 8)

    per_plane = OpCount()
    per_plane = per_plane + OpCount(lshift=hbe * wo)          # ey2c slice
    per_plane = per_plane + OpCount(rsqrt=hbe * wo)           # r
    if not with_cost:
        per_plane = per_plane + OpCount(lshift=band_rows * wcc)
        per_plane = per_plane + _box_ops(k, band_rows, hb, wcc, wo)
        per_plane = per_plane + OpCount(lshift=hb * wo, madd=hb * wo)
    per_plane = per_plane + OpCount(madd=2 * hbe * wo)        # mask, gr store
    per_plane = per_plane + _box_ops(k, hbe, hb, woe, wo)     # box(gr)
    per_plane = per_plane + OpCount(lshift=2 * hb * wo)       # a1 += ·psh
    if with_cost:
        # Fused-epilogue form: c mask + B/GRMU at the EXTENDED extent.
        per_plane = per_plane + OpCount(madd=5 * hbe * wo)
        per_plane = per_plane + OpCount(lshift=2 * hbe * wo)  # grmu ·syb
    else:
        per_plane = per_plane + OpCount(madd=5 * hb * wo)     # B, GRMU

    tile = per_plane.scaled(D + 1)
    tile = tile + _stats_ops(k, band_rows, hbe, wcc, woe, pw, syw)
    tile = tile + _roll_ops(band_rows, pw, hbe, syw).scaled(n_d)
    if with_cost:
        # In-kernel gradient-combine epilogue: three staged boxes +
        # combine (the no-cost path keeps the XLA epilogue, unpriced).
        tile = tile + _box_ops(k, hbe, hb, woe, wo).scaled(3)
        tile = tile + OpCount(madd=4 * hbe * wo + 3 * hb * wo,
                              lshift=hb * wo)

    total = tile.scaled(n_h)
    g_bytes = n_h * hbe * n_planes * wo * 4                   # cotangent DMA
    c_bytes = n_h * hbe * n_planes * wo * 4 if with_cost else 0
    total.bytes_r = n_h * band_rows * (wcc + pw) * 4 + g_bytes + c_bytes
    total.bytes_w = (1 if with_cost else 3) * n_h * hb * wo * 4
    total.bytes = total.bytes_r + total.bytes_w
    return total


def projector_backward_cost(H: int, W: int, D: int, k: int,
                            hb: int = 48, dt: int = 8) -> OpCount:
    """Op/byte counts of the projector-gradient backward
    (ops/pallas_zncc_bwd.py::_proj_bwd_kernel + its XLA box epilogue):
    per plane one rsqrt'd stats product, a per-plane dynamic roll of the
    staged cotangent AND of the cost tile (the +d gathers), one box
    pass, three accumulations; per tile the camera-side rolls; per row
    tile the stats and the three map stores; globally the 4-box XLA
    epilogue."""
    p = k // 2
    hb = _round_up(hb, 8)
    hbe = hb + 2 * p
    n_planes = _round_up(D + 1, 8)
    dtv = 8
    for cand in range(8, _round_up(dt, 8) + 1, 8):
        if n_planes % cand == 0:
            dtv = cand
    n_d = n_planes // dtv
    wo = _round_up(max(W, 128), 128)
    won = wo + 128                          # lane-aligned ext width
    lp = _round_up(max(D + 1, n_d * dtv), 128)
    gw = _round_up(won + lp, 128)           # g/c staging width
    sxw = _round_up(won + lp, 128)          # camera stats width
    cw = _round_up(sxw + 2 * p, 128)        # camera band width
    wcc = _round_up(won + 2 * p, 128)       # projector band width
    n_h = -(-H // hb)
    band_rows = _round_up(hbe + 2 * p, 8)

    per_plane = OpCount()
    per_plane = per_plane + OpCount(lshift=hbe * won, rsqrt=hbe * won)  # r
    per_plane = per_plane + OpCount(lshift=hbe * gw)      # g̃ roll
    per_plane = per_plane + OpCount(madd=2 * hbe * won)   # mask, gr
    per_plane = per_plane + _box_ops(k, hbe, hb, won, wo)  # box(gr)
    per_plane = per_plane + OpCount(lshift=2 * hb * wo)   # a1p += ·cam
    per_plane = per_plane + OpCount(lshift=hb * won, madd=2 * hb * won)  # z2
    per_plane = per_plane + OpCount(lshift=hb * gw)       # c̃ roll
    per_plane = per_plane + OpCount(madd=4 * hb * won)    # z3

    tile = per_plane.scaled(D + 1)
    # Camera-side rolls (band + μx + ex2), once per disparity tile.
    tile = tile + OpCount(
        lshift=(band_rows * cw + 2 * hbe * sxw) * n_d)
    # Stats: camera boxes at sxw width, projector boxes at won width.
    tile = tile + _box_ops(k, band_rows, hbe, cw, sxw).scaled(2)
    tile = tile + _box_ops(k, band_rows, hbe, wcc, won).scaled(2)
    tile = tile + OpCount(madd=band_rows * (cw + wcc)
                          + 2 * hbe * (sxw + won))
    # Accumulator zero-init + epilogue stores (three maps).
    tile = tile + OpCount(madd=2 * hb * (wo + 2 * won))

    total = tile.scaled(n_h)
    # XLA epilogue: 4 box2d passes over ~[H, won]-extent fields + the
    # elementwise combine.
    total = total + _box_ops(k, H + 2 * p, H, won + 2 * p, won).scaled(4)
    total = total + OpCount(madd=6 * H * W)
    total.bytes_r = (n_h * band_rows * (cw + wcc) * 4
                     + n_h * hbe * n_planes * wo * 4      # cotangent
                     + n_h * hb * n_planes * wo * 4)      # cost residual
    total.bytes_w = n_h * hb * (wo + 2 * won) * 4         # three maps
    # Epilogue traffic: reads the three maps + projector, writes grad.
    total.bytes_r += (H * (wo + 2 * won) + H * W) * 4
    total.bytes_w += H * W * 4
    total.bytes = total.bytes_r + total.bytes_w
    return total


def allpairs_backward_cost(H: int, W: int, k: int) -> OpCount:
    """Mandatory-traffic LOWER bound of the all-pairs camera backward
    (ops/zncc.py::_camera_grad_allpairs — an XLA program, not a Pallas
    kernel).

    Unlike the Pallas kernels, the op-by-op dataflow here is XLA's to
    schedule and fuse — structural per-pass counts measured ABOVE the
    achieved time (i.e. a broken bound) because XLA fuses the
    elementwise/reduction passes into the two volume reads.  What no
    schedule can avoid: reading the cotangent and the cost residual
    volumes once each, reading the images, writing the gradient.
    Priced at datasheet bandwidth (the optimistic leg), so achieved-%
    against it is a true fraction of speed-of-light."""
    vol = H * W * W
    c = OpCount()
    c.bytes = (2 * vol + 2 * H * W) * 4 + H * W * 4
    return c


def transpose_volume_cost(H: int, W: int, D: int) -> OpCount:
    """Byte counts of the parity-layout adapter's volume transpose
    ([h_pad, ndt, wo] padded HDW → [H, W, D+1]): priced with the
    measured ``xla_t3d`` rate when available (an XLA minor-dims
    transpose is a relayout, not a streaming copy — datasheet bandwidth
    would overstate it ~2.5x)."""
    c = OpCount()
    c.bytes_r = H * (D + 1) * W * 4
    c.bytes_w = H * W * (D + 1) * 4
    c.bytes = c.bytes_r + c.bytes_w
    return c


def stage_op_cost(H: int, W: int, D: int, S: int, k: int,
                  hb: int = 32, dt: int = 40) -> OpCount:
    """Op/byte counts of one pipeline-parallel stage op
    (parallel/pipeline.py::chunk_state on a Pallas backend): the fused
    forward at (D+1)/S planes over the stage-padded width
    (W + (D+1) − chunk extra columns), plus the pad/shift/lift glue."""
    chunk = -(-(D + 1) // S)
    W_pad = W + (D + 1) - chunk
    c = fused_forward_cost(H, W_pad, chunk - 1, k, hb, dt)
    # Glue: projector roll+mask (shift_right), the four map crops and
    # the state lift (am+off, t+off·s) — ~4 image-sized passes.
    c = c + OpCount(madd=4 * H * W_pad)
    c.bytes_r += 2 * H * W_pad * 4
    c.bytes_w += 4 * H * W * 4
    c.bytes = c.bytes_r + c.bytes_w
    return c


def allpairs_forward_cost(H: int, W: int, k: int, hr: int = 8) -> OpCount:
    """Op/byte counts of the Pallas/MXU all-pairs forward
    (ops/pallas_allpairs.py::_allpairs_kernel): per output row one
    k²-contraction matmul over im2col bands (HIGHEST precision — the
    ``mxuhi`` class carries the multi-pass cost), im2col staging copies,
    ~5 broadcast normalization passes; per grid step the band rolls,
    stats boxes, and the identity-dot transposes."""
    p = k // 2
    hr = max(8, _round_up(hr, 8))
    k2 = k * k
    k2p = _round_up(k2, 8)
    wo = _round_up(max(W, 128), 128)
    wi = _round_up(max(W + 2 * p, wo + 2 * p), 128)
    rb = _round_up(hr + 2 * p, 8)
    n_h = -(-H // hr)

    per_row = OpCount()
    # Main contraction: nominal flops at the MXU's 256-padded depth
    # (the measured mxuhi rate is normalized the same way).  sweep8's
    # stage ablation attributes the kernel's ~80% achievement entirely
    # to this leg (stats/rolls/stacks/norm all hide at <= 0.05 ms);
    # the streaming-operands hypothesis was measured and REFUTED
    # (mxubmm mode, 0.86x mxuhi), so the residual is in-kernel VMEM
    # traffic sharing with the dot pipeline, documented in BASELINE.md.
    per_row = per_row + OpCount(mxuhi=2 * wo * wo * _round_up(k2p, 256))
    # im2col staging: 2·k copies of [k, wo] at sublane offsets.
    per_row = per_row + OpCount(sshift=2 * k2 * wo)
    # Normalization: exy, deno product, combine (+ the rsqrt).
    per_row = per_row + OpCount(madd=5 * wo * wo, rsqrt=wo * wo)

    per_step = OpCount()
    per_step = per_step + OpCount(lshift=2 * k * rb * wi)    # band rolls
    per_step = per_step + _box_ops(k, rb, hr, wi, wo).scaled(4)
    per_step = per_step + OpCount(madd=4 * hr * wo)          # moments
    per_step = per_step + OpCount(
        mxuhi=2 * 2 * wo * hr * _round_up(hr, 256))          # transposes

    total = per_row.scaled(H) + per_step.scaled(n_h)
    total.bytes_r = n_h * 2 * rb * wi * 4
    total.bytes_w = H * W * W * 4                            # exact volume
    total.bytes = total.bytes_r + total.bytes_w
    return total


def kernel_bound(cost: OpCount, rates: Optional[Dict[str, float]] = None,
                 hbm_bw: Optional[float] = None) -> Dict[str, float]:
    """Bound (seconds / fps) of a counted kernel on this device."""
    from custereomatching_tpu.utils.profiling import device_specs

    if rates is None:
        rates = measure_vpu_rates()
    if hbm_bw is None:
        hbm_bw = device_specs()["hbm_bw"]
    out = cost.time(rates, hbm_bw)
    out["bound_fps"] = 1.0 / out["bound_s"]
    return out


__all__ = ["OpCount", "allpairs_forward_cost", "allpairs_backward_cost",
           "fused_forward_cost",
           "fused_backward_c_cost", "fused_backward_cost",
           "projector_backward_cost", "stage_op_cost",
           "transpose_volume_cost",
           "volume_forward_cost", "volume_backward_cost", "kernel_bound",
           "measure_vpu_rates"]
