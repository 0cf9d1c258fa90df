"""Pallas TPU kernel for the banded ZNCC stereo cost volume.

This is the speed-of-light production path for the framework's hot op —
the TPU-native replacement for the reference's CUDA
``forward_cost_volume_kernel`` (reference:
custma/src/stereo_matching_kernel.cu:17-72).  The redesign, per survey
§7.4:

* The reference assigns one CUDA thread per ``(h, w, d)`` output and
  re-reads the k×k window twice from global memory (≈450 uncached reads
  per element).  Here a grid step owns an ``[HB, DT, W]`` output tile;
  the camera/projector **row bands (with their k//2-row halo) are DMA'd
  into VMEM once per row tile** and reused across all W·D outputs they
  touch, so HBM traffic ≈ 1 image read + 1 volume write (the
  HBM-bandwidth bound).
* Window sums use the expanded-moments identity with **separable k-tap
  accumulation** (rows pass then columns pass): O(2k) adds per output
  instead of O(k²) reads.
* Per-window means/moments of each image are computed **once per row
  band** into VMEM scratch (at disparity-tile 0) and reused; only the
  cross term is per-disparity work.
* TPUs cannot vector-load at dynamic unaligned lane offsets, so the
  per-disparity projector shift is realized with **lane rolls**: one
  dynamic roll aligns the band to the tile's first disparity, then each
  loop iteration rolls by a single lane — every slice in the kernel has
  a static offset.  The circular wrap-in region provably never reaches
  the consumed columns (margins sized accordingly below).
* Output is produced in ``[H, D+1, W]`` ("HDW") layout so every write is
  a full lane vector; the parity wrapper transposes to the reference's
  ``[H, W, D+1]`` (reference layout: kernel.cu:200-201, intended banded
  variant kernel.cu:30-33,197).

Numerical contract is identical to :mod:`.zncc` / the reference: windows
zero-padded, means divided by k² including padding (kernel.cu:6-12,53-54),
``cost = (exy + eps)/sqrt(ex2·ey2 + eps)``, eps=1e-8 (kernel.cu:4,71),
fp32 accumulation.

Column coordinate system (one shared left margin ``L = Lp + p``):
  * camera image lives at columns ``[p, p+W)`` of a ``wcc``-wide band;
  * projector image lives at columns ``[L, L+W)`` of a ``pw``-wide band,
    so the pixel ``d`` columns left of camera column ``c`` sits at
    projector-band column ``c + Lp - d`` — after rolling the band left
    by ``Lp - d``, simply at column ``c``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-8  # reference: custma/src/stereo_matching_kernel.cu:4


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _win_sum(x: jax.Array, k: int, axis: int, out_len: int,
             start: int = 0) -> jax.Array:
    """k-tap windowed sum along ``axis``: ``out[i] = Σ_{t<k} x[start+i+t]``.

    Binary-tree evaluation: ⌈log₂k⌉ doubling adds plus one op per set
    bit of k — with a subtractive shortcut when k is just below a power
    of two (k = 15: box16 − one tap = 5 adds/subs instead of 6, and two
    fewer shifted slices, which matter doubly on TPU because every
    shifted slice is a lane/sublane relayout).  ``start`` offsets the
    output window origin for free (the final slices just begin later —
    no relayout, unlike slicing the input first).  Requires
    ``x.shape[axis] >= start + out_len + k - 1``.
    """
    # Subtractive form: with M = 2^⌈log₂k⌉ and deficit d = M − k,
    # ``box_k[i] = box_{M/2}[i] + box_{M/2}[i + M/2] − Σ_{t=k..M-1} x[i+t]``
    # — the extra taps cancel exactly whatever they contain, so this is
    # valid whenever x physically extends to out_len + M − 1 taps (the
    # kernels' padded bands always do).  Cheaper than the binary combine
    # when 1 + d < popcount(k) − 1 (k=15: 5 ops instead of 6, and fewer
    # shifted-slice relayouts).
    m = 1 << k.bit_length()
    deficit = m - k
    if (0 < deficit < bin(k).count("1") - 1
            and x.shape[axis] >= start + out_len + m - 1):
        half = m // 2
        sums = {1: x}
        span = 1
        while span < half:
            prev = sums[span]
            ln = prev.shape[axis] - span
            sums[2 * span] = (
                lax.slice_in_dim(prev, 0, ln, axis=axis)
                + lax.slice_in_dim(prev, span, span + ln, axis=axis))
            span *= 2
        bh = sums[half]
        # box_k[i] = box_half[i] + box_half[i + half] - Σ_{t=k..m-1} x[i+t]
        out = (lax.slice_in_dim(bh, start, start + out_len, axis=axis)
               + lax.slice_in_dim(bh, start + half, start + half + out_len,
                                  axis=axis))
        for t in range(k, m):
            out = out - lax.slice_in_dim(x, start + t, start + t + out_len,
                                         axis=axis)
        return out

    sums = {1: x}
    span = 1
    while 2 * span <= k:
        prev = sums[span]
        ln = prev.shape[axis] - span
        sums[2 * span] = (lax.slice_in_dim(prev, 0, ln, axis=axis)
                          + lax.slice_in_dim(prev, span, span + ln, axis=axis))
        span *= 2
    result = None
    off = start
    for span in sorted(sums, reverse=True):
        if k & span:
            part = lax.slice_in_dim(sums[span], off, off + out_len, axis=axis)
            result = part if result is None else result + part
            off += span
    return result


def _row_window_matrix(k: int, hb: int, rows: int, dtype) -> jax.Array:
    """``[hb, rows]`` 0/1 matrix A with ``A[r, s] = 1 ⟺ r <= s < r + k``.

    ``A @ band`` is the k-tap windowed sum over the sublane (row) axis —
    evaluated on the MXU, which runs concurrently with the VPU doing the
    lane (column) pass, instead of spending VPU sublane-shift relayouts.
    """
    r_idx = lax.broadcasted_iota(jnp.int32, (hb, rows), 0)
    s_idx = lax.broadcasted_iota(jnp.int32, (hb, rows), 1)
    return jnp.logical_and(s_idx >= r_idx, s_idx < r_idx + k).astype(dtype)


def _box_from_band(band: jax.Array, k: int, hb: int, out_w: int,
                   row_mat: Optional[jax.Array] = None,
                   row_start: int = 0, col_start: int = 0) -> jax.Array:
    """Separable k×k window sum of a halo'd row band.

    ``band`` is ``[>= row_start + hb + k - 1, >= col_start + out_w + k - 1]``;
    returns ``[hb, out_w]`` where entry (r, w) sums the k×k window whose
    top-left corner is ``(row_start + r, col_start + w)`` — i.e. the
    window *centered* at band coordinates ``(row_start + r + k//2,
    col_start + w + k//2)``.  The start offsets shift the output origin
    for free (no input relayout).  With ``row_mat`` the rows pass runs on
    the MXU.
    """
    del row_mat  # MXU rows-pass measured slower (tiny M, f32 multi-pass)
    return _win_sum(_win_sum(band, k, 0, hb, row_start), k, 1, out_w,
                    col_start)


def _banded_kernel(cam_hbm, proj_hbm, out_hbm,
                   cam_vmem, proj_vmem, sx_scr, ex2_scr, sy_scr, ey2_scr,
                   sems, vol_buf, out_sem,
                   *, D: int, k: int, eps: float, hb: int, dt: int,
                   wo: int, wcc: int, pw: int, syw: int, lp: int,
                   n_last: int):
    """One grid step = disparities [d_idx·dt, d_idx·dt + dt) of an
    ``hb``-row tile.  Disparity is the fastest grid axis; the row band is
    DMA'd and its window statistics computed only at d_idx == 0.  The
    last disparity tile computes only its ``n_last`` real planes — the
    padded tail [D+1, n_d·dt) is skipped (its output is garbage by
    contract, see ``padded=True``).

    Output discipline (round 4): the volume is written in **plane-major
    (DHW) layout** ``[planes, h_pad, wo]`` via per-plane manual DMAs
    from a 2-slot staging buffer.  Two reasons, both measured
    (scripts/sweep6_volfwd_ablate.py):

    * a per-plane store into an ``(hb, dt, wo)`` out-block hits ONE
      sublane of each (8, 128) tile — 8× the vector stores of the
      contiguous 2D store each plane gets here (shipped 2.13-2.16 ms vs
      1.94-2.01 at KITTI);
    * the out_specs revolver did NOT overlap the volume write with the
      next step's compute (the dhw out_specs mirror still paid ~the
      full write latency); each plane's DMA here starts the moment its
      store lands and drains two grid steps later, hiding the write
      behind compute (manual ≈ the no-store compute floor).

    In HDW the plane axis is tiled in HBM and Mosaic rejects width-1
    slices of it — plane-major is the only layout that admits per-plane
    DMAs at all."""
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(0)
    step = h_idx * n_d + d_idx
    slot = lax.rem(step, 2)
    p = k // 2
    band_rows = _round_up(hb + 2 * p, 8)  # DMA slices need 8-row alignment
    inv_k2 = 1.0 / float(k * k)

    row_mat = _row_window_matrix(k, hb, band_rows, cam_vmem.dtype)

    @pl.when(d_idx == 0)
    def _load_and_stats():
        r0 = h_idx * hb  # hb is a multiple of 8 → aligned DMA offset
        cam_dma = pltpu.make_async_copy(
            cam_hbm.at[pl.ds(r0, band_rows), :], cam_vmem, sems.at[0])
        proj_dma = pltpu.make_async_copy(
            proj_hbm.at[pl.ds(r0, band_rows), :], proj_vmem, sems.at[1])
        cam_dma.start()
        proj_dma.start()
        cam_dma.wait()
        proj_dma.wait()

        cam = cam_vmem[:, :]
        sx = _box_from_band(cam, k, hb, wo, row_mat)
        sx_scr[:, :] = sx * inv_k2  # store μx-scaled: saves a mul per d
        ex2_scr[:, :] = _box_from_band(cam * cam, k, hb, wo, row_mat) \
            - sx * sx * inv_k2

        proj = proj_vmem[:, :]
        sy = _box_from_band(proj, k, hb, syw, row_mat)
        sy_scr[:, :] = sy
        ey2_scr[:, :] = (_box_from_band(proj * proj, k, hb, syw, row_mat)
                         - sy * sy * inv_k2)

    def out_copy(sl, j):
        return pltpu.make_async_copy(
            vol_buf.at[sl, j],
            out_hbm.at[d_idx * dt + j, pl.ds(h_idx * hb, hb), :],
            out_sem.at[sl])

    # Drain the dt copies issued two steps ago before overwriting the
    # slot.  Every step issues exactly dt copies (the last tile DMAs its
    # skipped planes' stale buffers too — they land inside the declared
    # padding, garbage by contract) so the per-slot count is uniform.
    @pl.when(step >= 2)
    def _drain_prev():
        for j in range(dt):
            out_copy(slot, j).wait()

    band = cam_vmem[:, :]
    mux = sx_scr[:, :]          # μx · 1 (already divided by k²)
    ex2 = ex2_scr[:, :]

    # Align the projector band and its statistics to this tile's LAST
    # disparity (d_last = d_base + dt - 1) with a single dynamic roll;
    # every disparity in the tile is then a *static* lane slice of the
    # rolled band — the loop below is a python loop, so Mosaic sees only
    # static offsets and needs no cross-iteration carries.
    d_base = d_idx * dt
    shift = lp - (d_base + dt - 1)  # roll left by this amount
    psh = pltpu.roll(proj_vmem[:, :], pw - shift, axis=1)
    syb = pltpu.roll(sy_scr[:, :], syw - shift, axis=1)
    ey2b = pltpu.roll(ey2_scr[:, :], syw - shift, axis=1)

    def plane(j):
        # disparity d = d_base + j lives at static column offset dt-1-j.
        c0 = dt - 1 - j
        prod = band * psh[:, c0:c0 + wcc]
        sxy = _box_from_band(prod, k, hb, wo, row_mat)
        exy = sxy - mux * syb[:, c0:c0 + wo]
        r = lax.rsqrt(ex2 * ey2b[:, c0:c0 + wo] + eps)
        vol_buf[slot, j] = (exy + eps) * r
        out_copy(slot, j).start()

    if n_last == dt:
        for j in range(dt):
            plane(j)
    else:
        # Padded tail planes carry no information — skip their compute in
        # the last tile (their DMA ships whatever the slot holds; the
        # padded-volume contract already declares those planes garbage).
        @pl.when(d_idx != n_d - 1)
        def _full_tile():
            for j in range(dt):
                plane(j)

        @pl.when(d_idx == n_d - 1)
        def _last_tile():
            for j in range(n_last):
                plane(j)
            for j in range(n_last, dt):
                out_copy(slot, j).start()

    @pl.when(step == n_h * n_d - 1)
    def _final_drain():
        @pl.when(step >= 1)
        def _other_slot():
            other = lax.rem(step + 1, 2)
            for j in range(dt):
                out_copy(other, j).wait()
        for j in range(dt):
            out_copy(slot, j).wait()


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def pallas_cost_volume_banded_hdw(
    camera: jax.Array,
    projector: jax.Array,
    num_disparities: int,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
    block_rows: int = 48,
    block_disparities: Optional[int] = None,
    interpret: bool = False,
    padded: bool = False,
) -> jax.Array:
    """Banded ZNCC cost volume in ``[H, D+1, W]`` (HDW) layout.

    The fused fast path: downstream heads should reduce over axis 1.
    Use :func:`pallas_cost_volume_banded` for the reference-parity
    ``[H, W, D+1]`` layout.

    Args:
      camera: ``[H, W]`` float32 camera image.
      projector: ``[H, W]`` float32 projector image.
      num_disparities: band size D (volume has D+1 disparity planes).
      kernel_size: odd correlation window side.
      epsilon: numerical epsilon (1e-8 for reference parity).
      block_rows: output rows per grid step (multiple of 8 for aligned
        DMA).
      block_disparities: max disparity planes per grid step (VMEM-bound:
        the double-buffered output tile is
        ``2 · block_rows · dt · round_up(W,128) · 4`` bytes).  ``None``
        (the default) picks 16 where the VMEM gate admits it — measured
        5% faster than 8 at KITTI shape (scripts/sweep14_volfwd_tiles.py)
        — and 8 otherwise.
      interpret: run the kernel in interpreter mode (CPU testing).

    Returns:
      ``[H, D+1, W]`` float32 cost volume; with ``padded=True`` the
      kernel's native **plane-major** padded volume ``[ndt, h_pad, wo]``
      (round 4 — rows-major ``[h_pad, ndt, wo]`` until round 3; the
      plane-major layout admits full-efficiency per-plane stores and
      DMAs, see ``_banded_kernel``).
    """
    if camera.ndim != 2 or camera.shape != projector.shape:
        raise ValueError(
            f"expected matching [H, W] images, got {camera.shape} vs "
            f"{projector.shape}")
    if kernel_size < 3 or kernel_size % 2 != 1:
        # k=1 is rejected here by design (docs/PARITY.md): it is the
        # degenerate no-window case — exy = ex2 = ey2 = 0 identically, so
        # every cost is the eps artifact sqrt(eps) and the closed-form
        # backward divides noise by noise.  The XLA op
        # (..zncc.stereo_matching) accepts k=1 for reference parity.
        raise ValueError(
            f"Pallas kernels require odd kernel_size >= 3, got "
            f"{kernel_size}; for the degenerate k=1 case use the XLA op "
            f"stereo_matching")
    H, W = camera.shape
    D = int(num_disparities)
    k = int(kernel_size)
    p = k // 2
    hb = _round_up(int(block_rows), 8)
    if block_disparities is None:
        block_disparities = _vjp_fwd_blocks(H, W, D, k)[1]

    # Split D+1 planes into n_d tiles of dt (dt a multiple of 8 so the
    # output block shape stays sublane-aligned).
    n_d = -(-(D + 1) // int(block_disparities))
    dt = _round_up(-(-(D + 1) // n_d), 8)
    # Rounding dt up to the sublane multiple can shrink the tile
    # count (whole tiles would otherwise be padding).
    n_d = -(-(D + 1) // dt)

    wo = _round_up(max(W, 128), 128)        # output lane width
    wcc = _round_up(wo + 2 * p, 128)        # camera band width (col halo)
    # Disparity reach, lane-aligned; also covers the padded d range
    # [D+1, n_d·dt) so clamp-free rolls stay within the zero margin.
    lp = _round_up(max(D + 1, n_d * dt), 128)
    syw = wcc + lp                          # projector-stats width
    pw = _round_up(syw + 2 * p, 128)        # projector band width

    n_h = -(-H // hb)
    h_pad = n_h * hb
    band_rows = _round_up(hb + 2 * p, 8)
    # Every DMA reads band_rows rows starting at h_idx*hb.
    src_rows = h_pad + band_rows

    cam_p = jnp.zeros((src_rows, wcc), camera.dtype)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (p, p))
    proj_p = jnp.zeros((src_rows, pw), projector.dtype)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (p, lp + p))

    kernel = functools.partial(
        _banded_kernel, D=D, k=k, eps=float(epsilon),
        hb=hb, dt=dt, wo=wo, wcc=wcc, pw=pw, syw=syw, lp=lp,
        n_last=(D + 1) - (n_d - 1) * dt)

    # NOTE: the forward's dt is free (the differentiable ops ship dt=16 —
    # sweep14 measured it 5% faster than dt=8 at KITTI shape), but the
    # direct-DMA backwards keep dt=8: they stream TWO volume-sized tiles
    # (cotangent + cost), so a dt=16 double-buffered pair exceeds the
    # ~16 MB VMEM at any useful block_rows.  The backwards derive their
    # tile count from D (not from this volume's plane count) and skip the
    # padded tail [D+1, n_d·dt) entirely, so the two tilings decouple.
    vol_planes = n_d * dt

    out = pl.pallas_call(
        kernel,
        grid=(n_h, n_d),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # camera band source (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # projector band source
        ],
        # Plane-major (DHW) volume, written by the kernel's own
        # per-plane DMAs (see _banded_kernel docstring).
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((vol_planes, h_pad, wo),
                                       camera.dtype),
        scratch_shapes=[
            pltpu.VMEM((band_rows, wcc), camera.dtype),   # camera band
            pltpu.VMEM((band_rows, pw), camera.dtype),    # projector band
            pltpu.VMEM((hb, wo), camera.dtype),           # sx
            pltpu.VMEM((hb, wo), camera.dtype),           # ex2
            pltpu.VMEM((hb, syw), camera.dtype),          # sy
            pltpu.VMEM((hb, syw), camera.dtype),          # ey2
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, dt, hb, wo), camera.dtype),    # plane staging
            pltpu.SemaphoreType.DMA((2,)),                # out DMAs
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * k * H * W * (D + 1),
            bytes_accessed=H * W * (D + 1) * 4 + 2 * H * W * 4,
            transcendentals=H * W * (D + 1),
        ),
        interpret=interpret,
    )(cam_p, proj_p)
    if padded:
        # Skip the (HBM-traffic-costly) slice copy; callers that fuse the
        # disparity head can consume the padded volume directly.  Padded
        # rows/planes/columns contain garbage and must be masked off.
        return out
    return jnp.swapaxes(out[:D + 1, :H, :W], 0, 1)


def pallas_cost_volume_banded(
    camera: jax.Array,
    projector: jax.Array,
    num_disparities: int,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
    **kwargs,
) -> jax.Array:
    """Banded ZNCC cost volume in the reference-parity ``[H, W, D+1]``
    layout (a transpose of the HDW fast path)."""
    hdw = pallas_cost_volume_banded_hdw(
        camera, projector, num_disparities, kernel_size, epsilon, **kwargs)
    return jnp.swapaxes(hdw, 1, 2)


# ---------------------------------------------------------------------------
# Differentiable public op (Pallas forward, analytic closed-form backward)
# ---------------------------------------------------------------------------

def _vjp_fwd_blocks(H: int, W: int, D: int, k: int) -> tuple:
    """Default forward tiles: the raw HDW kernel's ``None`` tile gate
    and the parity vjp ops' forward choice.

    (48, 16) measured 5% faster than (48, 8) at KITTI shape
    (scripts/sweep14_volfwd_tiles.py, interleaved same-window protocol),
    so ship it wherever the kernel's VMEM residents fit; fall back to
    (48, 8) otherwise.  The trainable HDW op (_pallas_stereo_hdw) pins
    (48, 8) instead — its padded output doubles as the backward's
    residual/cotangent layout, and end-to-end the extra planes cost
    more than the forward saves (scripts/sweep15_vjp_dt.py).
    The estimate mirrors _banded_kernel's actual
    scratch (bands + stats + the 2-slot plane staging) plus a
    dt-independent Mosaic-stack allowance — the plane loop round-trips
    its accumulators through scratch refs, so the stack does NOT grow
    with dt (unlike ops.tuning's deliberately conservative lattice
    filter).  Calibrated against the measured compile outcomes at KITTI
    width: (48, 16) and (48, 24) compile, (96, 8) does not.
    """
    p = k // 2
    wo = _round_up(max(W, 128), 128)
    wcc = _round_up(wo + 2 * p, 128)
    for hb, dt in ((48, 16), (48, 8)):
        n_d = -(-(D + 1) // dt)
        dtr = _round_up(-(-(D + 1) // n_d), 8)
        lp = _round_up(max(D + 1, n_d * dtr), 128)
        syw = wcc + lp
        pw = _round_up(syw + 2 * p, 128)
        band_rows = _round_up(hb + 2 * p, 8)
        elems = (band_rows * (wcc + pw) + 2 * hb * (wo + syw)
                 + 2 * hb * dtr * wo + 1.2 * band_rows * wcc)
        if 4.0 * elems <= 13.5e6:
            return hb, dt
    return 48, 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _pallas_stereo(camera, projector, num_disparities, kernel_size,
                   epsilon, interpret):
    hb, dt = _vjp_fwd_blocks(*camera.shape, num_disparities, kernel_size)
    return pallas_cost_volume_banded(
        camera, projector, num_disparities, kernel_size, epsilon,
        block_rows=hb, block_disparities=dt, interpret=interpret)


def _pallas_stereo_fwd(camera, projector, num_disparities, kernel_size,
                       epsilon, interpret):
    # Produce the padded plane-major volume once; the parity layout is
    # its (explicitly priced) transpose adapter, and the padded volume
    # doubles as the backward's cost residual (n·r = c kills the
    # per-plane cross-term recompute).  Deliberate departure from the
    # reference's inputs-only remat (custma/stereo_matching_wrapper.py:16)
    # — measured on the v5e at KITTI shape: 7.51 ms fwd+bwd vs 9.12 for
    # the inputs-only rows-major staging and 9.70 for an inputs-only
    # plane-major recompute (the cost residual, not the cotangent
    # layout, is what pays here; see docs/PARITY.md).
    H, W = camera.shape
    hb, dt = _vjp_fwd_blocks(H, W, num_disparities, kernel_size)
    vol = pallas_cost_volume_banded_hdw(
        camera, projector, num_disparities, kernel_size, epsilon,
        hb, dt, interpret, True)
    cost = jnp.transpose(vol[:num_disparities + 1, :H, :W], (1, 2, 0))
    return cost, (camera, projector, vol)


def _pallas_stereo_bwd(num_disparities, kernel_size, epsilon, interpret,
                       residuals, g):
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_camera_grad_banded_hdw_with_cost)
    camera, projector, vol = residuals
    # Parity cotangent → the kernel's own padded plane-major layout.
    # Padding entries are written as zeros, satisfying the direct-DMA
    # backward's zero-cotangent contract.
    g_vol = jnp.zeros(vol.shape, vol.dtype)
    g_vol = lax.dynamic_update_slice(g_vol, jnp.transpose(g, (2, 0, 1)),
                                     (0, 0, 0))
    cam_grad = pallas_camera_grad_banded_hdw_with_cost(
        camera, projector, vol, g_vol, num_disparities, kernel_size,
        epsilon, 96, 8, interpret)
    return cam_grad, jnp.zeros_like(projector)


_pallas_stereo.defvjp(_pallas_stereo_fwd, _pallas_stereo_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _pallas_stereo_hdw(camera, projector, num_disparities, kernel_size,
                       epsilon, interpret):
    # (48, 8) forward tiles — NOT the dt=16 that wins the standalone
    # forward (sweep14: 1.87 vs 1.97 ms).  This op's padded output IS
    # its training protocol's residual and cotangent layout, and dt=16
    # grows it 200 -> 208 planes at KITTI: the masked-ones cotangent
    # build and the bigger buffers cost more than the forward saves —
    # fwd+bwd measured 5.17 (dt16) vs 5.11 ms (dt8), interleaved
    # same-window (scripts/sweep15_vjp_dt.py).  The primal must match
    # the vjp fwd rule's output shape, so the choice is op-wide; the
    # inference-surface kernel (pallas_cost_volume_banded_hdw) defaults
    # to the gated dt=16 instead.
    return pallas_cost_volume_banded_hdw(
        camera, projector, num_disparities, kernel_size, epsilon,
        48, 8, interpret, True)


def _pallas_stereo_hdw_fwd(camera, projector, num_disparities, kernel_size,
                           epsilon, interpret):
    cost = _pallas_stereo_hdw(camera, projector, num_disparities,
                              kernel_size, epsilon, interpret)
    # Residuals: the two images AND the forward volume.  Saving the
    # output (alive in autodiff anyway) lets the backward skip the
    # per-plane cross-term recompute entirely (n·r = c) — a deliberate
    # departure from the reference's inputs-only remat
    # (custma/stereo_matching_wrapper.py:16), bought with zero extra HBM
    # writes.
    return cost, (camera, projector, cost)


def _pallas_stereo_hdw_bwd(num_disparities, kernel_size, epsilon, interpret,
                           residuals, g):
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_camera_grad_banded_hdw_with_cost)
    camera, projector, cost = residuals
    cam_grad = pallas_camera_grad_banded_hdw_with_cost(
        camera, projector, cost, g, num_disparities, kernel_size, epsilon,
        96, 8, interpret)
    return cam_grad, jnp.zeros_like(projector)


_pallas_stereo_hdw.defvjp(_pallas_stereo_hdw_fwd, _pallas_stereo_hdw_bwd)


# -- both-gradients variants (the backward half the reference never wrote:
# custma/stereo_matching_wrapper.py:33 returns None for the projector) -----

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _pallas_stereo_hdw_both(camera, projector, num_disparities, kernel_size,
                            epsilon, interpret):
    # (48, 8) forward tiles — see _pallas_stereo_hdw (sweep15: the
    # protocol, not the forward alone, picks the tile here).
    return pallas_cost_volume_banded_hdw(
        camera, projector, num_disparities, kernel_size, epsilon,
        48, 8, interpret, True)


def _pallas_stereo_hdw_both_fwd(camera, projector, num_disparities,
                                kernel_size, epsilon, interpret):
    cost = _pallas_stereo_hdw_both(camera, projector, num_disparities,
                                   kernel_size, epsilon, interpret)
    return cost, (camera, projector, cost)


def _pallas_stereo_hdw_both_bwd(num_disparities, kernel_size, epsilon,
                                interpret, residuals, g):
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_camera_grad_banded_hdw_with_cost,
        pallas_projector_grad_banded_hdw_with_cost,
    )
    camera, projector, cost = residuals
    cam_grad = pallas_camera_grad_banded_hdw_with_cost(
        camera, projector, cost, g, num_disparities, kernel_size, epsilon,
        96, 8, interpret)
    proj_grad = pallas_projector_grad_banded_hdw_with_cost(
        camera, projector, cost, g, num_disparities, kernel_size, epsilon,
        48, 8, interpret)
    return cam_grad, proj_grad


_pallas_stereo_hdw_both.defvjp(_pallas_stereo_hdw_both_fwd,
                               _pallas_stereo_hdw_both_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _pallas_stereo_both(camera, projector, num_disparities, kernel_size,
                        epsilon, interpret):
    return pallas_cost_volume_banded(
        camera, projector, num_disparities, kernel_size, epsilon,
        interpret=interpret)


def _pallas_stereo_both_fwd(camera, projector, num_disparities, kernel_size,
                            epsilon, interpret):
    # Produce the padded (plane-major) volume once; the parity layout is
    # its (explicitly priced) transpose adapter, and the padded volume
    # doubles as the cost residual for BOTH backward kernels.
    H, W = camera.shape
    hb, dt = _vjp_fwd_blocks(H, W, num_disparities, kernel_size)
    vol = pallas_cost_volume_banded_hdw(
        camera, projector, num_disparities, kernel_size, epsilon,
        hb, dt, interpret, True)
    cost = jnp.transpose(vol[:num_disparities + 1, :H, :W], (1, 2, 0))
    return cost, (camera, projector, vol)


def _pallas_stereo_both_bwd(num_disparities, kernel_size, epsilon, interpret,
                            residuals, g):
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_camera_grad_banded_hdw_with_cost,
        pallas_projector_grad_banded_hdw_with_cost,
    )
    camera, projector, vol = residuals
    g_vol = jnp.zeros(vol.shape, vol.dtype)
    g_vol = lax.dynamic_update_slice(g_vol, jnp.transpose(g, (2, 0, 1)),
                                     (0, 0, 0))
    cam_grad = pallas_camera_grad_banded_hdw_with_cost(
        camera, projector, vol, g_vol, num_disparities, kernel_size,
        epsilon, 96, 8, interpret)
    proj_grad = pallas_projector_grad_banded_hdw_with_cost(
        camera, projector, vol, g_vol, num_disparities, kernel_size,
        epsilon, 48, 8, interpret)
    return cam_grad, proj_grad


_pallas_stereo_both.defvjp(_pallas_stereo_both_fwd, _pallas_stereo_both_bwd)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def stereo_matching_pallas_hdw(
    camera: jax.Array,
    projector: jax.Array,
    num_disparities: int,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
    interpret: bool = False,
    grad_projector: bool = False,
) -> jax.Array:
    """Differentiable banded ZNCC cost volume in the **padded
    plane-major (DHW) layout**.

    The production training path.  Returns the kernel's native
    ``[ndt, h_pad, wo]`` volume (``ndt = D+1 rounded up to the disparity
    tile``, ``h_pad = ceil(H/hb)·hb``, ``wo = W rounded up to 128``;
    plane-major since round 4 — full-efficiency per-plane stores/DMAs,
    see ``_banded_kernel``); entries outside ``[:D+1, :H, :W]`` are
    garbage — padded planes are not even written — and MUST be excluded
    from any loss — use the padded-aware head
    (:func:`..disparity.extract_disparity_hdw`), whose masking also
    guarantees the zero-cotangent contract of the direct-DMA backward.

    Why this exists: both the final slice of the parity layout and any
    XLA-side pad/transpose of the ~0.5 GB cotangent cost ~2-4 ms each on
    a v5e — more than the backward kernel's useful work.  Keeping the
    padded layout end-to-end eliminates every volume-sized XLA copy from
    the training step.

    ``grad_projector=True`` additionally produces the projector gradient
    through the symmetric closed-form Pallas kernel
    (:func:`..pallas_zncc_bwd.pallas_projector_grad_banded_hdw_with_cost`)
    — the backward half the reference never implemented
    (custma/stereo_matching_wrapper.py:33).
    """
    if grad_projector:
        return _pallas_stereo_hdw_both(camera, projector, num_disparities,
                                       kernel_size, epsilon, interpret)
    return _pallas_stereo_hdw(camera, projector, num_disparities,
                              kernel_size, epsilon, interpret)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def stereo_matching_pallas(
    camera: jax.Array,
    projector: jax.Array,
    num_disparities: int,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
    interpret: bool = False,
    grad_projector: bool = False,
) -> jax.Array:
    """Differentiable banded ZNCC cost volume with the Pallas forward.

    Drop-in for :func:`..zncc.stereo_matching` in banded mode: same
    ``[H, W, D+1]`` output, same analytic camera gradient (closed-form
    Pallas backward fed by the forward's padded volume as a cost
    residual; by default the projector gradient is a symbolic zero,
    matching the reference's None,
    custma/stereo_matching_wrapper.py:33).  ``grad_projector=True``
    enables the Pallas projector backward (both gradients on the kernel
    path).  Either way the parity-layout cotangent pays one explicit
    transpose adapter into the padded plane-major layout the kernels
    consume.

    ``interpret=True`` runs the kernel in the Pallas interpreter — the
    CPU-testing path (survey §5.2: the TPU analogue of a sanitizer build).
    """
    if grad_projector:
        return _pallas_stereo_both(camera, projector, num_disparities,
                                   kernel_size, epsilon, interpret)
    return _pallas_stereo(camera, projector, num_disparities, kernel_size,
                          epsilon, interpret)
