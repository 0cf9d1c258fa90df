"""Fused Pallas pipeline: stereo pair → disparity maps, volume-free.

The reference materializes the full cost volume in GPU memory and runs
disparity extraction as separate torch ops in its example scripts
(volume: custma/src/stereo_matching_kernel.cu:200-201; head:
examples/test.py:71-86, examples/verify.py:72-74).  At KITTI scale the
banded volume is ~360 MB/frame — by far the dominant HBM traffic.

This kernel never writes the volume: it extends the banded ZNCC kernel
(:mod:`.pallas_zncc`) with an **online disparity head** that folds each
cost plane into running accumulators as it is produced, flash-attention
style:

* running max ``m`` and its arg ``am`` → confidence, mask, hard argmax
  (first-max tie-breaking, matching ``jnp.argmax``/``torch.argmax``);
* numerically-stable online softmax sums ``s = Σ e^{β(c−m)}`` and
  ``t = Σ d·e^{β(c−m)}`` (rescaled when ``m`` improves) → soft-argmax
  ``t/s`` — the reference's ``soft_argmax`` with β=50
  (examples/verify.py:31-39) evaluated without storing its input.

HBM traffic per frame collapses from ~0.7 GB (write volume + read it
back in the head) to ~4 MB (read images, write four maps) — the whole
pipeline becomes one compute-bound kernel pass.

This is the inference fast path and is not differentiable; for training
use the volume op (:func:`..pallas_zncc.stereo_matching_pallas`) whose
custom VJP is exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from custereomatching_tpu.ops.pallas_zncc import (
    EPSILON,
    _box_from_band,
    _round_up,
)


def _unnormalized_head(beta: float, num_disparities: int) -> bool:
    """Whether (β, D) permit the unnormalized softmax head.

    With ``|c| ≤ 1 + ε`` the largest accumulator is the first moment
    ``t = Σ d·e^{β·c} ≤ D·(D+1)·e^{β(1+ε)}`` — note the extra factor of
    D relative to the sum ``s``, so the cutoff must scale with the
    disparity range, not just β.  Require the bound to sit ≥40× inside
    fp32 max: ``β + ln(D·(D+1)) ≤ 85`` (e⁸⁵ ≈ 8.2e36 ≪ 3.4e38).  For the
    reference workload (β=50, D=192) this is 60.5 ≤ 85.
    """
    import math

    d = int(num_disparities)
    return float(beta) + math.log((d + 1) * max(d, 1)) <= 85.0


# The fused backwards run with a raised per-kernel VMEM limit: the
# compiler's default scoped limit is 16 MB, but their scoped usage —
# scratch + the Mosaic value stack + any ANY-space inputs the compiler
# chooses to place in VMEM — measured 17.8 MB at KITTI shape, and a v5e
# has far more physical VMEM than the default assumes.
_BWD_VMEM_LIMIT = 64 * 2**20
# Scratch budget for the disparity-tile choice (dt=16 halves the DMA
# issues and per-tile rolls of dt=8 but doubles the double-buffered
# cost tile): keep scratch at half the limit so the value stack and
# VMEM-placed inputs always fit the other half.
_BWD_VMEM_BUDGET = 32 * 2**20


def bwd_c_disparity_tile(W: int, D: int, k: int, hb: int,
                         n_planes: int) -> int:
    """Disparity tile for the cost-residual fused backward.

    The largest candidate whose scratch footprint fits
    ``_BWD_VMEM_BUDGET``: dt=16 halves the DMA issues and per-tile rolls
    of dt=8, but its double-buffered cost tile alone is
    ``2·(hbe+2p)·16·wo`` floats, so the choice must price the actual
    geometry, not just divisibility.  Shared with the calibrated cost
    model (utils/kernel_model.py) so pricing follows the driver's
    actual choice.
    """
    p = k // 2
    pa = _round_up(p, 8)
    hbe = hb + 2 * p
    wo = _round_up(max(W, 128), 128)
    woe = wo + 2 * p
    wcc = _round_up(woe + 2 * p, 128)
    lp = _round_up(max(D + 1, n_planes), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)
    for cand in (16, 8):
        if n_planes % cand:
            continue
        scratch = 4 * (_round_up(hbe + 2 * p, 8) * (wcc + pw)
                       + 2 * cand * (hb + 4 * pa) * wo      # cost, 2 slots
                       + hbe * woe + 7 * (hb + 4 * pa) * wo
                       + 2 * hbe * wo + 2 * hbe * syw
                       + hb * wo + 2 * hbe * wo)
        if scratch <= _BWD_VMEM_BUDGET:
            return cand
    return 8


class PipelineMaps(NamedTuple):
    """Outputs of the fused pipeline (all ``[H, W]``)."""

    disparity: jax.Array       # hard argmax disparity, masked
    soft_disparity: jax.Array  # sub-pixel soft-argmax disparity, masked
    mask: jax.Array            # confidence mask (max cost > threshold)
    confidence: jax.Array      # per-pixel max correlation


def _fused_kernel(*refs,
                  D: int, k: int, eps: float, beta: float,
                  threshold: float, hb: int, dt: int,
                  wo: int, wcc: int, pw: int, syw: int, lp: int,
                  unnormalized: bool, write_volume: bool = False,
                  n_last: int = 0):
    """Fused forward: banded ZNCC planes + an online disparity head.

    Head variants (selected statically by ``unnormalized``):

    * ``unnormalized=True`` (β ≤ 75): the softmax sums accumulate raw
      ``u = e^{β·c}`` — with ``|c| ≤ 1 + ε`` the largest possible sum is
      ``(D+1)·e^{β(1+ε)} < 2^127``, so fp32 cannot overflow and the whole
      max-rescaling machinery (reciprocal + three selects per plane)
      disappears; the max/argmax tracking that remains is two cheap ops.
      Relative accuracy equals the max-normalized form: both drop
      addends below ~2⁻²⁴ of the running maximum term.
    * ``unnormalized=False``: numerically-safe online softmax with one
      exp and one reciprocal per plane (rescale-on-new-max), for large β.

    The projector band arrives PRE-SCALED by β, so the cross-term box
    pass directly yields ``β·sxy`` and no per-plane ``β·c`` multiply
    exists; ey2 is unscaled once at stats time.  Padded tail planes are
    neutralized by clamping their ``β·c`` to −3e38 (one select per plane;
    ``exp`` then contributes exact zero) — measured cheaper by ~50% of a
    kernel pass than splitting the unrolled loop into a masked last-tile
    variant, whose doubled code wrecks Mosaic's schedule at dt≈40.

    ``write_volume=True`` additionally streams each cost plane to a
    ``[hb, dt, wo]`` volume output (the TRAINING forward: the volume is
    the backward's cost residual, killing its per-plane cross-term
    recompute).  Padded tail planes of the last tile are skipped
    (``n_last``), mirroring the banded volume kernel.
    """
    if write_volume:
        (cam_hbm, proj_hbm,
         cv_hbm, am_ref, soft_ref, mask_ref, conf_ref, s_ref, t_ref,
         cam_vmem, proj_vmem, sx_scr, ex2_scr, sy_scr, ey2_scr,
         m_scr, am_scr, s_scr, t_scr, sems, vol_buf, out_sem) = refs
    else:
        (cam_hbm, proj_hbm,
         am_ref, soft_ref, mask_ref, conf_ref, s_ref, t_ref,
         cam_vmem, proj_vmem, sx_scr, ex2_scr, sy_scr, ey2_scr,
         m_scr, am_scr, s_scr, t_scr, sems) = refs
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(0)
    step_idx = h_idx * n_d + d_idx
    vslot = lax.rem(step_idx, 2)
    p = k // 2
    band_rows = _round_up(hb + 2 * p, 8)
    inv_k2 = 1.0 / float(k * k)
    inv_b2 = 1.0 / float(beta * beta)
    inv_b = 1.0 / float(beta)

    @pl.when(d_idx == 0)
    def _load_stats_init():
        r0 = h_idx * hb
        cam_dma = pltpu.make_async_copy(
            cam_hbm.at[pl.ds(r0, band_rows), :], cam_vmem, sems.at[0])
        proj_dma = pltpu.make_async_copy(
            proj_hbm.at[pl.ds(r0, band_rows), :], proj_vmem, sems.at[1])
        cam_dma.start()
        proj_dma.start()
        cam_dma.wait()
        proj_dma.wait()

        cam = cam_vmem[:, :]
        sx = _box_from_band(cam, k, hb, wo)
        sx_scr[:, :] = sx * inv_k2
        ex2_scr[:, :] = _box_from_band(cam * cam, k, hb, wo) \
            - sx * sx * inv_k2
        proj_b = proj_vmem[:, :]            # β-scaled projector band
        sy_b = _box_from_band(proj_b, k, hb, syw)
        sy_scr[:, :] = sy_b
        ey2_scr[:, :] = (_box_from_band(proj_b * proj_b, k, hb, syw)
                         - sy_b * sy_b * inv_k2) * inv_b2

        m_scr[:, :] = jnp.full((hb, wo), -3.0e38, m_scr.dtype)
        am_scr[:, :] = jnp.zeros((hb, wo), am_scr.dtype)
        s_scr[:, :] = jnp.zeros((hb, wo), s_scr.dtype)
        t_scr[:, :] = jnp.zeros((hb, wo), t_scr.dtype)

    if write_volume:
        # Plane-major volume residual via per-plane manual DMAs (see
        # .pallas_zncc._banded_kernel: full-efficiency plane stores, the
        # write hides behind the next steps' compute).
        def out_copy(sl, j):
            return pltpu.make_async_copy(
                vol_buf.at[sl, j],
                cv_hbm.at[d_idx * dt + j, pl.ds(h_idx * hb, hb), :],
                out_sem.at[sl])

        @pl.when(step_idx >= 2)
        def _drain_prev_vol():
            for j in range(dt):
                out_copy(vslot, j).wait()

    band = cam_vmem[:, :]
    mux = sx_scr[:, :]
    ex2 = ex2_scr[:, :]

    d_base = d_idx * dt
    shift = lp - (d_base + dt - 1)
    psh = pltpu.roll(proj_vmem[:, :], pw - shift, axis=1)
    syb = pltpu.roll(sy_scr[:, :], syw - shift, axis=1)
    ey2b = pltpu.roll(ey2_scr[:, :], syw - shift, axis=1)
    beps = beta * eps

    def plane(j):
        c0 = dt - 1 - j
        prod = band * psh[:, c0:c0 + wcc]          # β·cam·proj
        sxy_b = _box_from_band(prod, k, hb, wo)    # β·sxy
        exy_b = sxy_b - mux * syb[:, c0:c0 + wo]   # β·exy
        r = lax.rsqrt(ex2 * ey2b[:, c0:c0 + wo] + eps)
        bc = (exy_b + beps) * r                    # β·cost
        d = d_base + j
        d_f = d.astype(bc.dtype)
        # Neutralize padded tail planes: −3e38 makes exp exactly 0 and
        # loses every max comparison.
        bc = jnp.where(d <= D, bc, -3.0e38)
        if write_volume:
            # The backward consumes this plane as its cost residual.
            vol_buf[vslot, j] = bc * inv_b
            out_copy(vslot, j).start()

        # Accumulators round-trip through scratch each iteration: the ref
        # stores cut the value chains so Mosaic can reuse the loop
        # temporaries (threading them as values keeps every unrolled
        # iteration's intermediates live at once → VMEM-stack OOM).
        bm = m_scr[:, :]
        if unnormalized:
            u = jnp.exp(bc)
            s_scr[:, :] = s_scr[:, :] + u
            t_scr[:, :] = t_scr[:, :] + d_f * u
            better = bc > bm
            am_scr[:, :] = jnp.where(better, d_f, am_scr[:, :])
            m_scr[:, :] = jnp.maximum(bm, bc)
        else:
            em = jnp.exp(bc - bm)
            better = em > 1.0                      # ⇔ c > m
            scale = jnp.where(better, 1.0 / em, 1.0)
            e = jnp.where(better, 1.0, em)
            s_scr[:, :] = s_scr[:, :] * scale + e
            t_scr[:, :] = t_scr[:, :] * scale + d_f * e
            am_scr[:, :] = jnp.where(better, d_f, am_scr[:, :])
            m_scr[:, :] = jnp.where(better, bc, bm)

    if write_volume and n_last != dt:
        # dt is small (8) on the volume-writing path, where the loop
        # split is cheap (round-2 lesson: only dt≈40 splits hurt) and
        # skipping the padded tail mirrors the banded volume kernel.
        @pl.when(d_idx != n_d - 1)
        def _full_tile():
            for j in range(dt):
                plane(j)

        @pl.when(d_idx == n_d - 1)
        def _last_tile():
            for j in range(n_last):
                plane(j)
            # Uniform per-slot DMA counts: ship the skipped planes'
            # stale buffers into the declared padding (garbage by
            # contract).
            for j in range(n_last, dt):
                out_copy(vslot, j).start()
    else:
        for j in range(dt):
            plane(j)

    if write_volume:
        @pl.when(step_idx == n_h * n_d - 1)
        def _final_drain_vol():
            @pl.when(step_idx >= 1)
            def _other_slot():
                other = lax.rem(step_idx + 1, 2)
                for j in range(dt):
                    out_copy(other, j).wait()
            for j in range(dt):
                out_copy(vslot, j).wait()

    @pl.when(d_idx == n_d - 1)
    def _epilogue():
        conf = m_scr[:, :] * (1.0 / beta)    # m is kept β-scaled
        mask = (conf > threshold).astype(conf.dtype)
        conf_ref[:, :] = conf
        mask_ref[:, :] = mask
        am_ref[:, :] = am_scr[:, :]          # raw argmax (hard = am·mask)
        soft_ref[:, :] = (t_scr[:, :] / s_scr[:, :]) * mask
        s_ref[:, :] = s_scr[:, :]            # softmax residuals for the VJP
        t_ref[:, :] = t_scr[:, :]


def _pipeline_forward_full(
    camera: jax.Array,
    projector: jax.Array,
    num_disparities: int,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
    beta: float = 50.0,
    threshold: float = 0.6,
    block_rows: int = 32,
    block_disparities: int = 40,
    interpret: bool = False,
    write_volume: bool = False,
):
    """Run the fused kernel; returns the six raw PADDED ``[h_pad, wo]``
    maps ``(am, soft, mask, conf, s, t)`` — s/t are the online-softmax
    residuals the trainable VJP consumes.  With ``write_volume=True`` a
    seventh output is the padded-HDW cost volume (the training path's
    backward residual); use small disparity blocks (e.g. 8) there — the
    volume tile is double-buffered VMEM."""
    if camera.ndim != 2 or camera.shape != projector.shape:
        raise ValueError(
            f"expected matching [H, W] images, got {camera.shape} vs "
            f"{projector.shape}")
    if kernel_size < 3 or kernel_size % 2 != 1:
        # Same decision as pallas_cost_volume_banded_hdw (docs/PARITY.md):
        # k=1 is the degenerate no-window case; the XLA path serves it.
        raise ValueError(
            f"Pallas kernels require odd kernel_size >= 3, got "
            f"{kernel_size}")
    H, W = camera.shape
    D = int(num_disparities)
    k = int(kernel_size)
    p = k // 2
    hb = _round_up(int(block_rows), 8)

    n_d = -(-(D + 1) // int(block_disparities))
    dt = _round_up(-(-(D + 1) // n_d), 8)
    # Rounding dt up to the sublane multiple can shrink the tile
    # count (whole tiles would otherwise be padding).
    n_d = -(-(D + 1) // dt)
    if n_d == 1:
        # Single disparity tile: DMA+stats, the whole unrolled loop and
        # the epilogue share one grid step, so Mosaic's live-range peak is
        # higher — trim the row tile to stay inside the VMEM stack.
        hb = min(hb, 16)

    wo = _round_up(max(W, 128), 128)
    wcc = _round_up(wo + 2 * p, 128)
    lp = _round_up(max(D + 1, n_d * dt), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)

    n_h = -(-H // hb)
    h_pad = n_h * hb
    band_rows = _round_up(hb + 2 * p, 8)
    src_rows = h_pad + band_rows

    cam_p = jnp.zeros((src_rows, wcc), camera.dtype)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (p, p))
    proj_p = jnp.zeros((src_rows, pw), projector.dtype)
    # β pre-folded into the projector band: the cross-term box pass then
    # yields β·sxy directly (no per-plane β·c multiply in the kernel).
    proj_p = lax.dynamic_update_slice(
        proj_p, projector * jnp.asarray(beta, projector.dtype),
        (p, lp + p))

    kernel = functools.partial(
        _fused_kernel, D=D, k=k, eps=float(epsilon), beta=float(beta),
        threshold=float(threshold), hb=hb, dt=dt,
        wo=wo, wcc=wcc, pw=pw, syw=syw, lp=lp,
        unnormalized=_unnormalized_head(beta, D),
        write_volume=write_volume,
        n_last=(D + 1) - (n_d - 1) * dt)

    map_shape = jax.ShapeDtypeStruct((h_pad, wo), camera.dtype)
    map_spec = pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)
    out_specs = (map_spec,) * 6
    out_shape = (map_shape,) * 6
    if write_volume:
        # Declare the volume's plane dim rounded up to a multiple of 16
        # when the extra (never-written) tail still fits inside the
        # backward's skipped last disparity tile: a 16-divisible plane
        # count lets the cost-residual backward run dt=16 — half the DMA
        # issues and per-tile rolls of dt=8.  Only planes < n_d·dt are
        # ever written; the tail planes stay uninitialized in HBM and
        # the backward's unwritten-region guard keeps them out of any
        # live tile.  Plane-major layout, manual per-plane DMAs (round
        # 4 — see _fused_kernel).
        vol_planes = n_d * dt
        decl = _round_up(vol_planes, 16)
        if decl > vol_planes and decl - (D + 1) < 16:
            vol_planes = decl
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),) + out_specs
        out_shape = (jax.ShapeDtypeStruct((vol_planes, h_pad, wo),
                                          camera.dtype),) + out_shape
    outs = pl.pallas_call(
        kernel,
        grid=(n_h, n_d),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((band_rows, wcc), camera.dtype),   # camera band
            pltpu.VMEM((band_rows, pw), camera.dtype),    # projector band
            pltpu.VMEM((hb, wo), camera.dtype),           # μx
            pltpu.VMEM((hb, wo), camera.dtype),           # ex2
            pltpu.VMEM((hb, syw), camera.dtype),          # sy
            pltpu.VMEM((hb, syw), camera.dtype),          # ey2
            pltpu.VMEM((hb, wo), camera.dtype),           # running max m
            pltpu.VMEM((hb, wo), camera.dtype),           # argmax am
            pltpu.VMEM((hb, wo), camera.dtype),           # softmax s
            pltpu.VMEM((hb, wo), camera.dtype),           # softmax t
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((2, dt, hb, wo), camera.dtype),  # plane staging
              pltpu.SemaphoreType.DMA((2,))]              # volume DMAs
             if write_volume else []),
        cost_estimate=pl.CostEstimate(
            flops=(2 * 2 * k + 12) * H * W * (D + 1),
            bytes_accessed=2 * H * W * 4 + 4 * H * W * 4
            + (H * W * (D + 1) * 4 if write_volume else 0),
            transcendentals=3 * H * W * (D + 1),
        ),
        interpret=interpret,
    )(cam_p, proj_p)
    if write_volume:
        cv, am, soft, mask, conf, s, t = outs
        return am, soft, mask, conf, s, t, cv
    am, soft, mask, conf, s, t = outs
    return am, soft, mask, conf, s, t


def _pipeline_forward(camera, projector, num_disparities, kernel_size=15,
                      epsilon=EPSILON, beta=50.0, threshold=0.6,
                      block_rows=32, block_disparities=40, interpret=False):
    H, W = camera.shape
    am, soft, mask, conf, _, _ = _pipeline_forward_full(
        camera, projector, num_disparities, kernel_size, epsilon, beta,
        threshold, block_rows, block_disparities, interpret)
    hard = am[:H, :W] * mask[:H, :W]
    return PipelineMaps(disparity=hard, soft_disparity=soft[:H, :W],
                        mask=mask[:H, :W], confidence=conf[:H, :W])


pallas_stereo_pipeline = jax.jit(
    _pipeline_forward, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
pallas_stereo_pipeline.__doc__ = """Fused stereo pipeline: pair → disparity maps, no volume in HBM.

Produces exactly what the reference's example pipeline computes
(mask → argmax / soft-argmax → banded disparity; examples/test.py:71-86
with β and threshold from examples/verify.py:12-13), in one kernel.
Inference-only; for training use :func:`stereo_pipeline_trainable`.

Args:
  camera: ``[H, W]`` float32 camera image.
  projector: ``[H, W]`` float32 projector image.
  num_disparities: band size D.
  kernel_size: odd correlation window side.
  epsilon: ZNCC epsilon (1e-8 parity).
  beta: soft-argmax temperature (reference 50.0).
  threshold: confidence threshold (reference 0.6).
  block_rows: output rows per grid step (multiple of 8).
  block_disparities: disparity planes per grid step.
  interpret: Pallas interpreter mode (CPU testing).

Returns:
  A :class:`PipelineMaps` of four ``[H, W]`` maps.
"""


# ---------------------------------------------------------------------------
# Trainable fused pipeline: custom VJP with an in-kernel head cotangent
# ---------------------------------------------------------------------------
#
# Differentiating the fused pipeline naively would require materializing the
# cost-volume cotangent (∂loss/∂c[h,w,d]) — a ~0.5 GB array whose mere
# existence costs more than the backward math (any XLA-side pad/transpose of
# it measures ~4 ms on a v5e, and the XLA softmax-head VJP alone ~30 ms).
# Instead the backward kernel below RECOMPUTES each cost plane c_d (it
# already must, for the ZNCC gradient) and forms the head cotangent inline
# from per-pixel residuals saved by the forward:
#
#     soft_out = mask · t/s,   conf = m
#     ∂soft_out/∂c_d = mask · β · w_d · (d − t/s),  w_d = e^{β(c_d−m)}/s
#     ∂conf/∂c_d     = 1[d = argmax]
#     g_d = ĝ_soft·mask·β·w_d·(d − t/s) + ĝ_conf·1[d = am]
#
# (hard disparity and mask are piecewise-constant: zero gradient a.e.)
# g_d then feeds the closed-form ZNCC camera VJP exactly as in
# pallas_zncc_bwd, accumulating the D-reduced fields A1/B/GRMU.  Residuals
# are SIX [H, W] maps (~2 MB each) instead of a volume.


def _fused_bwd_kernel(cam_hbm, proj_hbm, am_hbm, mask_hbm, conf_hbm,
                      s_hbm, t_hbm, gs_hbm, gc_hbm,
                      grad_ref,
                      cam_vmem, proj_vmem, gr_scr,
                      am_b, is_b, tos_b, gs_b, gc_b, m_b, mk_b,
                      sx_scr, ex2_scr, sy_scr, ey2_scr,
                      a1_scr, b_scr, grmu_scr, sems,
                      *, H: int, W: int, D: int, k: int, eps: float,
                      beta: float, unnormalized: bool, hb: int, dt: int,
                      wo: int, woe: int, wcc: int, pw: int, syw: int,
                      lp: int, maps_rows: int, n_last: int):
    """Volume-free fused backward: the cost plane is recomputed from the
    images per tile (``prod`` + its box pass), so the only residuals are
    the two bands and the head maps.  Same fused-glue structure as
    :func:`_fused_bwd_c_kernel`: raw residual maps in, head derivations
    and out-of-image masking once per row tile, ``b``/``grmu``
    accumulated at the extended row extent, and the gradient-combine box
    filters run in-kernel so the kernel emits ONE finished gradient map.
    All per-plane elementwise work runs at the aligned center width
    ``wo`` — g_d is identically zero outside the image (the residual
    maps are), so ``gr_scr``'s zero margins serve the box's ±p column
    reach and the cross-term box pass prices center columns only."""
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    p = k // 2
    pa = _round_up(p, 8)
    hbe = hb + 2 * p
    band_rows = _round_up(hbe + 2 * p, 8)
    inv_k2 = 1.0 / float(k * k)
    # Static row offset of the extended (±p) window inside the map
    # buffers under the all-aligned staging below.
    q = 2 * pa - p

    @pl.when(d_idx == 0)
    def _load_and_stats():
        r0 = h_idx * hb
        cam_dma = pltpu.make_async_copy(
            cam_hbm.at[pl.ds(r0, band_rows), :], cam_vmem, sems.at[0])
        proj_dma = pltpu.make_async_copy(
            proj_hbm.at[pl.ds(r0, band_rows), :], proj_vmem, sems.at[1])
        # ALL-ALIGNED map staging for ext rows [r0−p, r0+hb+p): copy
        # R = hb + 2·pa rows from the 8-aligned source offset r0 − pa,
        # with the edge clamp folded into the (8-aligned) DMA
        # DESTINATION offset, so source row (r0 − p) + j always lands at
        # STATIC buffer row q + j.  Plain 2D maps: the [rows, 1, w]
        # unit-dim alternative (untiled dim 0) stores one sublane per
        # 8-sublane tile — 8× the DMA bytes and VMEM read cost
        # (scripts/sweep4_bwdc_ablate.py: full 6.46 → maps2d 3.48 ms).
        rows = hb + 2 * pa
        s0m = pl.multiple_of(jnp.clip(r0 - pa, 0, maps_rows - rows), 8)
        o_m = pl.multiple_of(pa - ((r0 - pa) - s0m), 8)
        srcs = [am_hbm, s_hbm, t_hbm, gs_hbm, gc_hbm, mask_hbm]
        dsts = [am_b, is_b, tos_b, gs_b, gc_b, mk_b]
        if not unnormalized:
            srcs.append(conf_hbm)
            dsts.append(m_b)
        copies = [pltpu.make_async_copy(
            src.at[pl.ds(s0m, rows)], dst.at[pl.ds(o_m, rows)],
            sems.at[2 + i]) for i, (src, dst) in enumerate(zip(srcs, dsts))]
        cam_dma.start()
        proj_dma.start()
        for cp in copies:
            cp.start()
        cam_dma.wait()
        proj_dma.wait()
        for cp in copies:
            cp.wait()

        cam = cam_vmem[:, :]
        sx = _box_from_band(cam, k, hbe, woe)
        # Raw Σx at center columns (the cross term pairs raw Σx with the
        # pre-scaled μy, saving a multiply per plane).
        sx_scr[:, :] = sx[:, p:p + wo]
        ex2 = _box_from_band(cam * cam, k, hbe, woe) - sx * sx * inv_k2
        ex2_scr[:, :] = ex2[:, p:p + wo]
        proj = proj_vmem[:, :]
        sy = _box_from_band(proj, k, hbe, syw)
        sy_scr[:, :] = sy * inv_k2
        ey2_scr[:, :] = (_box_from_band(proj * proj, k, hbe, syw)
                         - sy * sy * inv_k2)

        # Head derivations + out-of-image masking, ONCE per row tile
        # (previously re-derived by map_ext at every grid step: 6 maps ×
        # n_d re-selects + concats).  Rows the clamped DMA left stale
        # hold garbage; every transform routes through the same
        # where(ok, ·, 0) select, so garbage never escapes.
        trow2 = lax.broadcasted_iota(jnp.int32, (hbe, wo), 0) + (r0 - p)
        tcol = lax.broadcasted_iota(jnp.int32, (hbe, wo), 1)
        ok = jnp.logical_and(
            jnp.logical_and(trow2 >= 0, trow2 < H), tcol < W)
        csl = pl.ds(q, hbe)
        am_b[csl] = jnp.where(ok, am_b[csl], 0.0)
        inv_s = jnp.where(ok, 1.0 / is_b[csl], 0.0)
        is_b[csl] = inv_s
        tos_b[csl] = jnp.where(ok, tos_b[csl] * inv_s, 0.0)
        gs_b[csl] = jnp.where(ok, gs_b[csl] * mk_b[csl], 0.0) * beta
        gc_b[csl] = jnp.where(ok, gc_b[csl], 0.0)
        if not unnormalized:
            m_b[csl] = jnp.where(ok, m_b[csl], 0.0)

        a1_scr[:, :] = jnp.zeros((hb, wo), a1_scr.dtype)
        b_scr[:, :] = jnp.zeros((hbe, wo), b_scr.dtype)
        grmu_scr[:, :] = jnp.zeros((hbe, wo), grmu_scr.dtype)
        gr_scr[:, 0:p] = jnp.zeros((hbe, p), gr_scr.dtype)
        gr_scr[:, p + wo:woe] = jnp.zeros((hbe, woe - wo - p),
                                          gr_scr.dtype)

    band = cam_vmem[:, :]
    sx_raw = sx_scr[:, :]                           # [hbe, wo]
    ex2 = ex2_scr[:, :]                             # [hbe, wo]

    d_base = d_idx * dt
    shift = lp - (d_base + dt - 1)
    psh = pltpu.roll(proj_vmem[:, :], pw - shift, axis=1)
    syb = pltpu.roll(sy_scr[:, :], syw - shift, axis=1)
    ey2b = pltpu.roll(ey2_scr[:, :], syw - shift, axis=1)

    csl = pl.ds(q, hbe)
    inv_s_e = is_b[csl]
    tos_e = tos_b[csl]
    am_e = am_b[csl]
    gs_e = gs_b[csl]        # ĝ_soft · mask · β
    gc_e = gc_b[csl]        # ĝ_conf
    m_e = None if unnormalized else m_b[csl]

    def plane(j):
        c0 = dt - 1 - j
        pslice = psh[:, c0:c0 + wcc]
        prod = band * pslice
        sxy_c = _box_from_band(prod, k, hbe, wo, col_start=p)
        muy_c = syb[:, c0 + p:c0 + p + wo]         # μy (pre-scaled)
        ey2c = ey2b[:, c0 + p:c0 + p + wo]
        r = lax.rsqrt(ex2 * ey2c + eps)
        c_t = (sxy_c - sx_raw * muy_c + eps) * r   # the cost plane

        d_f = jnp.float32(0) + (d_base + j)        # traced scalar → f32
        # Head cotangent for this plane.  m_e is the max the forward
        # normalized against (absent for the unnormalized head).  The
        # select guards out-of-image positions in NORMALIZED mode, where
        # m_e = 0 but the recomputed c can approach 1: exp(β·c)
        # overflows and Inf·0 = NaN would poison the box filter.
        arg = beta * c_t if unnormalized else beta * (c_t - m_e)
        w = jnp.where(inv_s_e > 0.0, jnp.exp(arg), 0.0) * inv_s_e
        g_d = gs_e * w * (d_f - tos_e) + gc_e * (am_e == d_f)

        gr = g_d * r
        gr_scr[:, p:p + wo] = gr
        boxgr = _box_from_band(gr_scr[:, :], k, hb, wo)
        a1_scr[:, :] = a1_scr[:, :] + boxgr * pslice[2 * p:2 * p + hb,
                                                     2 * p:2 * p + wo]
        # b / grmu accumulate at the EXTENDED row extent: the epilogue's
        # box filters then need no cross-tile halo (rows outside the
        # image contribute exact zeros — g_d is masked to zero there).
        # n·r³ = c·r² (c already in hand for the head cotangent).
        b_scr[:, :] = b_scr[:, :] + (g_d * c_t * (r * r) * ey2c)
        grmu_scr[:, :] = grmu_scr[:, :] + gr * muy_c

    if n_last == dt:
        for j in range(dt):
            plane(j)
    else:
        @pl.when(d_idx != n_d - 1)
        def _full_tile():
            for j in range(dt):
                plane(j)

        @pl.when(d_idx == n_d - 1)
        def _last_tile():
            for j in range(n_last):
                plane(j)

    @pl.when(d_idx == n_d - 1)
    def _epilogue():
        # grad = A1 − box(grmu) + box(b·μx) − camera · box(b), evaluated
        # per tile on the extended-row accumulators (the old XLA
        # epilogue).  gr_scr's zero column margins serve the ±p column
        # reach of each box; it is staged three times sequentially.
        gr_scr[:, p:p + wo] = grmu_scr[:, :]
        t2 = _box_from_band(gr_scr[:, :], k, hb, wo)
        gr_scr[:, p:p + wo] = b_scr[:, :] * (sx_scr[:, :] * inv_k2)
        t3 = _box_from_band(gr_scr[:, :], k, hb, wo)
        gr_scr[:, p:p + wo] = b_scr[:, :]
        t4 = _box_from_band(gr_scr[:, :], k, hb, wo)
        cam_c = cam_vmem[2 * p:2 * p + hb, 2 * p:2 * p + wo]
        grad_ref[:, :] = (a1_scr[:, :] - t2) + (t3 - cam_c * t4)


def _fused_train_bwd_impl(camera, projector, residual_maps, D, k, eps,
                          beta, block_rows, block_disparities, interpret):
    """Driver for the volume-free fused backward.

    ``residual_maps`` is the 7-tuple ``(am, mask, conf, s, t, gsoft_pad,
    gconf_pad)`` of raw ``[h_pad, wo]`` forward residuals and zero-padded
    cotangents; all head derivations, masking, and the gradient-combine
    box filters run inside the kernel (no XLA stack/epilogue — the
    kernel returns the finished padded gradient, cropped here)."""
    H, W = camera.shape
    p = k // 2
    hb = _round_up(int(block_rows), 8)
    # No row tile may straddle the residual maps' padded extent (the
    # forward may have tiled with a different block height): the clamped
    # DMA destination offset stays in [0, 2p] only while the backward's
    # padded extent fits inside maps_rows.
    mr = residual_maps[0].shape[0]
    while hb > 8 and -(-H // hb) * hb > max(mr, H):
        hb -= 8
    hbe = hb + 2 * p
    n_d = -(-(D + 1) // int(block_disparities))
    dt = _round_up(-(-(D + 1) // n_d), 8)
    # Rounding dt up to the sublane multiple can shrink the tile
    # count (whole tiles would otherwise be padding).
    n_d = -(-(D + 1) // dt)

    wo = _round_up(max(W, 128), 128)
    woe = wo + 2 * p
    wcc = _round_up(woe + 2 * p, 128)
    lp = _round_up(max(D + 1, n_d * dt), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)

    n_h = -(-H // hb)
    h_pad = n_h * hb
    band_rows = _round_up(hbe + 2 * p, 8)
    src_rows = h_pad + band_rows

    cam_p = jnp.zeros((src_rows, wcc), camera.dtype)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (2 * p, 2 * p))
    proj_p = jnp.zeros((src_rows, pw), projector.dtype)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (2 * p, lp + 2 * p))

    maps = list(residual_maps)
    maps_rows = maps[0].shape[0]
    # The aligned staging copies hb + 2·pa rows per tile from 8-aligned
    # offsets, so the maps must span at least that many rows, rounded
    # to the sublane multiple.
    pa = _round_up(p, 8)
    need_rows = _round_up(max(maps_rows, hb + 2 * pa), 8)
    if need_rows > maps_rows:
        maps = [jnp.pad(m, ((0, need_rows - maps_rows), (0, 0)))
                for m in maps]
        maps_rows = need_rows

    unnormalized = _unnormalized_head(beta, D)
    kernel = functools.partial(
        _fused_bwd_kernel, H=H, W=W, D=D, k=k, eps=float(eps),
        beta=float(beta), unnormalized=unnormalized, hb=hb, dt=dt,
        wo=wo, woe=woe, wcc=wcc, pw=pw,
        syw=syw, lp=lp, maps_rows=maps_rows,
        n_last=min(dt, max(1, (D + 1) - (n_d - 1) * dt)))

    map_spec = pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)
    am, mask, conf, s, t, gsoft_p, gconf_p = maps
    grad = pl.pallas_call(
        kernel,
        grid=(n_h, n_d),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 9,
        out_specs=map_spec,
        out_shape=jax.ShapeDtypeStruct((h_pad, wo), camera.dtype),
        scratch_shapes=[
            pltpu.VMEM((band_rows, wcc), camera.dtype),       # camera
            pltpu.VMEM((band_rows, pw), camera.dtype),        # projector
            pltpu.VMEM((hbe, woe), camera.dtype),             # gr margins
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # am
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # 1/s
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # t/s
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # ĝs·mask·β
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # ĝc
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # m (norm.)
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # mask stage
            pltpu.VMEM((hbe, wo), camera.dtype),              # Σx (center)
            pltpu.VMEM((hbe, wo), camera.dtype),              # ex2
            pltpu.VMEM((hbe, syw), camera.dtype),             # μy
            pltpu.VMEM((hbe, syw), camera.dtype),             # ey2
            pltpu.VMEM((hb, wo), camera.dtype),               # A1
            pltpu.VMEM((hbe, wo), camera.dtype),              # B (ext)
            pltpu.VMEM((hbe, wo), camera.dtype),              # GRMU (ext)
            pltpu.SemaphoreType.DMA((9,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * k * H * W * (D + 1),
            bytes_accessed=H * W * (D + 1) * 4 + 2 * H * W * 4,
            transcendentals=2 * H * W * (D + 1),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=interpret,
    )(cam_p, proj_p, am, mask, conf, s, t, gsoft_p, gconf_p)

    return grad[:H, :W]


def _fused_bwd_c_kernel(cam_hbm, proj_hbm, am_hbm, mask_hbm, conf_hbm,
                        s_hbm, t_hbm, gs_hbm, gc_hbm, c_hbm,
                        grad_ref,
                        cam_vmem, proj_vmem, c_vmem, gr_scr,
                        am_b, is_b, tos_b, gs_b, gc_b, m_b, mk_b,
                        sx_scr, ex2_scr, sy_scr, ey2_scr,
                        a1_scr, b_scr, grmu_scr, sems,
                        *, H: int, W: int, D: int, k: int, eps: float,
                        beta: float, unnormalized: bool, hb: int, dt: int,
                        wo: int, woe: int, wcc: int, pw: int, syw: int,
                        lp: int, maps_rows: int, g_rows: int,
                        nf: int, rem: int):
    """Cost-residual fused backward: the training forward saved the cost
    volume, so the per-plane cross-term recompute (``prod`` + its box
    pass — the dominant cost of the recompute-from-images variant)
    vanishes.  Per plane: one DMA'd cost read, the head cotangent, one
    ``box2d(g·r)`` pass, three accumulations.  All per-plane elementwise
    work runs at the aligned center width ``wo`` — the ±p column reach of
    the box comes from ``gr_scr``'s zero margins (g_d is identically zero
    outside the image because the residual maps are).

    The XLA glue that used to surround this kernel is fused in:

    * inputs are the RAW forward residuals (am/mask/conf/s/t) and the
      two zero-padded cotangents — the head derivations (1/s, t/s, β·
      mask premul) and the out-of-image masking run ONCE per row tile at
      load time (they were previously an XLA ``stack`` + per-grid-STEP
      re-masking: 6 maps × n_d re-selects);
    * ``b``/``grmu`` accumulate at the extended row extent, so the
      gradient-combine box filters (the old 4×``box2d`` XLA epilogue)
      run in-kernel per tile with no cross-tile halo, and the kernel
      emits ONE finished gradient map instead of three partial ones.
    """
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    p = k // 2
    pa = _round_up(p, 8)
    hbe = hb + 2 * p
    band_rows = _round_up(hbe + 2 * p, 8)
    inv_k2 = 1.0 / float(k * k)
    # Static row offset of the extended (±p) window inside the map
    # buffers under the all-aligned staging below.
    q = 2 * pa - p

    @pl.when(d_idx == 0)
    def _load_and_stats():
        r0 = h_idx * hb
        cam_dma = pltpu.make_async_copy(
            cam_hbm.at[pl.ds(r0, band_rows), :], cam_vmem, sems.at[0])
        proj_dma = pltpu.make_async_copy(
            proj_hbm.at[pl.ds(r0, band_rows), :], proj_vmem, sems.at[1])
        # ALL-ALIGNED map staging: copy R = hb + 2·pa rows from the
        # 8-aligned source offset r0 − pa, with the edge clamp folded
        # into the (8-aligned) DMA DESTINATION offset, so source row
        # (r0 − p) + j always lands at STATIC buffer row q + j.  The
        # maps stay plain 2D: the earlier [rows, 1, w] unit-dim trick
        # (untiled dim 0) was Mosaic-legal but stored one sublane per
        # 8-sublane tile — 8× the HBM DMA bytes and 8× the VMEM read
        # cost, measured ~3 ms of the kernel at KITTI shape
        # (scripts/sweep4_bwdc_ablate.py: full 6.46 → maps2d 3.48).
        rows = hb + 2 * pa
        s0m = pl.multiple_of(jnp.clip(r0 - pa, 0, maps_rows - rows), 8)
        o_m = pl.multiple_of(pa - ((r0 - pa) - s0m), 8)
        srcs = [am_hbm, s_hbm, t_hbm, gs_hbm, gc_hbm, mask_hbm]
        dsts = [am_b, is_b, tos_b, gs_b, gc_b, mk_b]
        if not unnormalized:
            srcs.append(conf_hbm)
            dsts.append(m_b)
        copies = [pltpu.make_async_copy(
            src.at[pl.ds(s0m, rows)], dst.at[pl.ds(o_m, rows)],
            sems.at[2 + i]) for i, (src, dst) in enumerate(zip(srcs, dsts))]
        cam_dma.start()
        proj_dma.start()
        for cp in copies:
            cp.start()
        cam_dma.wait()
        proj_dma.wait()
        for cp in copies:
            cp.wait()

        cam = cam_vmem[:, :]
        sx = _box_from_band(cam, k, hbe, woe)
        sx_scr[:, :] = sx[:, p:p + wo] * inv_k2     # μx (epilogue)
        ex2 = _box_from_band(cam * cam, k, hbe, woe) - sx * sx * inv_k2
        ex2_scr[:, :] = ex2[:, p:p + wo]            # center columns only
        proj = proj_vmem[:, :]
        sy = _box_from_band(proj, k, hbe, syw)
        sy_scr[:, :] = sy * inv_k2                  # μy, pre-scaled
        ey2_scr[:, :] = (_box_from_band(proj * proj, k, hbe, syw)
                         - sy * sy * inv_k2)

        # Head derivations + out-of-image masking, ONCE per row tile
        # (the per-plane loop then reads them back verbatim).  Rows the
        # clamped DMA left stale hold garbage; every transform routes
        # through the same where(ok, ·, 0) select, so garbage (even
        # Inf/NaN) never escapes.
        trow2 = lax.broadcasted_iota(jnp.int32, (hbe, wo), 0) + (r0 - p)
        tcol = lax.broadcasted_iota(jnp.int32, (hbe, wo), 1)
        ok = jnp.logical_and(
            jnp.logical_and(trow2 >= 0, trow2 < H), tcol < W)
        csl = pl.ds(q, hbe)
        am_b[csl] = jnp.where(ok, am_b[csl], 0.0)
        inv_s = jnp.where(ok, 1.0 / is_b[csl], 0.0)
        is_b[csl] = inv_s
        tos_b[csl] = jnp.where(ok, tos_b[csl] * inv_s, 0.0)
        gs_b[csl] = jnp.where(ok, gs_b[csl] * mk_b[csl], 0.0) * beta
        gc_b[csl] = jnp.where(ok, gc_b[csl], 0.0)
        if not unnormalized:
            m_b[csl] = jnp.where(ok, m_b[csl], 0.0)

        a1_scr[:, :] = jnp.zeros((hb, wo), a1_scr.dtype)
        b_scr[:, :] = jnp.zeros((hbe, wo), b_scr.dtype)
        grmu_scr[:, :] = jnp.zeros((hbe, wo), grmu_scr.dtype)
        gr_scr[:, 0:p] = jnp.zeros((hbe, p), gr_scr.dtype)
        gr_scr[:, p + wo:woe] = jnp.zeros((hbe, woe - wo - p),
                                          gr_scr.dtype)

    r0 = h_idx * hb

    # Double-buffered cost prefetch: step s consumes the tile its
    # PREVIOUS step started (slot s % 2) and immediately launches step
    # s+1's DMA into the other slot — the per-step DMA otherwise stalls
    # ~20% of the plane loop (the bands amortize over a whole row tile;
    # the cost tile cannot).  Plane-major residual (round 4): rows are a
    # tiled dim, so stage from the 8-aligned offset r0 − pa with the
    # clamp folded into the destination offset (static read row qv + t).
    pa = _round_up(p, 8)
    crows = hb + 2 * pa
    qv = 2 * pa - p

    def _issue_c(hi, di, sl):
        r0i = hi * hb
        s0i = pl.multiple_of(jnp.clip(r0i - pa, 0, g_rows - crows), 8)
        o_c = pl.multiple_of(pa - ((r0i - pa) - s0i), 8)
        return pltpu.make_async_copy(
            c_hbm.at[pl.ds(di * dt, dt), pl.ds(s0i, crows), :],
            c_vmem.at[sl, :, pl.ds(o_c, crows)],
            sems.at[9 + sl])

    step = h_idx * n_d + d_idx
    slot = lax.rem(step, 2)

    @pl.when(step == 0)
    def _first_c():
        _issue_c(h_idx, d_idx, slot).start()

    nstep = step + 1

    @pl.when(nstep < pl.num_programs(0) * n_d)
    def _prefetch_c():
        _issue_c(nstep // n_d, lax.rem(nstep, n_d),
                 lax.rem(nstep, 2)).start()

    ex2 = ex2_scr[:, :]                             # [hbe, wo]

    d_base = d_idx * dt
    shift = lp - (d_base + dt - 1)
    psh = pltpu.roll(proj_vmem[:, :], pw - shift, axis=1)
    syb = pltpu.roll(sy_scr[:, :], syw - shift, axis=1)
    ey2b = pltpu.roll(ey2_scr[:, :], syw - shift, axis=1)

    _issue_c(h_idx, d_idx, slot).wait()

    trow = lax.broadcasted_iota(jnp.int32, (hbe, 1), 0)
    rmask = jnp.logical_and(trow + (r0 - p) >= 0,
                            trow + (r0 - p) < g_rows)

    csl = pl.ds(q, hbe)
    inv_s_e = is_b[csl]
    tos_e = tos_b[csl]
    am_e = am_b[csl]
    gs_e = gs_b[csl]        # ĝ_soft · mask · β
    gc_e = gc_b[csl]        # ĝ_conf
    m_e = None if unnormalized else m_b[csl]

    def plane(j):
        c0 = dt - 1 - j
        ey2c = ey2b[:, c0 + p:c0 + p + wo]          # [hbe, wo]
        r = lax.rsqrt(ex2 * ey2c + eps)
        c_t = jnp.where(rmask, c_vmem[slot, j, qv:qv + hbe, :], 0.0)
        d_f = jnp.float32(0) + (d_base + j)
        # Guard out-of-image positions in normalized mode (m_e = 0 there
        # but c_t can be ~1: exp(β·c) overflows; Inf·0 = NaN).
        arg = beta * c_t if unnormalized else beta * (c_t - m_e)
        w = jnp.where(inv_s_e > 0.0, jnp.exp(arg), 0.0) * inv_s_e
        g_d = gs_e * w * (d_f - tos_e) + gc_e * (am_e == d_f)

        gr = g_d * r
        gr_scr[:, p:p + wo] = gr
        boxgr = _box_from_band(gr_scr[:, :], k, hb, wo)
        a1_scr[:, :] = a1_scr[:, :] + boxgr * psh[2 * p:2 * p + hb,
                                                  c0 + 2 * p:c0 + 2 * p + wo]
        # b / grmu accumulate at the EXTENDED row extent: the epilogue's
        # box filters then need no cross-tile halo (rows outside the
        # image contribute exact zeros — g_d is masked to zero there).
        r_c = r
        b_scr[:, :] = b_scr[:, :] + (g_d * c_t * (r_c * r_c) * ey2c)
        grmu_scr[:, :] = grmu_scr[:, :] + gr * syb[:, c0 + p:c0 + p + wo]

    # Planes beyond D are skipped STATICALLY: the forward never writes
    # them (their HBM bytes are uninitialized), and the head cotangent
    # formula does not apply to planes the head never saw.  Tiles below
    # ``nf`` are fully valid; tile ``nf`` holds the ``rem`` last valid
    # planes; later tiles (a 16-rounded volume declaration consumed by a
    # dt=8 backward) do nothing.  This decouples the backward's tile
    # choice from the forward's plane declaration.
    if rem == 0 and nf == n_d:
        for j in range(dt):
            plane(j)
    else:
        @pl.when(d_idx < nf)
        def _full_tile():
            for j in range(dt):
                plane(j)

        if rem:
            @pl.when(d_idx == nf)
            def _partial_tile():
                for j in range(rem):
                    plane(j)

    @pl.when(d_idx == n_d - 1)
    def _epilogue():
        # grad = A1 − box(grmu) + box(b·μx) − camera · box(b), evaluated
        # per tile on the extended-row accumulators (the old XLA
        # epilogue).  gr_scr's zero column margins serve the ±p column
        # reach of each box; it is staged three times sequentially.
        gr_scr[:, p:p + wo] = grmu_scr[:, :]
        t2 = _box_from_band(gr_scr[:, :], k, hb, wo)
        gr_scr[:, p:p + wo] = b_scr[:, :] * sx_scr[:, :]
        t3 = _box_from_band(gr_scr[:, :], k, hb, wo)
        gr_scr[:, p:p + wo] = b_scr[:, :]
        t4 = _box_from_band(gr_scr[:, :], k, hb, wo)
        cam_c = cam_vmem[2 * p:2 * p + hb, 2 * p:2 * p + wo]
        grad_ref[:, :] = (a1_scr[:, :] - t2) + (t3 - cam_c * t4)


def _fused_train_bwd_c_impl(camera, projector, residual_maps, cost,
                            D, k, eps, beta, block_rows, interpret):
    """Driver for the cost-residual fused backward.

    ``residual_maps`` is the 7-tuple ``(am, mask, conf, s, t, gsoft_pad,
    gconf_pad)`` of raw ``[h_pad, wo]`` forward residuals and zero-padded
    cotangents; all head derivations, masking, and the gradient-combine
    box filters run inside the kernel (no XLA stack/epilogue — the
    kernel returns the finished padded gradient, cropped here)."""
    H, W = camera.shape
    p = k // 2
    hb = _round_up(int(block_rows), 8)
    # Plane-major residual volume [n_planes, g_rows, wo] (round 4).
    g_rows = cost.shape[1]
    # No row tile may straddle the volume's padded extent (clamped DMA
    # would deliver shifted rows for in-range outputs).
    while hb > 8 and -(-H // hb) * hb > max(g_rows, H):
        hb -= 8
    hbe = hb + 2 * p
    n_planes = cost.shape[0]
    wo = _round_up(max(W, 128), 128)
    woe = wo + 2 * p
    wcc = _round_up(woe + 2 * p, 128)
    lp = _round_up(max(D + 1, n_planes), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)
    dt = bwd_c_disparity_tile(W, D, k, hb, n_planes)
    if n_planes % dt:
        # n_d = n_planes // dt would silently truncate: planes
        # [n_d*dt, n_planes) would never be accumulated — a wrong gradient
        # with no error.  The internal forwards always declare 8-multiple
        # plane counts, so this only fires for externally-built residuals.
        raise ValueError(
            f"cost volume plane count {n_planes} is not a multiple of the "
            f"backward disparity tile dt={dt}; pad the volume's plane axis "
            f"to a multiple of 8 (extra planes beyond D+1 are skipped)")
    n_d = n_planes // dt
    if n_planes < D + 1:
        raise ValueError(
            f"cost volume has {n_planes} planes < D+1 = {D + 1}")

    n_h = -(-H // hb)
    h_pad = n_h * hb
    band_rows = _round_up(hbe + 2 * p, 8)
    src_rows = h_pad + band_rows

    cam_p = jnp.zeros((src_rows, wcc), camera.dtype)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (2 * p, 2 * p))
    proj_p = jnp.zeros((src_rows, pw), projector.dtype)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (2 * p, lp + 2 * p))

    maps = list(residual_maps)
    maps_rows = maps[0].shape[0]
    # The aligned staging copies hb + 2·pa rows per tile from 8-aligned
    # offsets, so the maps must span at least that many rows, rounded
    # to the sublane multiple.
    pa = _round_up(p, 8)
    need_rows = _round_up(max(maps_rows, hb + 2 * pa), 8)
    if need_rows > maps_rows:
        maps = [jnp.pad(m, ((0, need_rows - maps_rows), (0, 0)))
                for m in maps]
        maps_rows = need_rows
    if g_rows < hb + 2 * pa:
        cost = jnp.pad(cost,
                       ((0, 0), (0, hb + 2 * pa - g_rows), (0, 0)))
        g_rows = hb + 2 * pa

    unnormalized = _unnormalized_head(beta, D)
    kernel = functools.partial(
        _fused_bwd_c_kernel, H=H, W=W, D=D, k=k, eps=float(eps),
        beta=float(beta), unnormalized=unnormalized, hb=hb, dt=dt,
        wo=wo, woe=woe, wcc=wcc, pw=pw,
        syw=syw, lp=lp, maps_rows=maps_rows, g_rows=g_rows,
        nf=(D + 1) // dt, rem=(D + 1) % dt)

    map_spec = pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)
    am, mask, conf, s, t, gsoft_p, gconf_p = maps
    grad = pl.pallas_call(
        kernel,
        grid=(n_h, n_d),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 10,
        out_specs=map_spec,
        out_shape=jax.ShapeDtypeStruct((h_pad, wo), camera.dtype),
        scratch_shapes=[
            pltpu.VMEM((band_rows, wcc), camera.dtype),       # camera
            pltpu.VMEM((band_rows, pw), camera.dtype),        # projector
            pltpu.VMEM((2, dt, hb + 4 * pa, wo),
                       camera.dtype),                # cost tile (2 slots)
            pltpu.VMEM((hbe, woe), camera.dtype),             # gr margins
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # am
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # 1/s
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # t/s
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # ĝs·mask·β
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # ĝc
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # m (norm.)
            pltpu.VMEM((hb + 4 * pa, wo), camera.dtype),      # mask stage
            pltpu.VMEM((hbe, wo), camera.dtype),              # μx
            pltpu.VMEM((hbe, wo), camera.dtype),              # ex2
            pltpu.VMEM((hbe, syw), camera.dtype),             # μy
            pltpu.VMEM((hbe, syw), camera.dtype),             # ey2
            pltpu.VMEM((hb, wo), camera.dtype),               # A1
            pltpu.VMEM((hbe, wo), camera.dtype),              # B (ext)
            pltpu.VMEM((hbe, wo), camera.dtype),              # GRMU (ext)
            pltpu.SemaphoreType.DMA((11,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * k * H * W * (D + 1),
            bytes_accessed=H * W * (D + 1) * 4 + 2 * H * W * 4,
            transcendentals=2 * H * W * (D + 1),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=interpret,
    )(cam_p, proj_p, am, mask, conf, s, t, gsoft_p, gconf_p, cost)

    return grad[:H, :W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _fused_train(camera, projector, num_disparities, kernel_size, epsilon,
                 beta, threshold, interpret, bwd_block_rows):
    return _pipeline_forward(camera, projector, num_disparities,
                             kernel_size, epsilon, beta, threshold,
                             32, 40, interpret)


def _fused_train_fwd(camera, projector, num_disparities, kernel_size,
                     epsilon, beta, threshold, interpret, bwd_block_rows):
    H, W = camera.shape
    am, soft, mask, conf, s, t = _pipeline_forward_full(
        camera, projector, num_disparities, kernel_size, epsilon, beta,
        threshold, 32, 40, interpret)
    out = PipelineMaps(disparity=am[:H, :W] * mask[:H, :W],
                       soft_disparity=soft[:H, :W], mask=mask[:H, :W],
                       confidence=conf[:H, :W])
    return out, (camera, projector, am, mask, conf, s, t)


def _fused_train_bwd(num_disparities, kernel_size, epsilon, beta, threshold,
                     interpret, bwd_block_rows, residuals, g):
    camera, projector, am, mask, conf, s, t = residuals
    H, W = camera.shape
    h_pad, wo = am.shape
    # Hard disparity and mask are piecewise-constant (zero grad a.e.);
    # soft and confidence cotangents flow.  The only XLA prep is
    # zero-padding the two cotangents to the padded map extent — head
    # derivations (1/s, t/s, β·mask premul), masking, and the
    # gradient-combine boxes all run inside the kernel.
    gsoft_p = jnp.zeros((h_pad, wo), camera.dtype).at[:H, :W].set(
        g.soft_disparity)
    gconf_p = jnp.zeros((h_pad, wo), camera.dtype).at[:H, :W].set(
        g.confidence)
    cam_grad = _fused_train_bwd_impl(
        camera, projector, (am, mask, conf, s, t, gsoft_p, gconf_p),
        num_disparities, kernel_size, epsilon, beta,
        bwd_block_rows or 48, 8, interpret)
    return cam_grad, jnp.zeros_like(projector)


_fused_train.defvjp(_fused_train_fwd, _fused_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _fused_train_v(camera, projector, num_disparities, kernel_size,
                   epsilon, beta, threshold, interpret, bwd_block_rows):
    return _pipeline_forward(camera, projector, num_disparities,
                             kernel_size, epsilon, beta, threshold,
                             48, 8, interpret)


def _fused_train_v_fwd(camera, projector, num_disparities, kernel_size,
                       epsilon, beta, threshold, interpret, bwd_block_rows):
    H, W = camera.shape
    am, soft, mask, conf, s, t, cv = _pipeline_forward_full(
        camera, projector, num_disparities, kernel_size, epsilon, beta,
        threshold, 48, 8, interpret, write_volume=True)
    out = PipelineMaps(disparity=am[:H, :W] * mask[:H, :W],
                       soft_disparity=soft[:H, :W], mask=mask[:H, :W],
                       confidence=conf[:H, :W])
    return out, (camera, projector, am, mask, conf, s, t, cv)


def _fused_train_v_bwd(num_disparities, kernel_size, epsilon, beta,
                       threshold, interpret, bwd_block_rows, residuals, g):
    camera, projector, am, mask, conf, s, t, cv = residuals
    h_pad, wo = am.shape
    H, W = camera.shape
    # The only XLA prep left: zero-pad the two cotangents to the padded
    # map extent.  Head derivations (1/s, t/s, β·mask premul), masking,
    # and the gradient-combine boxes all run inside the kernel.
    gsoft_p = jnp.zeros((h_pad, wo), camera.dtype).at[:H, :W].set(
        g.soft_disparity)
    gconf_p = jnp.zeros((h_pad, wo), camera.dtype).at[:H, :W].set(
        g.confidence)
    cam_grad = _fused_train_bwd_c_impl(
        camera, projector, (am, mask, conf, s, t, gsoft_p, gconf_p), cv,
        num_disparities, kernel_size, epsilon, beta,
        bwd_block_rows or 48, interpret)
    return cam_grad, jnp.zeros_like(projector)


_fused_train_v.defvjp(_fused_train_v_fwd, _fused_train_v_bwd)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def stereo_pipeline_trainable(
    camera: jax.Array,
    projector: jax.Array,
    num_disparities: int,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
    beta: float = 50.0,
    threshold: float = 0.6,
    interpret: bool = False,
    save_volume: bool = True,
    bwd_block_rows: int = 0,
) -> PipelineMaps:
    """Differentiable fused pipeline: pair → disparity maps; the
    cost-volume COTANGENT never exists in HBM in either mode.

    Camera gradients flow through ``soft_disparity`` and ``confidence``
    (``disparity``/``mask`` are piecewise-constant — zero gradient a.e.,
    the same as differentiating through argmax/threshold in any
    framework).  The projector gradient is a symbolic zero (reference
    parity, custma/stereo_matching_wrapper.py:33).

    ``save_volume=True`` (default, fastest): the forward streams the
    cost volume to HBM as a backward residual, so the backward skips the
    per-plane cross-term recompute entirely (``n·r = c``) — one volume
    write buys back the dominant backward cost.  ``save_volume=False``
    is fully volume-free in BOTH directions (the original design): the
    backward recomputes each cost plane from the images; residuals are
    six per-pixel maps.  Use it when HBM is the constraint (e.g. large
    batches of concurrent frames).

    ``bwd_block_rows`` overrides the backward kernel's row tile (0 =
    the KITTI-tuned default, 48 in both modes);
    see :func:`..tuning.autotune_trainable_bwd_blocks`.
    """
    if save_volume:
        return _fused_train_v(camera, projector, num_disparities,
                              kernel_size, epsilon, beta, threshold,
                              interpret, bwd_block_rows)
    return _fused_train(camera, projector, num_disparities, kernel_size,
                        epsilon, beta, threshold, interpret,
                        bwd_block_rows)
