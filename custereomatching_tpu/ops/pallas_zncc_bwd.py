"""Pallas TPU kernel for the banded ZNCC backward pass (camera VJP).

The reference's backward is its raison d'être: a hand-derived analytic
gradient in two CUDA kernels that scatter H·W·D·k² atomicAdd
contributions through an ``[H, W, k, k]`` intermediate (reference:
custma/src/stereo_matching_kernel.cu:75-179).  TPUs have no atomics; per
survey §7.4 the VJP is evaluated in closed form as gathers + box filters
— the scatter/race class is eliminated by construction.

Math (cf. :func:`..zncc._camera_grad_banded`, verified against
``jax.grad`` of the golden oracle): with ``n = exy + ε``,
``r = (ex2·ey2 + ε)^{-1/2}``, upstream cotangent ``g[h, w, d]``::

    gr    = g · r
    B     = Σ_d g · n · r³ · ey2          (per-pixel scalar field)
    GRMU  = Σ_d gr · μy(d)                (per-pixel scalar field)
    A1    = Σ_d box2d(gr)[h, w, d] · proj[h, w − d]
    cam_grad = A1 − box2d(GRMU) + box2d(B·μx) − camera ⊙ box2d(B)

The kernel computes the three **D-reduced fields** A1/B/GRMU — the only
volume-sized work — by rematerializing the forward statistics per tile
(the residuals are just the two images, matching the reference's
``ctx.save_for_backward``, custma/stereo_matching_wrapper.py:16) and
folding each cotangent plane into accumulators as it streams in.  The
with-cost path finishes the gradient combine in-kernel (extended-row
accumulators, one output map); the no-cost remat path emits the three
partial fields and runs the final ``[H, W]`` box filters in XLA (~0.1%
of its work).

Because ``box2d(gr)`` at a tile's rows needs ``gr`` (hence the forward
statistics) at rows ±k//2 around the tile, the per-tile recompute runs at
the **halo-extended extent**; the duplicated halo work is the remat cost,
the same trade the reference makes by recomputing means/moments in its
backward kernel (kernel.cu:97-128).
"""

from __future__ import annotations

import functools

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


def _bwd_kernel(*refs,
                D: int, k: int, eps: float, hb: int, dt: int,
                wo: int, woe: int, wcc: int, pw: int, syw: int, lp: int,
                direct_g: bool, g_rows: int, n_last: int,
                have_c: bool):
    """``direct_g=False``: the cotangent source is pre-padded to band
    coordinates ``[src_rows, n_d·dt, wcc]`` (image at offset (2p, 0, 2p)).
    ``direct_g=True``: the cotangent is the kernel's own padded
    plane-major volume ``[n_d·dt, g_rows, wo]`` (round 4; rows-major
    until round 3) with NO margins — rows are a TILED dim of that
    layout, so the halo'd row window is staged from an 8-aligned source
    offset with the clamp folded into the (8-aligned) destination
    offset, putting the window at the STATIC buffer offset ``2·pa − p``;
    out-of-image halo rows are masked to zero in-register.  This avoids
    any XLA-side pad of the ~0.5 GB cotangent (measured ~3.7 ms,
    dwarfing the copy's bandwidth cost), and each plane's read is a
    dense 2D tile instead of one sublane per (dt, 128) tile.

    Layout notes for the per-plane hot loop:
      * every elementwise operand is stored at the aligned center-column
        width ``wo`` (``μx``/``ex2`` pre-sliced at stats time) — only the
        box-filter inputs carry the ±p column halo;
      * ``sy`` is stored pre-scaled by 1/k² (``μy``); the cross term uses
        raw ``sx`` against it, saving a multiply per plane;
      * ``gr = g·r`` is written into the zero-margined ``gr_scr`` so the
        box filter sees its halo columns without a per-plane concat.

    ``have_c=True`` (direct_g only): the FORWARD COST VOLUME is supplied
    as a residual alongside the cotangent.  Because ``n·r = c``, the
    B-term becomes ``g·c·ey2·r²`` — the entire per-plane cross-term
    recompute (``prod``/``sxy`` box passes, the dominant cost) vanishes,
    traded for one aligned, correction-free DMA read of ``c``'s center
    rows.
    """
    if have_c:
        # have_c implies direct_g (enforced by _run_bwd), and the
        # with-cost path always emits ONE finished gradient: b/grmu
        # accumulate at the EXTENDED row extent so the gradient-combine
        # box filters run in-kernel with no cross-tile halo (the fused
        # trainable backward's design,
        # pallas_pipeline.py::_fused_bwd_c_kernel).
        (cam_hbm, proj_hbm, g_hbm, c_hbm, grad_ref,
         cam_vmem, proj_vmem, g_vmem, c_vmem, gr_scr, sx_scr, ex2_scr,
         sy_scr, ey2_scr, a1_scr, b_scr, grmu_scr, sems) = refs
    else:
        (cam_hbm, proj_hbm, g_hbm, a1_ref, b_ref, grmu_ref,
         cam_vmem, proj_vmem, g_vmem, gr_scr, sx_scr, ex2_scr,
         sy_scr, ey2_scr, a1_scr, b_scr, grmu_scr, sems) = refs
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    p = k // 2
    hbe = hb + 2 * p                     # extended (halo'd) output rows
    band_rows = _round_up(hbe + 2 * p, 8)
    inv_k2 = 1.0 / float(k * k)

    @pl.when(d_idx == 0)
    def _load_and_stats():
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
        sx = _box_from_band(cam, k, hbe, woe)
        ex2 = _box_from_band(cam * cam, k, hbe, woe) - sx * sx * inv_k2
        # Store only the aligned center columns (all elementwise uses).
        # The with-cost path consumes sx only as μx in the in-kernel
        # epilogue (the cost residual replaces the cross term), so
        # pre-scale it; the no-cost path pairs RAW Σx with the
        # pre-scaled μy.
        sx_scr[:, :] = (sx[:, p:p + wo] * inv_k2 if have_c
                        else sx[:, p:p + wo])
        ex2_scr[:, :] = ex2[:, p:p + wo]
        proj = proj_vmem[:, :]
        sy = _box_from_band(proj, k, hbe, syw)
        sy_scr[:, :] = sy * inv_k2       # μy — pre-scaled
        ey2_scr[:, :] = (_box_from_band(proj * proj, k, hbe, syw)
                         - sy * sy * inv_k2)

        a1_scr[:, :] = jnp.zeros((hb, wo), a1_scr.dtype)
        acc_rows = hbe if have_c else hb
        b_scr[:, :] = jnp.zeros((acc_rows, wo), b_scr.dtype)
        grmu_scr[:, :] = jnp.zeros((acc_rows, wo), grmu_scr.dtype)
        # gr_scr's column margins are its box halo: zero once; the hot
        # loop only ever writes the center columns.
        gr_scr[:, 0:p] = jnp.zeros((hbe, p), gr_scr.dtype)
        gr_scr[:, p + wo:woe] = jnp.zeros((hbe, woe - wo - p),
                                          gr_scr.dtype)

    # Cotangent planes for this (row tile, disparity tile).  The
    # direct-DMA path double-buffers: step s consumes the tile its
    # previous step started and immediately launches step s+1's DMA into
    # the other slot (the per-step transfers otherwise stall ~15-20% of
    # the plane loop; the band DMAs amortize over a whole row tile, the
    # per-step cotangent/cost tiles cannot).
    r0 = h_idx * hb
    step = h_idx * n_d + d_idx
    slot = lax.rem(step, 2)

    pa = _round_up(p, 8)
    crows = hb + 2 * pa                    # staged rows (8-multiple)
    qc = 2 * pa - p                        # static buffer row of r0 − p

    def _issue(hi, di, sl):
        r0i = hi * hb
        copies = []
        if direct_g:
            # Plane-major source: rows are tiled, so stage crows rows
            # from the 8-aligned offset r0 − pa with the edge clamp
            # folded into the (8-aligned) destination offset — image row
            # r0 − p + t then sits at the STATIC buffer row qc + t.
            s0i = pl.multiple_of(
                jnp.clip(r0i - pa, 0, g_rows - crows), 8)
            o_g = pl.multiple_of(pa - ((r0i - pa) - s0i), 8)
            copies.append(pltpu.make_async_copy(
                g_hbm.at[pl.ds(di * dt, dt), pl.ds(s0i, crows), :],
                g_vmem.at[sl, :, pl.ds(o_g, crows)], sems.at[2 + sl]))
        else:
            copies.append(pltpu.make_async_copy(
                g_hbm.at[pl.ds(r0i, band_rows), pl.ds(di * dt, dt), :],
                g_vmem.at[sl], sems.at[2 + sl]))
        if have_c:
            # Extended rows, same addressing as the cotangent: the
            # ext-extent B term needs c at the halo rows too.
            s0c = pl.multiple_of(
                jnp.clip(r0i - pa, 0, g_rows - crows), 8)
            o_c = pl.multiple_of(pa - ((r0i - pa) - s0c), 8)
            copies.append(pltpu.make_async_copy(
                c_hbm.at[pl.ds(di * dt, dt), pl.ds(s0c, crows), :],
                c_vmem.at[sl, :, pl.ds(o_c, crows)], sems.at[4 + sl]))
        return copies

    @pl.when(step == 0)
    def _first():
        for cp in _issue(h_idx, d_idx, slot):
            cp.start()

    nstep = step + 1

    @pl.when(nstep < pl.num_programs(0) * n_d)
    def _prefetch():
        for cp in _issue(nstep // n_d, lax.rem(nstep, n_d),
                         lax.rem(nstep, 2)):
            cp.start()

    band = cam_vmem[:, :]
    mux_raw = sx_scr[:, :]               # raw Σx at center columns
    ex2 = ex2_scr[:, :]                  # [hbe, wo]

    d_base = d_idx * dt
    shift = lp - (d_base + dt - 1)
    psh = pltpu.roll(proj_vmem[:, :], pw - shift, axis=1)
    syb = pltpu.roll(sy_scr[:, :], syw - shift, axis=1)
    ey2b = pltpu.roll(ey2_scr[:, :], syw - shift, axis=1)

    for cp in _issue(h_idx, d_idx, slot):
        cp.wait()

    if direct_g:
        # Halo rows outside the cotangent's extent read stale buffer
        # content (the clamped DMA never wrote them) — mask to zero.
        trow = lax.broadcasted_iota(jnp.int32, (hbe, 1), 0)
        rmask = jnp.logical_and(trow + (r0 - p) >= 0,
                                trow + (r0 - p) < g_rows)

    def plane(j):
        c0 = dt - 1 - j
        # r is needed at the EXTENDED row extent (box2d(g·r) reaches ±p
        # rows) but only at center columns (gr's column margins are the
        # zero halo of gr_scr); exy feeds n at the CENTER extent only —
        # so the expensive sxy box pass runs center-sized and every
        # elementwise op runs at the aligned width wo.
        ey2c = ey2b[:, c0 + p:c0 + p + wo]                  # [hbe, wo]
        r = lax.rsqrt(ex2 * ey2c + eps)
        if not have_c:
            muy_c = syb[p:p + hb, c0 + p:c0 + p + wo]       # μy (scaled)

        if not have_c:
            # Center-extent cross term via the box pass's free output
            # offsets (center row t ↔ band row t + p; image col w ↔ band
            # col w + 2p) — no band slicing, hence no per-plane relayout.
            prod = band * psh[:, c0:c0 + wcc]
            sxy_c = _box_from_band(prod, k, hb, wo, row_start=p,
                                   col_start=p)
            n_c = sxy_c - mux_raw[p:p + hb, :] * muy_c + eps

        if direct_g:
            raw = jnp.where(rmask,
                            g_vmem[slot, j, qc:qc + hbe, :],
                            0.0)                            # [hbe, wo]
        else:
            # Pre-padded band coordinates: band row s ↔ image row
            # r0 + s − 2p ⇒ image col w sits at band col w + 2p.
            raw = g_vmem[slot, p:p + hbe, j, 2 * p:2 * p + wo]
        grv = raw * r
        gr_scr[:, p:p + wo] = grv
        gr = gr_scr[:, :]                                   # [hbe, woe]

        # A1: box2d(gr) at center rows ⊙ proj[y, x − d] (band offset 2p).
        boxgr = _box_from_band(gr, k, hb, wo)
        a1_scr[:, :] = a1_scr[:, :] + boxgr * psh[2 * p:2 * p + hb,
                                                  c0 + 2 * p:c0 + 2 * p + wo]

        if have_c:
            # b/grmu at the EXTENDED row extent: the in-kernel combine
            # boxes then need no cross-tile halo (rows outside the image
            # contribute exact zeros — the cotangent is zero there by
            # contract, so raw is).  n·r³·ey2 = c·r²·ey2.
            c_t = jnp.where(rmask,
                            c_vmem[slot, j, qc:qc + hbe, :],
                            0.0)                            # [hbe, wo]
            b_scr[:, :] = b_scr[:, :] + ((raw * c_t)
                                         * ((r * r) * ey2c))
            grmu_scr[:, :] = grmu_scr[:, :] + grv * syb[:,
                                                        c0 + p:c0 + p + wo]
            return
        r_c = r[p:p + hb, :]
        b_scr[:, :] = b_scr[:, :] + (raw[p:p + hb, :] * n_c
                                     * (r_c * r_c * r_c)
                                     * ey2c[p:p + hb, :])
        grmu_scr[:, :] = grmu_scr[:, :] + (raw[p:p + hb, :] * r_c) * muy_c

    if n_last == dt:
        for j in range(dt):
            plane(j)
    else:
        # Planes beyond D carry a zero cotangent by contract — skip them
        # in the last disparity tile.
        @pl.when(d_idx != n_d - 1)
        def _full_tile():
            for j in range(dt):
                plane(j)

        @pl.when(d_idx == n_d - 1)
        def _last_tile():
            for j in range(n_last):
                plane(j)

    if have_c:
        @pl.when(d_idx == n_d - 1)
        def _fused_epilogue():
            # grad = A1 − box(grmu) + box(b·μx) − camera ⊙ box(b) on the
            # extended-row accumulators; gr_scr's zero column margins
            # serve the ±p column reach (staged three times
            # sequentially, exactly the fused trainable backward's
            # epilogue).
            gr_scr[:, p:p + wo] = grmu_scr[:, :]
            t2 = _box_from_band(gr_scr[:, :], k, hb, wo)
            gr_scr[:, p:p + wo] = b_scr[:, :] * sx_scr[:, :]
            t3 = _box_from_band(gr_scr[:, :], k, hb, wo)
            gr_scr[:, p:p + wo] = b_scr[:, :]
            t4 = _box_from_band(gr_scr[:, :], k, hb, wo)
            cam_c = cam_vmem[2 * p:2 * p + hb, 2 * p:2 * p + wo]
            grad_ref[:, :] = (a1_scr[:, :] - t2) + (t3 - cam_c * t4)
    else:
        @pl.when(d_idx == n_d - 1)
        def _epilogue():
            a1_ref[:, :] = a1_scr[:, :]
            b_ref[:, :] = b_scr[:, :]
            grmu_ref[:, :] = grmu_scr[:, :]


def _run_bwd(camera, projector, g_src, D, k, eps, hb, dt, n_d,
             interpret, direct_g, cost=None):
    """Shared driver: build band sources, run the kernel, XLA epilogue.

    ``cost`` (direct_g only): the forward volume in the same padded-HDW
    layout as ``g_src`` — enables the recompute-free B-term (``have_c``).
    """
    have_c = cost is not None
    if have_c and not direct_g:
        raise ValueError("cost residual requires the direct-DMA layout")
    if direct_g:
        # No row tile may straddle the volume's padded extent: the
        # clamped DMA would deliver shifted rows for in-range outputs.
        # (Plane-major cotangent: rows live on axis 1.)
        H0 = camera.shape[0]
        while hb > 8 and -(-H0 // hb) * hb > max(g_src.shape[1], H0):
            hb -= 8
    H, W = camera.shape
    p = k // 2
    hbe = hb + 2 * p

    wo = _round_up(max(W, 128), 128)
    woe = wo + 2 * p                       # extended output columns
    wcc = _round_up(woe + 2 * p, 128)      # camera band width
    lp = _round_up(max(D + 1, n_d * dt), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)

    n_h = -(-H // hb)
    h_pad = n_h * hb
    band_rows = _round_up(hbe + 2 * p, 8)
    src_rows = h_pad + band_rows

    # Band sources.  Note the extended extent: ext col 0 ↔ image col −p,
    # so images sit at column offset 2p of the camera band (p for the
    # extension + p for the window halo).
    cam_p = jnp.zeros((src_rows, wcc), camera.dtype)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (2 * p, 2 * p))
    proj_p = jnp.zeros((src_rows, pw), projector.dtype)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (2 * p, lp + 2 * p))

    pa = _round_up(p, 8)
    crows = hb + 2 * pa
    g_rows = g_src.shape[1] if direct_g else g_src.shape[0]
    if direct_g and g_rows < crows:
        # Tiny inputs only: the aligned staging needs at least crows
        # source rows.
        g_src = jnp.pad(g_src, ((0, 0), (0, crows - g_rows), (0, 0)))
        if have_c:
            cost = jnp.pad(cost, ((0, 0), (0, crows - g_rows), (0, 0)))
        g_rows = crows
    if have_c and cost.shape != g_src.shape:
        raise ValueError(
            f"cost residual shape {cost.shape} != cotangent {g_src.shape}")

    # Two slots: double-buffered per-step prefetch (see _bwd_kernel).
    if direct_g:
        g_scratch = pltpu.VMEM((2, dt, hb + 4 * pa, wo), camera.dtype)
    else:
        g_scratch = pltpu.VMEM((2, band_rows, dt, wcc), camera.dtype)

    kernel = functools.partial(
        _bwd_kernel, D=D, k=k, eps=float(eps), hb=hb, dt=dt,
        wo=wo, woe=woe, wcc=wcc, pw=pw, syw=syw, lp=lp,
        direct_g=direct_g, g_rows=g_rows,
        n_last=min(dt, max(1, (D + 1) - (n_d - 1) * dt)),
        have_c=have_c)

    acc_rows = hbe if have_c else hb
    scratch = [
        pltpu.VMEM((band_rows, wcc), camera.dtype),       # camera band
        pltpu.VMEM((band_rows, pw), camera.dtype),        # projector
        g_scratch,                                        # cotangent
        pltpu.VMEM((hbe, woe), camera.dtype),             # gr (zero halo)
        pltpu.VMEM((hbe, wo), camera.dtype),              # Σx / μx
        pltpu.VMEM((hbe, wo), camera.dtype),              # ex2 (center)
        pltpu.VMEM((hbe, syw), camera.dtype),             # μy
        pltpu.VMEM((hbe, syw), camera.dtype),             # ey2
        pltpu.VMEM((hb, wo), camera.dtype),               # A1 acc
        pltpu.VMEM((acc_rows, wo), camera.dtype),         # B acc
        pltpu.VMEM((acc_rows, wo), camera.dtype),         # GRMU acc
        pltpu.SemaphoreType.DMA((6 if have_c else 4,)),
    ]
    inputs = (cam_p, proj_p, g_src)
    if have_c:
        scratch.insert(3, pltpu.VMEM((2, dt, hb + 4 * pa, wo),
                                     camera.dtype))       # c tile (2 slots)
        inputs = (cam_p, proj_p, g_src, cost)

    map_shape = jax.ShapeDtypeStruct((h_pad, wo), camera.dtype)
    map_spec = pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_h, n_d),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(inputs),
        out_specs=map_spec if have_c else (map_spec,) * 3,
        out_shape=map_shape if have_c else (map_shape,) * 3,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 if have_c else 4) * k * H * W * (D + 1),
            bytes_accessed=H * W * (D + 1) * 4 * (2 if have_c else 1)
            + 2 * H * W * 4,
            transcendentals=H * W * (D + 1),
        ),
        # Raised scoped-VMEM limit (the compiler's 16 MB default counts
        # scratch + the Mosaic value stack + VMEM-placed ANY inputs;
        # taller row tiles are a measured win and the v5e has far more
        # physical VMEM than the default assumes).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(*inputs)

    if have_c:
        # The kernel emitted the finished gradient.
        return out[:H, :W]
    a1, b, grmu = out
    a1 = a1[:H, :W]
    b = b[:H, :W]
    grmu = grmu[:H, :W]

    # Tiny XLA epilogue: three [H, W] box filters + elementwise.
    from custereomatching_tpu.ops.zncc import box2d

    k2 = jnp.asarray(k * k, camera.dtype)
    mux = box2d(camera, k) / k2
    return a1 - box2d(grmu, k) + box2d(b * mux, k) - camera * box2d(b, k)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def pallas_camera_grad_banded(
    camera: jax.Array,
    projector: jax.Array,
    cost_volume_grad: jax.Array,
    num_disparities: int,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
    block_rows: int = 48,
    block_disparities: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Camera-image VJP of the banded ZNCC cost volume (Pallas).

    Args:
      camera: ``[H, W]`` float32 camera image.
      projector: ``[H, W]`` float32 projector image.
      cost_volume_grad: ``[H, W, D+1]`` upstream cotangent (the
        reference-parity layout; examples/verify.py:68 uses all-ones).
      num_disparities: band size D.
      kernel_size: odd correlation window side.
      epsilon: ZNCC epsilon.
      block_rows: output rows per grid step (multiple of 8).
      block_disparities: cotangent planes per grid step (multiple of 8;
        bounds the ``[rows, dt, W]`` cotangent staging buffer in VMEM).
      interpret: Pallas interpreter mode (CPU testing).

    Returns:
      ``[H, W]`` gradient w.r.t. the camera image.  The projector
      gradient is intentionally not produced (reference parity:
      custma/stereo_matching_wrapper.py:33 returns None).

    Layout note: this standalone entry (no forward volume available)
    stages the cotangent rows-major and runs the recompute-mode kernel.
    Re-staging plane-major for the direct-DMA kernel was measured
    SLOWER here (9.70 vs 9.12 ms fwd+bwd at KITTI shape on the v5e):
    without the cost residual the plane loop is recompute-bound, not
    cotangent-read-bound.  The differentiable op
    (:func:`..pallas_zncc.stereo_matching_pallas`) instead saves the
    padded volume and takes the with-cost direct path (7.51 ms).
    """
    H, W = camera.shape
    D = int(num_disparities)
    k = int(kernel_size)
    hb = _round_up(int(block_rows), 8)
    n_d = -(-(D + 1) // int(block_disparities))
    dt = _round_up(-(-(D + 1) // n_d), 8)
    # Rounding dt up to the sublane multiple can shrink the tile
    # count (whole tiles would otherwise be padding).
    n_d = -(-(D + 1) // dt)

    p = k // 2
    hbe = hb + 2 * p
    band_rows = _round_up(hbe + 2 * p, 8)
    src_rows = -(-H // hb) * hb + band_rows
    wo = _round_up(max(W, 128), 128)
    woe = wo + 2 * p
    wcc = _round_up(woe + 2 * p, 128)
    g_hdw = jnp.swapaxes(cost_volume_grad, 1, 2)  # [H, D+1, W]
    g_p = jnp.zeros((src_rows, n_d * dt, wcc), camera.dtype)
    g_p = lax.dynamic_update_slice(g_p, g_hdw, (2 * p, 0, 2 * p))

    return _run_bwd(camera, projector, g_p, D, k, epsilon, hb, dt, n_d,
                    interpret, direct_g=False)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def pallas_camera_grad_banded_hdw(
    camera: jax.Array,
    projector: jax.Array,
    padded_hdw_grad: jax.Array,
    num_disparities: int,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
    block_rows: int = 48,
    block_disparities: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Camera VJP taking the cotangent in the kernel's own padded
    plane-major layout ``[ndt, h_pad, wo]`` (what autodiff produces when
    the loss consumes :func:`..pallas_zncc.pallas_cost_volume_banded_hdw`
    with ``padded=True``; rows-major ``[h_pad, ndt, wo]`` until
    round 3).  The cotangent is DMA'd straight from HBM with aligned,
    clamp-folded offsets — NO XLA-side pad/transpose of the ~0.5 GB
    volume (measured ~4 ms, i.e. more than the whole backward kernel's
    useful work).

    Contract: cotangent entries for padded rows/planes/columns must be
    zero — true by construction when the loss reads only valid
    rows/cols/planes (e.g. through the padded-aware disparity head).
    """
    H, W = camera.shape
    D = int(num_disparities)
    k = int(kernel_size)
    hb = _round_up(int(block_rows), 8)
    wo = _round_up(max(W, 128), 128)
    n_planes = padded_hdw_grad.shape[0]
    if padded_hdw_grad.shape[2] != wo:
        raise ValueError(
            f"padded cotangent lane width {padded_hdw_grad.shape[2]} != "
            f"expected {wo}")
    # The backward processes ceil((D+1)/dt) tiles — only the REAL planes
    # plus the last tile's skipped tail (n_last) — regardless of how many
    # padding planes the producer's own tiling appended (e.g. a dt=16
    # forward writes 208 planes at D=192 where this dt=8 backward reads
    # 200): padding planes carry zero cotangent by contract, so skipping
    # them is exact, and the skipped tail is never computed with, so
    # garbage there (even NaN) is harmless.  DMA slices may not overrun
    # the source, so the processed extent must fit inside it.
    dtb = _round_up(int(block_disparities), 8)
    dt = 8
    for cand in range(8, dtb + 1, 8):
        if -(-(D + 1) // cand) * cand <= n_planes:
            dt = cand
    n_d = -(-(D + 1) // dt)
    if n_d * dt > n_planes:
        raise ValueError(
            f"padded cotangent has {n_planes} planes < the backward's "
            f"processed extent {n_d * dt} (D+1 = {D + 1} at dt = {dt})")

    return _run_bwd(camera, projector, padded_hdw_grad, D, k, epsilon,
                    hb, dt, n_d, interpret, direct_g=True)


# ---------------------------------------------------------------------------
# Projector gradient (the reference's unimplemented backward half)
# ---------------------------------------------------------------------------
#
# The reference returns None for the projector gradient
# (custma/stereo_matching_wrapper.py:33); this kernel fills that hole with
# the symmetric closed-form VJP.  Derivation (mean-term omission is exact,
# symmetrically to the camera case: Σ over a window of centered values is
# identically zero):
#
#   ∂c[h,w,d]/∂proj'(py,px) = g·(cam'(py, px+d)·r − ex2·proj'(py,px)·n·r³)
#   for windows (h,w) with |h−py| ≤ p and |w−(px+d)| ≤ p.
#
# Writing every per-plane field SHIFTED to projector coordinates,
# f̃_d[h,x] = f_d[h, x+d] (box2d commutes with the column shift):
#
#   proj_grad = Σ_d cam̃_d ⊙ box2d(g̃r_d)          (in-kernel, per plane)
#             − box2d(Σ_d g̃r_d·μx̃_d)             (z2: XLA epilogue box)
#             − proj ⊙ box2d(Σ_d b̃p_d)           (z3)
#             + box2d(μy ⊙ Σ_d b̃p_d)             (μy(h, (x+d)−d) = μy[h,x]
#                                                  — the shift cancels!)
#   with bp = g·ex2·n·r³ = g·c·r²·ex2 (cost residual, n·r = c).
#
# Structure mirrors the camera with-cost backward: one box pass + a few
# elementwise ops per plane, three D-reduced accumulators, box filters in
# a tiny XLA epilogue.  The +d gathers are realized exactly like the
# camera kernel's −d gathers: zero-margined staging buffers, ONE dynamic
# lane roll per consumed array per plane (by the tile's base disparity),
# then static slices at offset j.


def _proj_bwd_kernel(cam_hbm, proj_hbm, g_hbm, c_hbm,
                     a1p_ref, z2_ref, z3_ref,
                     cam_vmem, proj_vmem, g_vmem, c_vmem,
                     sx_scr, ex2_scr, ey2_scr,
                     a1p_scr, z2_scr, z3_scr, sems,
                     *, D: int, k: int, eps: float, hb: int, dt: int,
                     wo: int, won: int, gw: int, sxw: int, cw: int,
                     wcc: int, g_rows: int, n_last: int):
    """Grid step = disparity planes [d_idx·dt, +dt) of an hb-row tile.

    Column maps (image col → buffer col): camera band +2p (width cw,
    stats box input); projector band +2p (width wcc); g staging +p
    (width gw, zero margins for the +d reach); c staging +p (width gw).
    Stats: camera μx/ex2 at width sxw (stats col s ↔ camera center col
    s−p, serving all +d shifts); projector ey2 at the lane-aligned ext
    width ``won`` (stats col e ↔ projector center col e−p — unshifted).

    ``z2``/``z3`` accumulate on the EXTENDED column axis e = x + p,
    x ∈ [−p, ...): shifted fields carry REAL data at negative image
    columns (volume cols [d−p, d−1] at the left border), which the
    XLA-epilogue box filter must see; a center-only accumulation loses
    them (verified against the oracle).  Columns e ≥ wo + 2p are zero by
    construction (the staged g's zero margin).
    """
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    p = k // 2
    hbe = hb + 2 * p
    band_rows = _round_up(hbe + 2 * p, 8)
    inv_k2 = 1.0 / float(k * k)

    @pl.when(d_idx == 0)
    def _load_and_stats():
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
        sx = _box_from_band(cam, k, hbe, sxw)
        sx_scr[:, :] = sx * inv_k2                     # μx, pre-scaled
        ex2_scr[:, :] = _box_from_band(cam * cam, k, hbe, sxw) \
            - sx * sx * inv_k2
        proj = proj_vmem[:, :]
        sy = _box_from_band(proj, k, hbe, won)
        ey2_scr[:, :] = (_box_from_band(proj * proj, k, hbe, won)
                         - sy * sy * inv_k2)

        a1p_scr[:, :] = jnp.zeros((hb, wo), a1p_scr.dtype)
        z2_scr[:, :] = jnp.zeros((hb, won), z2_scr.dtype)
        z3_scr[:, :] = jnp.zeros((hb, won), z3_scr.dtype)

    r0 = h_idx * hb
    step = h_idx * pl.num_programs(1) + d_idx
    slot = lax.rem(step, 2)
    pa = _round_up(p, 8)
    crows = hb + 2 * pa
    qc = 2 * pa - p                    # static buffer row of r0 − p

    # Lane offset 0: DMA lane offsets must be 128-aligned, so the −p of
    # the e-coordinate is folded into the rolls below instead (the
    # wrapped-in columns land in the staging buffers' zero margins).
    # Plane-major sources (round 4): rows are a tiled dim, so the halo'd
    # g window stages from the 8-aligned offset r0 − pa with the clamp
    # folded into the destination offset (static read row qc + t).
    # Two slots each: double-buffered per-step prefetch.
    def _issue(hi, di, sl):
        r0i = hi * hb
        s0i = pl.multiple_of(jnp.clip(r0i - pa, 0, g_rows - crows), 8)
        o_g = pl.multiple_of(pa - ((r0i - pa) - s0i), 8)
        g_dma = pltpu.make_async_copy(
            g_hbm.at[pl.ds(di * dt, dt), pl.ds(s0i, crows), :],
            g_vmem.at[sl, slice(None), pl.ds(o_g, crows), pl.ds(0, wo)],
            sems.at[2 + sl])
        # The row offset is a multiple of 8 by construction (r0i = hi·hb
        # with hb an 8-multiple, clamped to the 8-multiple g_rows − hb),
        # but Mosaic cannot prove it through the clip — assert it, or
        # the plane-major slice fails to compile at n_h > 1 shapes.
        s0c = pl.multiple_of(jnp.clip(r0i, 0, g_rows - hb), 8)
        c_dma = pltpu.make_async_copy(
            c_hbm.at[pl.ds(di * dt, dt), pl.ds(s0c, hb), :],
            c_vmem.at[sl, slice(None), slice(None), pl.ds(0, wo)],
            sems.at[4 + sl])
        return g_dma, c_dma

    @pl.when(step == 0)
    def _zero_and_first():
        # Zero the staging buffers ONCE: the margins ([0, p) rows of the
        # g buffer, columns [wo, gw)) never receive DMA bytes but are
        # consumed by the +d-shifted slices (the beyond-the-volume
        # reach, zero by the cotangent contract).  This must NOT happen
        # per row tile — it would wipe a prefetched tile.
        g_vmem[:, :, :, :] = jnp.zeros(g_vmem.shape, g_vmem.dtype)
        c_vmem[:, :, :, :] = jnp.zeros(c_vmem.shape, c_vmem.dtype)
        for cp in _issue(h_idx, d_idx, slot):
            cp.start()

    nstep = step + 1

    @pl.when(nstep < pl.num_programs(0) * pl.num_programs(1))
    def _prefetch():
        for cp in _issue(nstep // pl.num_programs(1),
                         lax.rem(nstep, pl.num_programs(1)),
                         lax.rem(nstep, 2)):
            cp.start()

    d_base = d_idx * dt
    # Left-roll by d_base: rolled[u] = buf[u + d_base]; static slice
    # offsets then select each plane's +j shift.  Consumed columns stay
    # clear of the circular wrap (gw ≥ won + n_d·dt).
    cam_roll = pltpu.roll(cam_vmem[:, :], cw - d_base, axis=1)
    mux_roll = pltpu.roll(sx_scr[:, :], sxw - d_base, axis=1)
    ex2_roll = pltpu.roll(ex2_scr[:, :], sxw - d_base, axis=1)
    ey2p = ey2_scr[:, :]                               # unshifted [hbe, won]

    for cp in _issue(h_idx, d_idx, slot):
        cp.wait()

    trow = lax.broadcasted_iota(jnp.int32, (hbe, 1), 0)
    rmask = jnp.logical_and(trow + (r0 - p) >= 0,
                            trow + (r0 - p) < g_rows)

    def plane(j):
        # ex2/μx at shifted cols: stats slice start j covers ext e+d.
        ex2_sh = ex2_roll[:, j:j + won]                # [hbe, won]
        r = lax.rsqrt(ex2_sh * ey2p + eps)
        # Staged at lane 0, so the g̃/c̃ left-roll is by (d_base − p):
        # rolled[u] = staged[u + d_base − p]; slice start j then reads
        # image column (e − p) + d.  Wrapped-in columns (d_base < p) come
        # from the zero right margin.
        gc_shift = jnp.mod(jnp.int32(p) - d_base, gw)
        graw = jnp.where(
            rmask,
            pltpu.roll(g_vmem[slot, j, qc:qc + hbe, :],
                       gc_shift, axis=1)[:, j:j + won],
            0.0)                                       # [hbe, won] g̃
        gr = graw * r
        boxgr = _box_from_band(gr, k, hb, wo)
        a1p_scr[:, :] = a1p_scr[:, :] + boxgr * cam_roll[
            2 * p:2 * p + hb, j + 2 * p:j + 2 * p + wo]
        c_sl = (slice(p, p + hb), slice(None))
        z2_scr[:, :] = z2_scr[:, :] + gr[c_sl] * mux_roll[p:p + hb,
                                                          j:j + won]
        c_sh = pltpu.roll(c_vmem[slot, j, :, :], gc_shift,
                          axis=1)[:, j:j + won]        # [hb, won] c̃
        r_c = r[c_sl]
        z3_scr[:, :] = z3_scr[:, :] + (graw[c_sl] * c_sh
                                       * (r_c * r_c) * ex2_sh[c_sl])

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
        a1p_ref[:, :] = a1p_scr[:, :]
        z2_ref[:, :] = z2_scr[:, :]
        z3_ref[:, :] = z3_scr[:, :]


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def pallas_projector_grad_banded_hdw_with_cost(
    camera: jax.Array,
    projector: jax.Array,
    cost_volume_hdw: jax.Array,
    padded_hdw_grad: jax.Array,
    num_disparities: int,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
    block_rows: int = 48,
    block_disparities: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Projector-image VJP of the banded ZNCC volume (Pallas, direct-DMA
    padded-HDW cotangent + cost residual).

    The half the reference never implemented
    (custma/stereo_matching_wrapper.py:33 returns None).  Same contracts
    as :func:`pallas_camera_grad_banded_hdw_with_cost`: cotangent entries
    for padded rows/planes/columns must be zero; the volume must share
    the cotangent's padded-HDW layout and disparity tiling.
    """
    H, W = camera.shape
    D = int(num_disparities)
    k = int(kernel_size)
    p = k // 2
    hb = _round_up(int(block_rows), 8)
    wo = _round_up(max(W, 128), 128)
    n_planes = padded_hdw_grad.shape[0]
    if padded_hdw_grad.shape[2] != wo:
        raise ValueError(
            f"padded cotangent lane width {padded_hdw_grad.shape[2]} != "
            f"expected {wo}")
    # Process only ceil((D+1)/dt) tiles (see
    # pallas_camera_grad_banded_hdw): padding planes beyond the last
    # tile's skipped tail are never touched, so the producer's disparity
    # tiling (and hence its plane-padding) is free to differ.
    dtb = _round_up(int(block_disparities), 8)
    dt = 8
    for cand in range(8, dtb + 1, 8):
        if -(-(D + 1) // cand) * cand <= n_planes:
            dt = cand
    n_d = -(-(D + 1) // dt)
    if n_d * dt > n_planes:
        raise ValueError(
            f"padded cotangent has {n_planes} planes < the backward's "
            f"processed extent {n_d * dt} (D+1 = {D + 1} at dt = {dt})")

    hbe = hb + 2 * p
    # No row tile may straddle the volume's padded extent (clamped DMA
    # would deliver shifted rows); mirror _run_bwd's guard.  Plane-major
    # cotangent: rows live on axis 1.
    while hb > 8 and -(-H // hb) * hb > max(padded_hdw_grad.shape[1], H):
        hb -= 8
        hbe = hb + 2 * p

    if 2 * p > 128:
        raise ValueError(f"kernel_size {k} exceeds the lane-aligned ext "
                         f"margin (k//2*2 must be <= 128)")
    won = wo + 128                         # lane-aligned ext width (e axis)
    lp = _round_up(max(D + 1, n_d * dt), 128)
    gw = _round_up(won + lp, 128)          # g/c staging width (+d reach)
    sxw = _round_up(won + lp, 128)         # camera stats width
    cw = _round_up(sxw + 2 * p, 128)       # camera band width (stats halo)
    wcc = _round_up(won + 2 * p, 128)      # projector band width

    n_h = -(-H // hb)
    h_pad = n_h * hb
    band_rows = _round_up(hbe + 2 * p, 8)
    src_rows = h_pad + band_rows

    cam_p = jnp.zeros((src_rows, cw), camera.dtype)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (2 * p, 2 * p))
    proj_p = jnp.zeros((src_rows, wcc), projector.dtype)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (2 * p, 2 * p))

    pa = _round_up(p, 8)
    crows = hb + 2 * pa
    g_rows = padded_hdw_grad.shape[1]
    if g_rows < crows:
        padded_hdw_grad = jnp.pad(padded_hdw_grad,
                                  ((0, 0), (0, crows - g_rows), (0, 0)))
        cost_volume_hdw = jnp.pad(cost_volume_hdw,
                                  ((0, 0), (0, crows - g_rows), (0, 0)))
        g_rows = crows
    if cost_volume_hdw.shape != padded_hdw_grad.shape:
        raise ValueError(
            f"cost residual shape {cost_volume_hdw.shape} != cotangent "
            f"{padded_hdw_grad.shape}")

    kernel = functools.partial(
        _proj_bwd_kernel, D=D, k=k, eps=float(epsilon), hb=hb, dt=dt,
        wo=wo, won=won, gw=gw, sxw=sxw, cw=cw, wcc=wcc, g_rows=g_rows,
        n_last=min(dt, max(1, (D + 1) - (n_d - 1) * dt)))

    map_spec = pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)
    ext_spec = pl.BlockSpec((hb, won), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)
    a1p, z2, z3 = pl.pallas_call(
        kernel,
        grid=(n_h, n_d),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(map_spec, ext_spec, ext_spec),
        out_shape=(jax.ShapeDtypeStruct((h_pad, wo), camera.dtype),
                   jax.ShapeDtypeStruct((h_pad, won), camera.dtype),
                   jax.ShapeDtypeStruct((h_pad, won), camera.dtype)),
        scratch_shapes=[
            pltpu.VMEM((band_rows, cw), camera.dtype),        # camera band
            pltpu.VMEM((band_rows, wcc), camera.dtype),       # projector
            pltpu.VMEM((2, dt, hb + 4 * pa, gw),
                       camera.dtype),                 # g staging (2 slots)
            pltpu.VMEM((2, dt, hb, gw), camera.dtype),        # c (2 slots)
            pltpu.VMEM((hbe, sxw), camera.dtype),             # μx
            pltpu.VMEM((hbe, sxw), camera.dtype),             # ex2
            pltpu.VMEM((hbe, won), camera.dtype),             # ey2 (proj)
            pltpu.VMEM((hb, wo), camera.dtype),               # A1p acc
            pltpu.VMEM((hb, won), camera.dtype),              # z2 acc
            pltpu.VMEM((hb, won), camera.dtype),              # z3 acc
            pltpu.SemaphoreType.DMA((6,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * k * H * W * (D + 1),
            bytes_accessed=2 * H * W * (D + 1) * 4 + 2 * H * W * 4,
            transcendentals=H * W * (D + 1),
        ),
        # Raised scoped-VMEM limit — same rationale as _run_bwd's.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(cam_p, proj_p, padded_hdw_grad, cost_volume_hdw)

    from custereomatching_tpu.ops.zncc import box2d

    # XLA epilogue on the EXTENDED column axis e = x + p (see kernel
    # docstring): evaluate the box filters on the e-indexed fields and
    # slice the image columns at offset p.
    a1p = a1p[:H, :W]
    z2e = z2[:H]
    z3e = z3[:H]
    k2 = jnp.asarray(k * k, camera.dtype)
    # μy at extended positions: window means of windows centered at
    # x = e − p, including the partial windows left/right of the image.
    muy_e = box2d(jnp.pad(projector, ((0, 0), (p, p))), k) / k2
    muy_e = jnp.pad(muy_e, ((0, 0), (0, won - (W + 2 * p))))
    t2 = box2d(z2e, k)[:, p:p + W]
    t3 = projector * box2d(z3e, k)[:, p:p + W]
    t4 = box2d(muy_e * z3e, k)[:, p:p + W]
    return a1p - t2 - t3 + t4


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def pallas_camera_grad_banded_hdw_with_cost(
    camera: jax.Array,
    projector: jax.Array,
    cost_volume_hdw: jax.Array,
    padded_hdw_grad: jax.Array,
    num_disparities: int,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
    block_rows: int = 48,
    block_disparities: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Camera VJP with the forward volume supplied as a residual.

    The fastest backward: because ``n·r = c``, handing the kernel the
    forward output (which autodiff keeps alive anyway) removes the
    per-plane cross-term recompute — the dominant cost of the
    recompute-from-images backward — leaving only stats, the
    ``box2d(g·r)`` pass, and elementwise accumulation.  Beyond the
    reference's design point: its backward rematerializes everything
    from the inputs (custma/src/stereo_matching_kernel.cu:97-128).

    ``cost_volume_hdw`` and ``padded_hdw_grad`` must share the padded
    plane-major ``[ndt, h_pad, wo]`` layout produced by
    :func:`..pallas_zncc.stereo_matching_pallas_hdw`.

    Contract: cotangent entries for padded rows/planes/columns MUST be
    zero (true by construction when the loss reads the volume through the
    padded-aware disparity head).  This kernel's in-kernel gradient
    combine box-filters the B/GRMU fields across the image's bottom/right
    edges, so non-zero garbage in the cotangent's padding region corrupts
    edge-pixel gradients — it is not merely ignored.  Pinned by
    ``tests/test_pallas_bwd.py::test_hdw_with_cost_padding_garbage``.
    """
    H, W = camera.shape
    D = int(num_disparities)
    k = int(kernel_size)
    hb = _round_up(int(block_rows), 8)
    wo = _round_up(max(W, 128), 128)
    n_planes = padded_hdw_grad.shape[0]
    if padded_hdw_grad.shape[2] != wo:
        raise ValueError(
            f"padded cotangent lane width {padded_hdw_grad.shape[2]} != "
            f"expected {wo}")
    # Process only ceil((D+1)/dt) tiles.  The forward never computes
    # planes >= D+1 (they hold garbage — possibly NaN when uninitialized),
    # and this backward skips exactly those planes: they land either in
    # the last processed tile's n_last tail (DMA'd but never computed
    # with) or beyond the processed extent entirely.  The producer's own
    # disparity tiling (and hence its plane-padding, e.g. 208 planes from
    # a dt=16 forward at D=192) is therefore free to differ from the
    # backward's.
    dtb = _round_up(int(block_disparities), 8)
    dt = 8
    for cand in range(8, dtb + 1, 8):
        if -(-(D + 1) // cand) * cand <= n_planes:
            dt = cand
    n_d = -(-(D + 1) // dt)
    if n_d * dt > n_planes:
        raise ValueError(
            f"padded cotangent has {n_planes} planes < the backward's "
            f"processed extent {n_d * dt} (D+1 = {D + 1} at dt = {dt})")

    return _run_bwd(camera, projector, padded_hdw_grad, D, k, epsilon,
                    hb, dt, n_d, interpret, direct_g=True,
                    cost=cost_volume_hdw)
