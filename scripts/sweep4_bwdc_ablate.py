"""Ablate the cost-residual fused backward's per-plane stages on TPU.

Round-3 state: the fused train backward (`_fused_bwd_c_kernel`) measures
~66% of its calibrated bound; the per-step DMA stall was eliminated by
double-buffering, so the residual gap must live in the per-plane compute
schedule.  This sweep rebuilds the kernel (glue-fused form: raw residual
maps in, per-tile head prep, extended-row accumulators, in-kernel
gradient-combine epilogue) with individually removable stages and times
each variant at the KITTI shape, so the gap can be attributed to a stage
(box pass, head cotangent, rsqrt, accumulators, the unaligned gr staging
store, the fused epilogue) instead of guessed at.

Usage:
  python scripts/sweep4_bwdc_ablate.py [--configs full,...]   # TPU timing
  python scripts/sweep4_bwdc_ablate.py --check                # CPU validity

``--check`` runs structure-preserving configs in Pallas interpreter mode
at a small shape and asserts the gradient equals the production
``_fused_train_bwd_c_impl`` on identical inputs — so a timing taken from
this mirror speaks for the shipped kernel.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from custereomatching_tpu.ops.pallas_zncc import _box_from_band, _round_up

SHAPE = (375, 1242, 192, 15)
BETA = 50.0
EPS = 1e-8


def _rb(x):
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def _chain(fn, args, n, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _rb(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _time(fn, *args):
    for _ in range(3):
        _rb(fn(*args))
    return max((_chain(fn, args, 32) - _chain(fn, args, 8)) / 24, 1e-9)


def _kernel(cam_hbm, proj_hbm, am_hbm, mask_hbm, s_hbm, t_hbm,
            gs_hbm, gc_hbm, c_hbm,
            grad_ref,
            cam_vmem, proj_vmem, c_vmem, gr_scr,
            am_b, is_b, tos_b, gs_b, gc_b, mk_b,
            sx_scr, ex2_scr, sy_scr, ey2_scr,
            a1_scr, b_scr, grmu_scr, sems,
            *, Hs, Ws, Ds, k, eps, beta, hb, dt,
            wo, woe, wcc, pw, syw, lp, maps_rows, g_rows, n_last,
            go,                     # gr staging lane offset (p or 128)
            pair,                   # planes folded per accumulator store
            maps2d,                 # 2D aligned map staging vs 3D unit-dim
            inplane,                # read maps inside the plane loop
            dhw,                    # plane-major [planes, rows, w] volume
            do_box, do_head, do_r, do_b, do_grmu, do_a1, do_epi):
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    p = k // 2
    pa = _round_up(p, 8)
    hbe = hb + 2 * p
    band_rows = _round_up(hbe + 2 * p, 8)
    inv_k2 = 1.0 / float(k * k)
    # Static row offset of the extended window inside the map buffers.
    q = (2 * pa - p) if maps2d else p

    def mget(buf, sl):
        return buf[sl] if maps2d else buf[sl, 0]

    def mset(buf, sl, val):
        if maps2d:
            buf[sl] = val
        else:
            buf[sl, 0] = val

    @pl.when(d_idx == 0)
    def _load_and_stats():
        r0 = h_idx * hb
        cam_dma = pltpu.make_async_copy(
            cam_hbm.at[pl.ds(r0, band_rows), :], cam_vmem, sems.at[0])
        proj_dma = pltpu.make_async_copy(
            proj_hbm.at[pl.ds(r0, band_rows), :], proj_vmem, sems.at[1])
        if maps2d:
            # All-aligned staging: copy R = hb + 2·pa rows from the
            # 8-aligned source offset r0 − pa; the clamp correction goes
            # to the (8-aligned) DMA destination offset, so source row
            # (r0 − p) + j always lands at static buffer row q + j.
            rows = hb + 2 * pa
            s0m = pl.multiple_of(
                jnp.clip(r0 - pa, 0, maps_rows - rows), 8)
            o_m = pl.multiple_of(pa - ((r0 - pa) - s0m), 8)
        else:
            rows = hbe
            s0m = jnp.clip(r0 - p, 0, maps_rows - hbe)
            o_m = p - ((r0 - p) - s0m)
        srcs = [am_hbm, s_hbm, t_hbm, gs_hbm, gc_hbm, mask_hbm]
        dsts = [am_b, is_b, tos_b, gs_b, gc_b, mk_b]
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
        sx_scr[:, :] = sx[:, p:p + wo] * inv_k2
        ex2 = _box_from_band(cam * cam, k, hbe, woe) - sx * sx * inv_k2
        ex2_scr[:, :] = ex2[:, p:p + wo]
        proj = proj_vmem[:, :]
        sy = _box_from_band(proj, k, hbe, syw)
        sy_scr[:, :] = sy * inv_k2
        ey2_scr[:, :] = (_box_from_band(proj * proj, k, hbe, syw)
                         - sy * sy * inv_k2)

        trow2 = lax.broadcasted_iota(jnp.int32, (hbe, wo), 0) + (r0 - p)
        tcol = lax.broadcasted_iota(jnp.int32, (hbe, wo), 1)
        ok = jnp.logical_and(
            jnp.logical_and(trow2 >= 0, trow2 < Hs), tcol < Ws)
        csl = pl.ds(q, hbe)
        mset(am_b, csl, jnp.where(ok, mget(am_b, csl), 0.0))
        inv_s = jnp.where(ok, 1.0 / mget(is_b, csl), 0.0)
        mset(is_b, csl, inv_s)
        mset(tos_b, csl, jnp.where(ok, mget(tos_b, csl) * inv_s, 0.0))
        mset(gs_b, csl, jnp.where(ok, mget(gs_b, csl) * mget(mk_b, csl),
                                  0.0) * beta)
        mset(gc_b, csl, jnp.where(ok, mget(gc_b, csl), 0.0))

        a1_scr[:, :] = jnp.zeros((hb, wo), a1_scr.dtype)
        b_scr[:, :] = jnp.zeros((hbe, wo), b_scr.dtype)
        grmu_scr[:, :] = jnp.zeros((hbe, wo), grmu_scr.dtype)
        gr_scr[:, 0:go] = jnp.zeros((hbe, go), gr_scr.dtype)
        gr_scr[:, go + wo:] = jnp.zeros(
            (hbe, gr_scr.shape[1] - go - wo), gr_scr.dtype)

    r0 = h_idx * hb

    def _issue_c(hi, di, sl):
        r0i = hi * hb
        if dhw:
            # Plane-major volume: rows are a TILED dim of the staging
            # buffer, so stage with the same aligned-row trick as the
            # maps — the per-plane read is then a dense 2D tile instead
            # of one sublane per (dt, 128) tile.
            crows = hb + 2 * pa
            s0i = pl.multiple_of(
                jnp.clip(r0i - pa, 0, g_rows - crows), 8)
            o_c = pl.multiple_of(pa - ((r0i - pa) - s0i), 8)
            return pltpu.make_async_copy(
                c_hbm.at[pl.ds(di * dt, dt), pl.ds(s0i, crows), :],
                c_vmem.at[sl, :, pl.ds(o_c, crows)],
                sems.at[8 + sl])
        s0i = jnp.clip(r0i - p, 0, g_rows - hbe)
        return pltpu.make_async_copy(
            c_hbm.at[pl.ds(s0i, hbe), pl.ds(di * dt, dt), :],
            c_vmem.at[sl, pl.ds(p - ((r0i - p) - s0i), hbe)],
            sems.at[8 + sl])

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

    ex2 = ex2_scr[:, :]

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

    def _map_vals():
        return (mget(is_b, csl), mget(tos_b, csl), mget(am_b, csl),
                mget(gs_b, csl), mget(gc_b, csl))

    hoisted = None if inplane else _map_vals()

    def plane_terms(j):
        # inplane: per-plane VMEM re-reads — cheap, and they keep the
        # live set across the unrolled loop small (no value-stack
        # spills).  Otherwise the reads are hoisted once per grid step.
        inv_s_e, tos_e, am_e, gs_e, gc_e = (
            _map_vals() if inplane else hoisted)
        c0 = dt - 1 - j
        if do_r:
            ey2c = ey2b[:, c0 + p:c0 + p + wo]
            r = lax.rsqrt(ex2 * ey2c + eps)
        else:
            ey2c = ex2
            r = ex2
        if dhw:
            qc = 2 * pa - p
            c_t = jnp.where(rmask, c_vmem[slot, j, qc:qc + hbe, :], 0.0)
        else:
            c_t = jnp.where(rmask, c_vmem[slot, p:p + hbe, j, :], 0.0)
        d_f = jnp.float32(0) + (d_base + j)
        if do_head:
            w = jnp.where(inv_s_e > 0.0,
                          jnp.exp(beta * c_t), 0.0) * inv_s_e
            g_d = gs_e * w * (d_f - tos_e) + gc_e * (am_e == d_f)
        else:
            g_d = c_t
        gr = g_d * r
        if do_box:
            gr_scr[:, go:go + wo] = gr
            boxgr = _box_from_band(gr_scr[:, :], k, hb, wo,
                                   col_start=go - p)
        else:
            boxgr = gr[p:p + hb, :]
        if do_a1:
            a1_t = boxgr * psh[2 * p:2 * p + hb,
                               c0 + 2 * p:c0 + 2 * p + wo]
        else:
            a1_t = boxgr
        b_t = (g_d * c_t * (r * r) * ey2c if do_b else None)
        g_t = (gr * syb[:, c0 + p:c0 + p + wo] if do_grmu else None)
        return a1_t, b_t, g_t

    def run_planes(n):
        for j0 in range(0, n, pair):
            a1_t, b_t, g_t = plane_terms(j0)
            for j in range(j0 + 1, min(j0 + pair, n)):
                a1_j, b_j, g_j = plane_terms(j)
                a1_t = a1_t + a1_j
                b_t = None if b_t is None else b_t + b_j
                g_t = None if g_t is None else g_t + g_j
            a1_scr[:, :] = a1_scr[:, :] + a1_t
            if b_t is not None:
                b_scr[:, :] = b_scr[:, :] + b_t
            if g_t is not None:
                grmu_scr[:, :] = grmu_scr[:, :] + g_t

    if n_last == dt:
        run_planes(dt)
    else:
        @pl.when(d_idx != n_d - 1)
        def _full_tile():
            run_planes(dt)

        @pl.when(d_idx == n_d - 1)
        def _last_tile():
            run_planes(n_last)

    @pl.when(d_idx == n_d - 1)
    def _epilogue():
        if do_epi:
            gr_scr[:, go:go + wo] = grmu_scr[:, :]
            t2 = _box_from_band(gr_scr[:, :], k, hb, wo, col_start=go - p)
            gr_scr[:, go:go + wo] = b_scr[:, :] * sx_scr[:, :]
            t3 = _box_from_band(gr_scr[:, :], k, hb, wo, col_start=go - p)
            gr_scr[:, go:go + wo] = b_scr[:, :]
            t4 = _box_from_band(gr_scr[:, :], k, hb, wo, col_start=go - p)
            cam_c = cam_vmem[2 * p:2 * p + hb, 2 * p:2 * p + wo]
            grad_ref[:, :] = (a1_scr[:, :] - t2) + (t3 - cam_c * t4)
        else:
            grad_ref[:, :] = a1_scr[:, :] + (b_scr[p:p + hb, :]
                                             + grmu_scr[p:p + hb, :])


def build(hb=40, dt=16, go=None, pair=1, shape=None, interpret=False,
          maps2d=False, inplane=False, dhw=False, **gates):
    H, W, D, K = shape if shape is not None else SHAPE
    p = K // 2
    pa = _round_up(p, 8)
    hb = _round_up(hb, 8)
    hbe = hb + 2 * p
    n_planes = _round_up(D + 1, 8)
    decl = _round_up(n_planes, 16)
    if decl - (D + 1) < 16:
        n_planes = decl
    if n_planes % dt:
        raise ValueError(f"dt {dt} does not divide {n_planes}")
    n_d = n_planes // dt

    wo = _round_up(max(W, 128), 128)
    if go is None:
        go = p
    gw = _round_up(go + wo + p, 128)
    woe = wo + 2 * p
    wcc = _round_up(woe + 2 * p, 128)
    lp = _round_up(max(D + 1, n_d * dt), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)

    n_h = -(-H // hb)
    h_pad = n_h * hb
    band_rows = _round_up(hbe + 2 * p, 8)
    src_rows = h_pad + band_rows

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 9)
    camera = jax.random.uniform(ks[0], (H, W), jnp.float32)
    projector = jax.random.uniform(ks[1], (H, W), jnp.float32)
    cam_p = jnp.zeros((src_rows, wcc), jnp.float32)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (2 * p, 2 * p))
    proj_p = jnp.zeros((src_rows, pw), jnp.float32)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (2 * p, lp + 2 * p))

    maps_rows = max(h_pad, hbe)
    # Raw residual maps: am/mask/conf-free (unnormalized head), s kept
    # away from zero so 1/s stays finite on the valid extent.
    am = jnp.floor(jax.random.uniform(ks[2], (maps_rows, wo), jnp.float32,
                                      0.0, D + 1.0))
    mask = (jax.random.uniform(ks[3], (maps_rows, wo)) > 0.3).astype(
        jnp.float32)
    s = jax.random.uniform(ks[4], (maps_rows, wo), jnp.float32, 0.5, 2.0)
    t = jax.random.uniform(ks[5], (maps_rows, wo), jnp.float32, 0.0, 50.0)
    gs = jax.random.uniform(ks[6], (maps_rows, wo), jnp.float32, -1.0, 1.0)
    gc = jax.random.uniform(ks[7], (maps_rows, wo), jnp.float32, -1.0, 1.0)
    g_rows = maps_rows
    if dhw:
        g_rows = _round_up(max(g_rows, hb + 2 * pa), 8)
        cost = jax.random.uniform(ks[8], (n_planes, g_rows, wo),
                                  jnp.float32, -1.0, 1.0)
    else:
        cost = jax.random.uniform(ks[8], (g_rows, n_planes, wo),
                                  jnp.float32, -1.0, 1.0)

    if maps2d:
        # Aligned staging needs maps_rows >= hb + 2·pa (whole copy fits)
        # and a multiple of 8 (aligned clamp bound).
        need = _round_up(max(maps_rows, hb + 2 * pa), 8)
        if need > maps_rows:
            padm = ((0, need - maps_rows), (0, 0))
            am, mask, s, t, gs, gc = (jnp.pad(m, padm)
                                      for m in (am, mask, s, t, gs, gc))
            maps_rows = need
        map_buf_rows = hb + 4 * pa
        map_buf = (map_buf_rows, wo)
    else:
        # Unit middle dim keeps the unaligned dynamic row-offset map
        # DMAs legal on hardware (dim 0 of a >=3D memref is untiled).
        am, mask, s, t, gs, gc = (m[:, None, :]
                                  for m in (am, mask, s, t, gs, gc))
        map_buf = (hbe + 2 * p, 1, wo)

    gates_full = dict(do_box=True, do_head=True, do_r=True, do_b=True,
                      do_grmu=True, do_a1=True, do_epi=True)
    gates_full.update(gates)
    kernel = functools.partial(
        _kernel, Hs=H, Ws=W, Ds=D, k=K, eps=EPS, beta=BETA, hb=hb, dt=dt,
        wo=wo, woe=woe, wcc=wcc, pw=pw, syw=syw, lp=lp,
        maps_rows=maps_rows, g_rows=g_rows, go=go, pair=pair,
        maps2d=maps2d, inplane=inplane, dhw=dhw,
        n_last=min(dt, max(1, (D + 1) - (n_d - 1) * dt)), **gates_full)

    map_spec = pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(cam_p, proj_p, am, mask, s, t, gs, gc, cost):
        return pl.pallas_call(
            kernel,
            grid=(n_h, n_d),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 9,
            out_specs=map_spec,
            out_shape=jax.ShapeDtypeStruct((h_pad, wo), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((band_rows, wcc), jnp.float32),
                pltpu.VMEM((band_rows, pw), jnp.float32),
                (pltpu.VMEM((2, dt, hb + 4 * pa, wo), jnp.float32)
                 if dhw else
                 pltpu.VMEM((2, hbe + 2 * p, dt, wo), jnp.float32)),
                pltpu.VMEM((hbe, gw), jnp.float32),
                pltpu.VMEM(map_buf, jnp.float32),
                pltpu.VMEM(map_buf, jnp.float32),
                pltpu.VMEM(map_buf, jnp.float32),
                pltpu.VMEM(map_buf, jnp.float32),
                pltpu.VMEM(map_buf, jnp.float32),
                pltpu.VMEM(map_buf, jnp.float32),
                pltpu.VMEM((hbe, wo), jnp.float32),
                pltpu.VMEM((hbe, wo), jnp.float32),
                pltpu.VMEM((hbe, syw), jnp.float32),
                pltpu.VMEM((hbe, syw), jnp.float32),
                pltpu.VMEM((hb, wo), jnp.float32),
                pltpu.VMEM((hbe, wo), jnp.float32),
                pltpu.VMEM((hbe, wo), jnp.float32),
                pltpu.SemaphoreType.DMA((10,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
            interpret=interpret,
        )(cam_p, proj_p, am, mask, s, t, gs, gc, cost)

    data = (cam_p, proj_p, am, mask, s, t, gs, gc, cost)
    flat = ((m if maps2d else m[:, 0]) for m in (am, mask, s, t, gs, gc))
    # The production reference consumes the plane-major (DHW) layout
    # since round 4 — the mirror's non-dhw variants transpose for it.
    raw = (camera, projector, *flat,
           cost if dhw else cost.transpose(1, 0, 2))
    return run, data, raw


CONFIGS = {
    "full": {},
    "full_dt8": {"dt": 8},
    "maps2d": {"maps2d": True},
    "inplane": {"inplane": True},
    "maps2d_inplane": {"maps2d": True, "inplane": True},
    "m2d_ip_dt8": {"maps2d": True, "inplane": True, "dt": 8},
    "m2d_ip_hb32": {"maps2d": True, "inplane": True, "hb": 32},
    "m2d_ip_hb32_dt8": {"maps2d": True, "inplane": True,
                        "hb": 32, "dt": 8},
    "dhw_hb32": {"maps2d": True, "dhw": True, "hb": 32},
    "dhw_hb48": {"maps2d": True, "dhw": True, "hb": 48},
    "dhw_hb48_dt8": {"maps2d": True, "dhw": True, "hb": 48, "dt": 8},
    "dhw_hb64": {"maps2d": True, "dhw": True, "hb": 64},
    "m2d_ip_hb24": {"maps2d": True, "inplane": True, "hb": 24},
    "m2d_ip_hb48": {"maps2d": True, "inplane": True, "hb": 48},
    "m2d_hb32_pair2": {"maps2d": True, "hb": 32, "pair": 2},
    "m2d_hb32_noepi": {"maps2d": True, "hb": 32, "do_epi": False},
    "m2d_hb32_nobox": {"maps2d": True, "hb": 32, "do_box": False},
    "m2d_hb32_nohead": {"maps2d": True, "hb": 32, "do_head": False},
    "m2d_hb32_nobgrmu": {"maps2d": True, "hb": 32,
                         "do_b": False, "do_grmu": False},
    "m2d_hb32_nor": {"maps2d": True, "hb": 32, "do_r": False},
    "m2d_hb32_bare": {"maps2d": True, "hb": 32, "do_box": False,
                      "do_head": False, "do_r": False, "do_b": False,
                      "do_grmu": False, "do_a1": False, "do_epi": False},
    "hb32": {"hb": 32},
    "hb48": {"hb": 48},
    "hb56": {"hb": 56},
    "aligned_store": {"go": 128},
    "pair2": {"pair": 2},
    "pair4": {"pair": 4},
    "pair2_aligned": {"pair": 2, "go": 128},
    "no_epi": {"do_epi": False},
    "no_box": {"do_box": False},
    "no_head": {"do_head": False},
    "no_r": {"do_r": False},
    "no_bgrmu": {"do_b": False, "do_grmu": False},
    "no_a1mul": {"do_a1": False},
    "bare": {"do_box": False, "do_head": False, "do_r": False,
             "do_b": False, "do_grmu": False, "do_a1": False,
             "do_epi": False},
}


def check(configs=("full", "aligned_store", "full_dt8", "pair2", "pair4",
                   "pair2_aligned", "maps2d", "inplane", "maps2d_inplane",
                   "m2d_ip_dt8", "dhw_hb32", "dhw_hb48_dt8")):
    """Interpreter-mode equivalence vs the shipped backward (small shape).

    Only structure-preserving configs (all compute gates on) can match;
    the do_* ablations intentionally change the math.
    """
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from custereomatching_tpu.ops.pallas_pipeline import (
        _fused_train_bwd_c_impl)

    shape = (24, 40, 10, 5)
    Hc, Wc, Dc, Kc = shape
    failed = False
    for name in configs:
        cfg = dict(CONFIGS[name])
        cfg.setdefault("hb", 8)
        fn, data, (camera, projector, am, mask, s, t, gs, gc, cost) = build(
            shape=shape, interpret=True, **cfg)
        got = fn(*data)[:Hc, :Wc]
        conf = jnp.zeros_like(am)
        want = _fused_train_bwd_c_impl(
            camera, projector, (am, mask, conf, s, t, gs, gc), cost,
            Dc, Kc, EPS, BETA, block_rows=cfg["hb"], interpret=True)
        err = float(jnp.max(jnp.abs(got - want)))
        rel = err / (float(jnp.max(jnp.abs(want))) + 1e-30)
        ok = rel < 1e-5
        failed |= not ok
        print(f"check {name:>14}: max|Δ| {err:.3e} (rel {rel:.1e}) "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        assert np.isfinite(np.asarray(got)).all()
    return 1 if failed else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--check", action="store_true",
                    help="interpreter-mode equivalence vs production")
    args = ap.parse_args()
    if args.check:
        raise SystemExit(check())
    for name in args.configs.split(","):
        try:
            fn, data, _ = build(**CONFIGS[name])
            t = _time(fn, *data)
            print(f"{name:>16}: {t * 1e3:7.3f} ms", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name:>16}: FAILED {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
