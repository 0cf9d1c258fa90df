"""Stage-gated ablation sweep for the VOLUME-FREE fused backward.

BENCH_r03 left the volume-free trainable backward (the opt-in
memory-saving mode, ``save_volume=False``) at ~75% of its calibrated
bound after a tile sweep; VERDICT r3 #3 asks for attribution, not
another sweep.  This mirror rebuilds ``_fused_bwd_kernel``
(ops/pallas_pipeline.py) with per-stage gates so the missing 25% can be
attributed the way sweep4 did for the cost-residual variant:

  do_cross   per-plane cost recompute (prod + its box pass) — the leg
             the cost residual eliminates
  do_head    head-cotangent derivation (exp + selects)
  do_box     box2d(gr) pass
  do_a1      A1 accumulation (boxgr · shifted projector)
  do_b       B accumulation (extended rows)
  do_grmu    GRMU accumulation (extended rows)
  do_epi     in-kernel gradient-combine epilogue (3 boxes)

Run:  python scripts/sweep7_bwdfree_ablate.py [--check] [--configs a,b]
``--check`` verifies the full config against the production impl in
interpreter mode (CPU).  Timing runs measure each config on the device
and print the per-stage deltas next to the cost model's predictions.
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

EPS = 1e-8
BETA = 50.0


def _kernel(cam_hbm, proj_hbm, am_hbm, mask_hbm, s_hbm, t_hbm, gs_hbm,
            gc_hbm, grad_ref,
            cam_vmem, proj_vmem, gr_scr,
            am_b, is_b, tos_b, gs_b, gc_b, mk_b,
            sx_scr, ex2_scr, sy_scr, ey2_scr,
            a1_scr, b_scr, grmu_scr, sems,
            *, Hs, Ws, Ds, k, eps, beta, hb, dt, wo, woe, wcc, pw, syw,
            lp, maps_rows, n_last,
            do_cross, do_head, do_box, do_a1, do_b, do_grmu, do_epi,
            vreg_acc=False):
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    p = k // 2
    pa = _round_up(p, 8)
    hbe = hb + 2 * p
    band_rows = _round_up(hbe + 2 * p, 8)
    inv_k2 = 1.0 / float(k * k)
    q = 2 * pa - p

    @pl.when(d_idx == 0)
    def _load_and_stats():
        r0 = h_idx * hb
        cam_dma = pltpu.make_async_copy(
            cam_hbm.at[pl.ds(r0, band_rows), :], cam_vmem, sems.at[0])
        proj_dma = pltpu.make_async_copy(
            proj_hbm.at[pl.ds(r0, band_rows), :], proj_vmem, sems.at[1])
        rows = hb + 2 * pa
        s0m = pl.multiple_of(jnp.clip(r0 - pa, 0, maps_rows - rows), 8)
        o_m = pl.multiple_of(pa - ((r0 - pa) - s0m), 8)
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
        sx_scr[:, :] = sx[:, p:p + wo]
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
        am_b[csl] = jnp.where(ok, am_b[csl], 0.0)
        inv_s = jnp.where(ok, 1.0 / is_b[csl], 0.0)
        is_b[csl] = inv_s
        tos_b[csl] = jnp.where(ok, tos_b[csl] * inv_s, 0.0)
        gs_b[csl] = jnp.where(ok, gs_b[csl] * mk_b[csl], 0.0) * beta
        gc_b[csl] = jnp.where(ok, gc_b[csl], 0.0)

        a1_scr[:, :] = jnp.zeros((hb, wo), a1_scr.dtype)
        b_scr[:, :] = jnp.zeros((hbe, wo), b_scr.dtype)
        grmu_scr[:, :] = jnp.zeros((hbe, wo), grmu_scr.dtype)
        gr_scr[:, 0:p] = jnp.zeros((hbe, p), gr_scr.dtype)
        gr_scr[:, p + wo:woe] = jnp.zeros((hbe, woe - wo - p),
                                          gr_scr.dtype)

    band = cam_vmem[:, :]
    sx_raw = sx_scr[:, :]
    ex2 = ex2_scr[:, :]

    d_base = d_idx * dt
    shift = lp - (d_base + dt - 1)
    psh = pltpu.roll(proj_vmem[:, :], pw - shift, axis=1)
    syb = pltpu.roll(sy_scr[:, :], syw - shift, axis=1)
    ey2b = pltpu.roll(ey2_scr[:, :], syw - shift, axis=1)

    csl = pl.ds(q, hbe)
    inv_s_e = is_b[csl]
    tos_e = tos_b[csl]
    am_e = am_b[csl]
    gs_e = gs_b[csl]
    gc_e = gc_b[csl]

    def plane(j):
        c0 = dt - 1 - j
        pslice = psh[:, c0:c0 + wcc]
        muy_c = syb[:, c0 + p:c0 + p + wo]
        ey2c = ey2b[:, c0 + p:c0 + p + wo]
        r = lax.rsqrt(ex2 * ey2c + eps)
        if do_cross:
            prod = band * pslice
            sxy_c = _box_from_band(prod, k, hbe, wo, col_start=p)
            c_t = (sxy_c - sx_raw * muy_c + eps) * r
        else:
            c_t = ey2c * r                     # dummy, same shape/extent

        d_f = jnp.float32(0) + (d_base + j)
        if do_head:
            w = jnp.where(inv_s_e > 0.0, jnp.exp(beta * c_t), 0.0) * inv_s_e
            g_d = gs_e * w * (d_f - tos_e) + gc_e * (am_e == d_f)
        else:
            g_d = c_t
        gr = g_d * r
        if do_box:
            gr_scr[:, p:p + wo] = gr
            boxgr = _box_from_band(gr_scr[:, :], k, hb, wo)
        else:
            boxgr = gr[p:p + hb, :]
        if do_a1:
            a1_scr[:, :] = a1_scr[:, :] + boxgr * pslice[
                2 * p:2 * p + hb, 2 * p:2 * p + wo]
        else:
            a1_scr[:, :] = a1_scr[:, :] + boxgr
        if do_b:
            b_scr[:, :] = b_scr[:, :] + (g_d * c_t * (r * r) * ey2c)
        if do_grmu:
            grmu_scr[:, :] = grmu_scr[:, :] + gr * muy_c

    def plane_v(j, acc):
        """VREG-threaded variant: accumulators flow as values through
        the unrolled plane loop; ONE scratch read-modify-write per
        d-tile instead of one per plane."""
        a1_v, b_v, g_v = acc
        c0 = dt - 1 - j
        pslice = psh[:, c0:c0 + wcc]
        muy_c = syb[:, c0 + p:c0 + p + wo]
        ey2c = ey2b[:, c0 + p:c0 + p + wo]
        r = lax.rsqrt(ex2 * ey2c + eps)
        if do_cross:
            prod = band * pslice
            sxy_c = _box_from_band(prod, k, hbe, wo, col_start=p)
            c_t = (sxy_c - sx_raw * muy_c + eps) * r
        else:
            c_t = ey2c * r
        d_f = jnp.float32(0) + (d_base + j)
        if do_head:
            w = jnp.where(inv_s_e > 0.0, jnp.exp(beta * c_t), 0.0) * inv_s_e
            g_d = gs_e * w * (d_f - tos_e) + gc_e * (am_e == d_f)
        else:
            g_d = c_t
        gr = g_d * r
        if do_box:
            gr_scr[:, p:p + wo] = gr
            boxgr = _box_from_band(gr_scr[:, :], k, hb, wo)
        else:
            boxgr = gr[p:p + hb, :]
        a1_v = a1_v + boxgr * pslice[2 * p:2 * p + hb, 2 * p:2 * p + wo]
        b_v = b_v + (g_d * c_t * (r * r) * ey2c)
        g_v = g_v + gr * muy_c
        return (a1_v, b_v, g_v)

    def run_tile(n):
        if vreg_acc:
            acc = (a1_scr[:, :], b_scr[:, :], grmu_scr[:, :])
            for j in range(n):
                acc = plane_v(j, acc)
            a1_scr[:, :], b_scr[:, :], grmu_scr[:, :] = acc
        else:
            for j in range(n):
                plane(j)

    if n_last == dt:
        run_tile(dt)
    else:
        @pl.when(d_idx != n_d - 1)
        def _full_tile():
            run_tile(dt)

        @pl.when(d_idx == n_d - 1)
        def _last_tile():
            run_tile(n_last)

    @pl.when(d_idx == n_d - 1)
    def _epilogue():
        if do_epi:
            gr_scr[:, p:p + wo] = grmu_scr[:, :]
            t2 = _box_from_band(gr_scr[:, :], k, hb, wo)
            gr_scr[:, p:p + wo] = b_scr[:, :] * (sx_scr[:, :] * inv_k2)
            t3 = _box_from_band(gr_scr[:, :], k, hb, wo)
            gr_scr[:, p:p + wo] = b_scr[:, :]
            t4 = _box_from_band(gr_scr[:, :], k, hb, wo)
            cam_c = cam_vmem[2 * p:2 * p + hb, 2 * p:2 * p + wo]
            grad_ref[:, :] = (a1_scr[:, :] - t2) + (t3 - cam_c * t4)
        else:
            grad_ref[:, :] = (a1_scr[:, :] + b_scr[p:p + hb, :]
                              + grmu_scr[p:p + hb, :])


def build(shape=(375, 1242, 192, 15), hb=48, dt=8, interpret=False,
          **gates):
    H, W, D, K = shape
    p = K // 2
    hb = _round_up(hb, 8)
    mr32 = _round_up(H, 32)
    while hb > 8 and -(-H // hb) * hb > max(mr32, H):
        hb -= 8
    hbe = hb + 2 * p
    pa = _round_up(p, 8)
    n_d = -(-(D + 1) // dt)
    dtv = _round_up(-(-(D + 1) // n_d), 8)
    n_d = -(-(D + 1) // dtv)
    dt = dtv
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

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 9)
    camera = jax.random.uniform(ks[0], (H, W), jnp.float32)
    projector = jax.random.uniform(ks[1], (H, W), jnp.float32)
    cam_p = jnp.zeros((src_rows, wcc), jnp.float32)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (2 * p, 2 * p))
    proj_p = jnp.zeros((src_rows, pw), jnp.float32)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (2 * p, lp + 2 * p))

    maps_rows = _round_up(max(h_pad, hb + 2 * pa), 8)
    am = jnp.floor(jax.random.uniform(ks[2], (maps_rows, wo), jnp.float32,
                                      0.0, D + 1.0))
    mask = (jax.random.uniform(ks[3], (maps_rows, wo)) > 0.3).astype(
        jnp.float32)
    s = jax.random.uniform(ks[4], (maps_rows, wo), jnp.float32, 0.5, 2.0)
    t = jax.random.uniform(ks[5], (maps_rows, wo), jnp.float32, 0.0, 50.0)
    gs = jax.random.uniform(ks[6], (maps_rows, wo), jnp.float32, -1.0, 1.0)
    gc = jax.random.uniform(ks[7], (maps_rows, wo), jnp.float32, -1.0, 1.0)

    gates_full = dict(do_cross=True, do_head=True, do_box=True, do_a1=True,
                      do_b=True, do_grmu=True, do_epi=True)
    gates_full.update(gates)
    kernel = functools.partial(
        _kernel, Hs=H, Ws=W, Ds=D, k=K, eps=EPS, beta=BETA, hb=hb, dt=dt,
        wo=wo, woe=woe, wcc=wcc, pw=pw, syw=syw, lp=lp,
        maps_rows=maps_rows,
        n_last=min(dt, max(1, (D + 1) - (n_d - 1) * dt)), **gates_full)

    map_spec = pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)
    mb = hb + 4 * pa

    @jax.jit
    def run(cam_p, proj_p, am, mask, s, t, gs, gc):
        return pl.pallas_call(
            kernel,
            grid=(n_h, n_d),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
            out_specs=map_spec,
            out_shape=jax.ShapeDtypeStruct((h_pad, wo), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((band_rows, wcc), jnp.float32),
                pltpu.VMEM((band_rows, pw), jnp.float32),
                pltpu.VMEM((hbe, woe), jnp.float32),
                pltpu.VMEM((mb, wo), jnp.float32),
                pltpu.VMEM((mb, wo), jnp.float32),
                pltpu.VMEM((mb, wo), jnp.float32),
                pltpu.VMEM((mb, wo), jnp.float32),
                pltpu.VMEM((mb, wo), jnp.float32),
                pltpu.VMEM((mb, wo), jnp.float32),
                pltpu.VMEM((hbe, wo), jnp.float32),
                pltpu.VMEM((hbe, wo), jnp.float32),
                pltpu.VMEM((hbe, syw), jnp.float32),
                pltpu.VMEM((hbe, syw), jnp.float32),
                pltpu.VMEM((hb, wo), jnp.float32),
                pltpu.VMEM((hbe, wo), jnp.float32),
                pltpu.VMEM((hbe, wo), jnp.float32),
                pltpu.SemaphoreType.DMA((8,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
            interpret=interpret,
        )(cam_p, proj_p, am, mask, s, t, gs, gc)

    data = (cam_p, proj_p, am, mask, s, t, gs, gc)
    raw = (camera, projector, am, mask, s, t, gs, gc)
    return run, data, raw


CONFIGS = {
    "full": {},
    "no_cross": {"do_cross": False},
    "no_head": {"do_head": False},
    "no_box": {"do_box": False},
    "no_a1": {"do_a1": False},
    "no_bgrmu": {"do_b": False, "do_grmu": False},
    "no_epi": {"do_epi": False},
    "bare": {"do_cross": False, "do_head": False, "do_box": False,
             "do_a1": False, "do_b": False, "do_grmu": False,
             "do_epi": False},
    "full_hb32": {"hb": 32},
    "full_dt16": {"dt": 16},
    "vreg_acc": {"vreg_acc": True},
    "vreg_dt16": {"vreg_acc": True, "dt": 16},
}


def check():
    """Interpreter-mode equivalence of the full config vs production."""
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from custereomatching_tpu.ops.pallas_pipeline import (
        _fused_train_bwd_impl)

    shape = (24, 40, 10, 5)
    Hc, Wc = shape[:2]
    fn, data, (camera, projector, am, mask, s, t, gs, gc) = build(
        shape=shape, hb=8, interpret=True)
    got = fn(*data)[:Hc, :Wc]
    conf = jnp.zeros_like(am)
    want = _fused_train_bwd_impl(
        camera, projector, (am, mask, conf, s, t, gs, gc),
        shape[2], shape[3], EPS, BETA, 8, 8, True)
    err = float(jnp.max(jnp.abs(got - want)))
    rel = err / (float(jnp.max(jnp.abs(want))) + 1e-30)
    print(f"check full: max|Δ| {err:.3e} (rel {rel:.1e}) "
          f"{'OK' if rel < 1e-5 else 'MISMATCH'}", flush=True)
    assert np.isfinite(np.asarray(got)).all()
    fn_v, data_v, _ = build(shape=shape, hb=8, interpret=True,
                            vreg_acc=True)
    err_v = float(jnp.max(jnp.abs(fn_v(*data_v)[:Hc, :Wc] - want)))
    rel_v = err_v / (float(jnp.max(jnp.abs(want))) + 1e-30)
    print(f"check vreg: max|Δ| {err_v:.3e} (rel {rel_v:.1e}) "
          f"{'OK' if rel_v < 1e-5 else 'MISMATCH'}", flush=True)
    return 0 if max(rel, rel_v) < 1e-5 else 1


def _readback(x):
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def _time(fn, args, n1=10, n2=50, repeats=5):
    """Paired-median slope (bench.py::_time): the two chain lengths of
    each repetition run back-to-back and the median of the per-pair
    slopes is taken — min-of-independent-chains deflates (and under a
    relay hiccup goes negative)."""
    for _ in range(3):
        _readback(fn(*args))

    def chain(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _readback(out)
        return time.perf_counter() - t0

    chain(n2)
    slopes = sorted((chain(n2) - chain(n1)) / (n2 - n1)
                    for _ in range(repeats))
    return max(slopes[len(slopes) // 2], 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        rc = check()
        if rc:
            return rc
    results = {}
    for name in args.configs.split(","):
        cfg = CONFIGS[name]
        try:
            fn, data, _ = build(**cfg)
            t = _time(fn, data)
            results[name] = t
            delta = ""
            if "full" in results and name != "full":
                delta = f"  (full − this = {1e3*(results['full']-t):+.3f})"
            print(f"{name:>10}: {t*1e3:.3f} ms{delta}", flush=True)
        except Exception as e:
            print(f"{name:>10}: FAIL {str(e).splitlines()[0][:140]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
