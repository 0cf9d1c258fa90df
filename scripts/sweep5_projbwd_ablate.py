"""Ablate the projector-gradient backward's per-plane stages on TPU.

Companion to sweep4 for ``_proj_bwd_kernel`` (the worst model ratio of
the three backward kernels).  Its per-plane schedule differs from the
camera backward in one important way: the cotangent/cost tiles live in
the VOLUME x-frame and need a per-plane lane ROLL into the shifted
camera frame (two ``pltpu.roll`` of ``[hbe, gw]`` per plane), where the
camera backward only takes lane-shifted static slices.  The gates
isolate that cost (``no_rollg`` / ``no_rollc``), the box pass, the
rsqrt, and the three accumulations; ``pair`` folds N planes per
accumulator round-trip.

Usage:
  python scripts/sweep5_projbwd_ablate.py [--configs full,...]  # TPU
  python scripts/sweep5_projbwd_ablate.py --check               # CPU
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


def _kernel(cam_hbm, proj_hbm, g_hbm, c_hbm,
            a1p_ref, z2_ref, z3_ref,
            cam_vmem, proj_vmem, g_vmem, c_vmem,
            sx_scr, ex2_scr, ey2_scr,
            a1p_scr, z2_scr, z3_scr, sems,
            *, D, k, eps, hb, dt,
            wo, won, gw, sxw, cw, wcc, g_rows, n_last,
            pair, do_rollg, do_rollc, do_r, do_box, do_a1, do_z2, do_z3):
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
        sx_scr[:, :] = sx * inv_k2
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

    def _issue(hi, di, sl):
        r0i = hi * hb
        s0i = jnp.clip(r0i - p, 0, g_rows - hbe)
        g_dma = pltpu.make_async_copy(
            g_hbm.at[pl.ds(s0i, hbe), pl.ds(di * dt, dt), :],
            g_vmem.at[sl, pl.ds(p, hbe), slice(None), pl.ds(0, wo)],
            sems.at[2 + sl])
        c_dma = pltpu.make_async_copy(
            c_hbm.at[pl.ds(jnp.clip(r0i, 0, g_rows - hb), hb),
                     pl.ds(di * dt, dt), :],
            c_vmem.at[sl, slice(None), slice(None), pl.ds(0, wo)],
            sems.at[4 + sl])
        return g_dma, c_dma

    @pl.when(step == 0)
    def _zero_and_first():
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
    cam_roll = pltpu.roll(cam_vmem[:, :], cw - d_base, axis=1)
    mux_roll = pltpu.roll(sx_scr[:, :], sxw - d_base, axis=1)
    ex2_roll = pltpu.roll(ex2_scr[:, :], sxw - d_base, axis=1)
    ey2p = ey2_scr[:, :]

    for cp in _issue(h_idx, d_idx, slot):
        cp.wait()

    delta = (r0 - p) - jnp.clip(r0 - p, 0, g_rows - hbe)
    trow = lax.broadcasted_iota(jnp.int32, (hbe, 1), 0)
    rmask = jnp.logical_and(trow + (r0 - p) >= 0,
                            trow + (r0 - p) < g_rows)

    def plane_terms(j):
        ex2_sh = ex2_roll[:, j:j + won]
        if do_r:
            r = lax.rsqrt(ex2_sh * ey2p + eps)
        else:
            r = ex2_sh
        gc_shift = jnp.mod(jnp.int32(p) - d_base, gw)
        if do_rollg:
            graw = jnp.where(
                rmask,
                pltpu.roll(g_vmem[slot, pl.ds(delta + p, hbe), j, :],
                           gc_shift, axis=1)[:, j:j + won],
                0.0)
        else:
            graw = jnp.where(
                rmask, g_vmem[slot, pl.ds(delta + p, hbe), j, :won], 0.0)
        gr = graw * r
        if do_box:
            boxgr = _box_from_band(gr, k, hb, wo)
        else:
            boxgr = gr[p:p + hb, :wo]
        if do_a1:
            a1_t = boxgr * cam_roll[2 * p:2 * p + hb,
                                    j + 2 * p:j + 2 * p + wo]
        else:
            a1_t = boxgr
        c_sl = (slice(p, p + hb), slice(None))
        z2_t = (gr[c_sl] * mux_roll[p:p + hb, j:j + won]
                if do_z2 else None)
        if do_z3:
            if do_rollc:
                c_sh = pltpu.roll(c_vmem[slot, :, j, :], gc_shift,
                                  axis=1)[:, j:j + won]
            else:
                c_sh = c_vmem[slot, :, j, :won]
            r_c = r[c_sl]
            z3_t = graw[c_sl] * c_sh * (r_c * r_c) * ex2_sh[c_sl]
        else:
            z3_t = None
        return a1_t, z2_t, z3_t

    def run_planes(n):
        for j0 in range(0, n, pair):
            a1_t, z2_t, z3_t = plane_terms(j0)
            for j in range(j0 + 1, min(j0 + pair, n)):
                a1_j, z2_j, z3_j = plane_terms(j)
                a1_t = a1_t + a1_j
                z2_t = None if z2_t is None else z2_t + z2_j
                z3_t = None if z3_t is None else z3_t + z3_j
            a1p_scr[:, :] = a1p_scr[:, :] + a1_t
            if z2_t is not None:
                z2_scr[:, :] = z2_scr[:, :] + z2_t
            if z3_t is not None:
                z3_scr[:, :] = z3_scr[:, :] + z3_t

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
        a1p_ref[:, :] = a1p_scr[:, :]
        z2_ref[:, :] = z2_scr[:, :]
        z3_ref[:, :] = z3_scr[:, :]


def build(hb=32, dt=8, pair=1, shape=None, interpret=False, **gates):
    H, W, D, K = shape if shape is not None else SHAPE
    p = K // 2
    hb = _round_up(hb, 8)
    wo = _round_up(max(W, 128), 128)
    n_planes = _round_up(D + 1, 8)
    if n_planes % dt:
        raise ValueError(f"dt {dt} does not divide {n_planes}")
    n_d = n_planes // dt

    hbe = hb + 2 * p
    won = wo + 128
    lp = _round_up(max(D + 1, n_d * dt), 128)
    gw = _round_up(won + lp, 128)
    sxw = _round_up(won + lp, 128)
    cw = _round_up(sxw + 2 * p, 128)
    wcc = _round_up(won + 2 * p, 128)

    n_h = -(-H // hb)
    h_pad = n_h * hb
    band_rows = _round_up(hbe + 2 * p, 8)
    src_rows = h_pad + band_rows

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    camera = jax.random.uniform(k1, (H, W), jnp.float32)
    projector = jax.random.uniform(k2, (H, W), jnp.float32)
    cam_p = jnp.zeros((src_rows, cw), jnp.float32)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (2 * p, 2 * p))
    proj_p = jnp.zeros((src_rows, wcc), jnp.float32)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (2 * p, 2 * p))

    g_rows = max(h_pad, hbe)
    # Zero-cotangent contract: padded rows/planes/columns are zero.
    g = jax.random.uniform(k3, (g_rows, n_planes, wo), jnp.float32,
                           -1.0, 1.0)
    valid = ((jnp.arange(g_rows)[:, None, None] < H)
             & (jnp.arange(n_planes)[None, :, None] <= D)
             & (jnp.arange(wo)[None, None, :] < W))
    g = jnp.where(valid, g, 0.0)
    cost = jax.random.uniform(k4, (g_rows, n_planes, wo), jnp.float32,
                              -1.0, 1.0)

    gates_full = dict(do_rollg=True, do_rollc=True, do_r=True, do_box=True,
                      do_a1=True, do_z2=True, do_z3=True)
    gates_full.update(gates)
    kernel = functools.partial(
        _kernel, D=D, k=K, eps=EPS, hb=hb, dt=dt,
        wo=wo, won=won, gw=gw, sxw=sxw, cw=cw, wcc=wcc, g_rows=g_rows,
        n_last=min(dt, max(1, (D + 1) - (n_d - 1) * dt)),
        pair=pair, **gates_full)

    map_spec = pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)
    ext_spec = pl.BlockSpec((hb, won), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(cam_p, proj_p, g, cost):
        return pl.pallas_call(
            kernel,
            grid=(n_h, n_d),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=(map_spec, ext_spec, ext_spec),
            out_shape=(jax.ShapeDtypeStruct((h_pad, wo), jnp.float32),
                       jax.ShapeDtypeStruct((h_pad, won), jnp.float32),
                       jax.ShapeDtypeStruct((h_pad, won), jnp.float32)),
            scratch_shapes=[
                pltpu.VMEM((band_rows, cw), jnp.float32),
                pltpu.VMEM((band_rows, wcc), jnp.float32),
                pltpu.VMEM((2, hbe + 2 * p, dt, gw), jnp.float32),
                pltpu.VMEM((2, hb, dt, gw), jnp.float32),
                pltpu.VMEM((hbe, sxw), jnp.float32),
                pltpu.VMEM((hbe, sxw), jnp.float32),
                pltpu.VMEM((hbe, won), jnp.float32),
                pltpu.VMEM((hb, wo), jnp.float32),
                pltpu.VMEM((hb, won), jnp.float32),
                pltpu.VMEM((hb, won), jnp.float32),
                pltpu.SemaphoreType.DMA((6,)),
            ],
            interpret=interpret,
        )(cam_p, proj_p, g, cost)

    return run, (cam_p, proj_p, g, cost), (camera, projector, g, cost)


CONFIGS = {
    "full": {},
    "hb40": {"hb": 40},
    "hb48": {"hb": 48},
    "dt16": {"dt": 16},
    "pair2": {"pair": 2},
    "pair4": {"pair": 4},
    "no_rollg": {"do_rollg": False},
    "no_rollc": {"do_rollc": False},
    "no_rolls": {"do_rollg": False, "do_rollc": False},
    "no_box": {"do_box": False},
    "no_r": {"do_r": False},
    "no_z2z3": {"do_z2": False, "do_z3": False},
    "no_a1mul": {"do_a1": False},
    "bare": {"do_rollg": False, "do_rollc": False, "do_r": False,
             "do_box": False, "do_a1": False, "do_z2": False,
             "do_z3": False},
}


def check(configs=("full", "pair2", "pair4", "dt16")):
    """Interpreter-mode equivalence vs the shipped projector backward."""
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from custereomatching_tpu.ops.pallas_zncc_bwd import (
        pallas_projector_grad_banded_hdw_with_cost)
    from custereomatching_tpu.ops.zncc import box2d

    shape = (24, 40, 10, 5)
    Hc, Wc, Dc, Kc = shape
    p = Kc // 2
    failed = False
    for name in configs:
        cfg = dict(CONFIGS[name])
        cfg.setdefault("hb", 8)
        fn, data, (camera, projector, g, cost) = build(
            shape=shape, interpret=True, **cfg)
        a1p, z2, z3 = fn(*data)
        won = z2.shape[1]
        a1p = a1p[:Hc, :Wc]
        z2e, z3e = z2[:Hc], z3[:Hc]
        k2 = jnp.asarray(Kc * Kc, jnp.float32)
        muy_e = box2d(jnp.pad(projector, ((0, 0), (p, p))), Kc) / k2
        muy_e = jnp.pad(muy_e, ((0, 0), (0, won - (Wc + 2 * p))))
        t2 = box2d(z2e, Kc)[:, p:p + Wc]
        t3 = projector * box2d(z3e, Kc)[:, p:p + Wc]
        t4 = box2d(muy_e * z3e, Kc)[:, p:p + Wc]
        got = a1p - t2 - t3 + t4
        # The mirror keeps round-3's rows-major staging; production
        # consumes the plane-major layout since round 4.
        want = pallas_projector_grad_banded_hdw_with_cost(
            camera, projector, cost.transpose(1, 0, 2),
            g.transpose(1, 0, 2), Dc, Kc, EPS,
            block_rows=cfg["hb"], block_disparities=cfg.get("dt", 8),
            interpret=True)
        err = float(jnp.max(jnp.abs(got - want)))
        rel = err / (float(jnp.max(jnp.abs(want))) + 1e-30)
        ok = rel < 1e-5
        failed |= not ok
        print(f"check {name:>10}: max|Δ| {err:.3e} (rel {rel:.1e}) "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        assert np.isfinite(np.asarray(got)).all()
    return 1 if failed else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        raise SystemExit(check())
    for name in args.configs.split(","):
        try:
            fn, data, _ = build(**CONFIGS[name])
            t = _time(fn, *data)
            print(f"{name:>10}: {t * 1e3:7.3f} ms", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name:>10}: FAILED {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
