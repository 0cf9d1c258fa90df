"""Ablate the bwd kernel's per-plane stages to locate the 6 ms."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from custereomatching_tpu.ops.pallas_zncc import _box_from_band, _round_up

H, W, D, K = 375, 1242, 192, 15


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


def _kernel(cam_hbm, proj_hbm, g_hbm,
            a1_ref, b_ref, grmu_ref,
            cam_vmem, proj_vmem, g_vmem,
            sx_scr, ex2_scr, sy_scr, ey2_scr,
            a1_scr, b_scr, grmu_scr, sems,
            *, k, eps, hb, dt, wo, woe, wcc, pw, syw, lp, g_rows,
            mode):
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    p = k // 2
    hbe = hb + 2 * p
    band_rows = _round_up(hbe + 2 * p, 8)
    inv_k2 = 1.0 / float(k * k)

    @pl.when(d_idx == 0)
    def _init():
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
        sx_scr[:, :] = sx * inv_k2
        ex2_scr[:, :] = _box_from_band(cam * cam, k, hbe, woe) \
            - sx * sx * inv_k2
        proj = proj_vmem[:, :]
        sy = _box_from_band(proj, k, hbe, syw)
        sy_scr[:, :] = sy
        ey2_scr[:, :] = (_box_from_band(proj * proj, k, hbe, syw)
                         - sy * sy * inv_k2)
        a1_scr[:, :] = jnp.zeros((hb, wo), a1_scr.dtype)
        b_scr[:, :] = jnp.zeros((hb, wo), b_scr.dtype)
        grmu_scr[:, :] = jnp.zeros((hb, wo), grmu_scr.dtype)

    r0 = h_idx * hb
    g_dma = pltpu.make_async_copy(
        g_hbm.at[pl.ds(jnp.clip(r0 - p, 0, g_rows - hbe), hbe),
                 pl.ds(d_idx * dt, dt), :],
        g_vmem.at[pl.ds(p, hbe)], sems.at[2])
    if mode != "nog":
        g_dma.start()

    band = cam_vmem[:, :]
    mux = sx_scr[:, :]
    ex2 = ex2_scr[:, :]
    d_base = d_idx * dt
    shift = lp - (d_base + dt - 1)
    psh = pltpu.roll(proj_vmem[:, :], pw - shift, axis=1)
    syb = pltpu.roll(sy_scr[:, :], syw - shift, axis=1)
    ey2b = pltpu.roll(ey2_scr[:, :], syw - shift, axis=1)
    if mode != "nog":
        g_dma.wait()

    for j in range(dt):
        c0 = dt - 1 - j
        ey2_sh = ey2b[:, c0:c0 + woe]
        r = lax.rsqrt(ex2 * ey2_sh + eps)
        c_sl = (slice(p, p + hb), slice(p, p + wo))

        if mode in ("full", "nog", "noa1", "nofwd"):
            if mode == "nofwd":
                n_c = jnp.ones((hb, wo), band.dtype)
            else:
                prod_c = (band[p:p + hb + 2 * p, p:p + wo + 2 * p]
                          * psh[p:p + hb + 2 * p,
                                c0 + p:c0 + p + wo + 2 * p])
                sxy_c = _box_from_band(prod_c, k, hb, wo)
                sy_c = syb[p:p + hb, c0 + p:c0 + p + wo]
                n_c = sxy_c - mux[c_sl] * sy_c + eps

            if mode == "nog":
                g_ext = jnp.ones((hbe, woe), band.dtype)
            else:
                delta = (r0 - p) - jnp.clip(r0 - p, 0, g_rows - hbe)
                raw = g_vmem[pl.ds(delta + p, hbe), j, :]
                trow = lax.broadcasted_iota(jnp.int32, (hbe, 1), 0)
                rmask = jnp.logical_and(trow + (r0 - p) >= 0,
                                        trow + (r0 - p) < g_rows)
                raw = jnp.where(rmask, raw, 0.0)
                zcol = jnp.zeros((hbe, p), raw.dtype)
                g_ext = jnp.concatenate([zcol, raw, zcol], axis=1)
            gr = g_ext * r

            if mode != "noa1":
                boxgr = _box_from_band(gr, k, hb, wo)
                a1_scr[:, :] = a1_scr[:, :] + boxgr * psh[
                    2 * p:2 * p + hb, c0 + 2 * p:c0 + 2 * p + wo]
            r_c = r[c_sl]
            b_scr[:, :] = b_scr[:, :] + (g_ext[c_sl] * n_c
                                         * (r_c * r_c * r_c)
                                         * ey2_sh[c_sl])
            sy_c2 = syb[p:p + hb, c0 + p:c0 + p + wo]
            grmu_scr[:, :] = grmu_scr[:, :] + gr[c_sl] * (sy_c2 * inv_k2)

    @pl.when(d_idx == n_d - 1)
    def _fin():
        a1_ref[:, :] = a1_scr[:, :]
        b_ref[:, :] = b_scr[:, :]
        grmu_ref[:, :] = grmu_scr[:, :]


def run(camera, projector, g, mode, hb=48, dt=8):
    k = K
    p = k // 2
    hbe = hb + 2 * p
    n_d = 200 // dt
    wo = 1280
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
    proj_p = lax.dynamic_update_slice(proj_p, projector,
                                      (2 * p, lp + 2 * p))
    kernel = functools.partial(
        _kernel, k=k, eps=1e-8, hb=hb, dt=dt, wo=wo, woe=woe, wcc=wcc,
        pw=pw, syw=syw, lp=lp, g_rows=g.shape[0], mode=mode)
    map_shape = jax.ShapeDtypeStruct((h_pad, wo), camera.dtype)
    map_spec = pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_h, n_d),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(map_spec,) * 3,
        out_shape=(map_shape,) * 3,
        scratch_shapes=[
            pltpu.VMEM((band_rows, wcc), camera.dtype),
            pltpu.VMEM((band_rows, pw), camera.dtype),
            pltpu.VMEM((hbe + 2 * p, dt, wo), camera.dtype),
            pltpu.VMEM((hbe, woe), camera.dtype),
            pltpu.VMEM((hbe, woe), camera.dtype),
            pltpu.VMEM((hbe, syw), camera.dtype),
            pltpu.VMEM((hbe, syw), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(cam_p, proj_p, g)


def main():
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((H, W), dtype=np.float32))
    g = jnp.asarray(rng.random((384, 200, 1280), dtype=np.float32))
    for mode in ["full", "nofwd", "nog", "noa1", "empty"]:
        fn = jax.jit(lambda c, p2, gg, m=mode: run(c, p2, gg, m))
        t = _time(fn, cam, proj, g)
        print(f"bwd ablate {mode}: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
