"""Stage-gated ablation sweep for the HDW volume forward (round 4).

BENCH_r03 put the volume forward at 79.9% of its calibrated bound
(2.18 ms vs 1.74) while every sibling kernel sits at 85-101%.  The
hypothesis under test: the per-plane store ``out_ref[:, j, :]`` into an
``(hb, dt, wo)`` VMEM out-block writes ONE SUBLANE of each (8, 128)
tile — 8x the vector stores of a contiguous 2D store — an op class the
cost model does not price (the round-3 analogue was the [rows, 1, w]
unit-dim DMA staging, BASELINE.md).

Variants (mirrors of ops/pallas_zncc.py::_banded_kernel, same math):

  shipped  the production kernel as-is (pallas_cost_volume_banded_hdw)
  nostore  plane loop writes each plane over a single [hb, wo] 2D map —
           full-vreg stores, no volume in HBM: the pure compute leg
  dhw      out block (dt, hb, wo) / volume [planes, H, W]: each plane
           store is a contiguous [hb, wo] 2D store and the out-DMA
           geometry is unchanged — isolates the strided-store cost
  stack    planes collected in registers, one stacked (hb, dt, wo)
           store per tile — tests whether Mosaic's relayout beats the
           per-plane masked stores

Run: python scripts/sweep6_volfwd_ablate.py [--check] [--sweep]
``--check`` verifies each mirror against the shipped kernel on-device
(small shape); ``--sweep`` adds an (hb, dt) sweep of the best variant.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from custereomatching_tpu.ops.pallas_zncc import (
    _box_from_band,
    _round_up,
    pallas_cost_volume_banded_hdw,
)

H, W, D, K = 375, 1242, 192, 15


def _variant_kernel(cam_hbm, proj_hbm, out_ref,
                    cam_vmem, proj_vmem, sx_scr, ex2_scr, sy_scr, ey2_scr,
                    sems,
                    *, D, k, eps, hb, dt, wo, wcc, pw, syw, lp, n_last,
                    variant):
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    p = k // 2
    band_rows = _round_up(hb + 2 * p, 8)
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
        sx = _box_from_band(cam, k, hb, wo)
        sx_scr[:, :] = sx * inv_k2
        ex2_scr[:, :] = _box_from_band(cam * cam, k, hb, wo) - sx * sx * inv_k2
        proj = proj_vmem[:, :]
        sy = _box_from_band(proj, k, hb, syw)
        sy_scr[:, :] = sy
        ey2_scr[:, :] = (_box_from_band(proj * proj, k, hb, syw)
                         - sy * sy * inv_k2)

    band = cam_vmem[:, :]
    mux = sx_scr[:, :]
    ex2 = ex2_scr[:, :]
    d_base = d_idx * dt
    shift = lp - (d_base + dt - 1)
    psh = pltpu.roll(proj_vmem[:, :], pw - shift, axis=1)
    syb = pltpu.roll(sy_scr[:, :], syw - shift, axis=1)
    ey2b = pltpu.roll(ey2_scr[:, :], syw - shift, axis=1)

    def plane_val(j):
        c0 = dt - 1 - j
        prod = band * psh[:, c0:c0 + wcc]
        sxy = _box_from_band(prod, k, hb, wo)
        exy = sxy - mux * syb[:, c0:c0 + wo]
        r = lax.rsqrt(ex2 * ey2b[:, c0:c0 + wo] + eps)
        return (exy + eps) * r

    def run(n):
        if variant == "stack":
            vals = [plane_val(j) for j in range(n)]
            if n < dt:
                vals = vals + [vals[-1]] * (dt - n)
            out_ref[:, :, :] = jnp.stack(vals, axis=1)
        else:
            for j in range(n):
                v = plane_val(j)
                if variant == "nostore":
                    out_ref[:, :] = v
                elif variant == "dhw":
                    out_ref[j, :, :] = v
                else:
                    out_ref[:, j, :] = v

    if n_last == dt:
        run(dt)
    else:
        @pl.when(d_idx != n_d - 1)
        def _full_tile():
            run(dt)

        @pl.when(d_idx == n_d - 1)
        def _last_tile():
            run(n_last)


def _manual_kernel(cam_hbm, proj_hbm, out_hbm,
                   cam_vmem, proj_vmem, sx_scr, ex2_scr, sy_scr, ey2_scr,
                   sems, vol_buf, out_sem,
                   *, D, k, eps, hb, dt, wo, wcc, pw, syw, lp, n_last):
    """HDW HBM layout, DHW-ordered VMEM staging, per-plane strided DMA.

    Plane stores hit a contiguous [hb, wo] 2D buffer (full vregs); each
    plane's DMA to the [h, plane, w] HBM volume starts right after its
    store and drains two grid steps later (2-slot rotation) — write
    overlap is under kernel control instead of the out_specs revolver."""
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    n_h = pl.num_programs(0)
    step = h_idx * n_d + d_idx
    slot = lax.rem(step, 2)
    p = k // 2
    band_rows = _round_up(hb + 2 * p, 8)
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
        sx = _box_from_band(cam, k, hb, wo)
        sx_scr[:, :] = sx * inv_k2
        ex2_scr[:, :] = _box_from_band(cam * cam, k, hb, wo) - sx * sx * inv_k2
        proj = proj_vmem[:, :]
        sy = _box_from_band(proj, k, hb, syw)
        sy_scr[:, :] = sy
        ey2_scr[:, :] = (_box_from_band(proj * proj, k, hb, syw)
                         - sy * sy * inv_k2)

    def out_copy(sl, j):
        # DHW destination [planes, h_pad, wo]: the plane axis is dim 0
        # (untiled — arbitrary offsets legal); the row slice offset
        # h_idx·hb is 8-aligned.  In HDW the plane axis is tiled and
        # Mosaic rejects width-1 slices of it.
        return pltpu.make_async_copy(
            vol_buf.at[sl, j],
            out_hbm.at[d_idx * dt + j, pl.ds(h_idx * hb, hb), :],
            out_sem.at[sl])

    @pl.when(step >= 2)
    def _drain_prev():
        for j in range(dt):
            out_copy(slot, j).wait()

    band = cam_vmem[:, :]
    mux = sx_scr[:, :]
    ex2 = ex2_scr[:, :]
    d_base = d_idx * dt
    shift = lp - (d_base + dt - 1)
    psh = pltpu.roll(proj_vmem[:, :], pw - shift, axis=1)
    syb = pltpu.roll(sy_scr[:, :], syw - shift, axis=1)
    ey2b = pltpu.roll(ey2_scr[:, :], syw - shift, axis=1)

    def plane(j):
        c0 = dt - 1 - j
        prod = band * psh[:, c0:c0 + wcc]
        sxy = _box_from_band(prod, k, hb, wo)
        exy = sxy - mux * syb[:, c0:c0 + wo]
        r = lax.rsqrt(ex2 * ey2b[:, c0:c0 + wo] + eps)
        vol_buf[slot, j] = (exy + eps) * r
        out_copy(slot, j).start()

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
            # Padded tail planes: DMA whatever the slot holds (garbage by
            # contract) so the per-slot copy count stays uniform.
            for j in range(n_last, dt):
                out_copy(slot, j).start()

    @pl.when(step == n_h * n_d - 1)
    def _final_drain():
        @pl.when(step >= 1)
        def _other():
            other = lax.rem(step + 1, 2)
            for j in range(dt):
                out_copy(other, j).wait()
        for j in range(dt):
            out_copy(slot, j).wait()


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _variant_call(camera, projector, num_disparities, kernel_size,
                  block_rows, block_disparities, variant, interpret=False):
    H_, W_ = camera.shape
    D_ = int(num_disparities)
    k = int(kernel_size)
    p = k // 2
    hb = _round_up(int(block_rows), 8)
    n_d = -(-(D_ + 1) // int(block_disparities))
    dt = _round_up(-(-(D_ + 1) // n_d), 8)
    n_d = -(-(D_ + 1) // dt)
    wo = _round_up(max(W_, 128), 128)
    wcc = _round_up(wo + 2 * p, 128)
    lp = _round_up(max(D_ + 1, n_d * dt), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)
    n_h = -(-H_ // hb)
    h_pad = n_h * hb
    band_rows = _round_up(hb + 2 * p, 8)
    src_rows = h_pad + band_rows

    cam_p = jnp.zeros((src_rows, wcc), camera.dtype)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (p, p))
    proj_p = jnp.zeros((src_rows, pw), projector.dtype)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (p, lp + p))

    vol_planes = n_d * dt
    if variant == "manual":
        kernel = functools.partial(
            _manual_kernel, D=D_, k=k, eps=1e-8, hb=hb, dt=dt, wo=wo,
            wcc=wcc, pw=pw, syw=syw, lp=lp,
            n_last=(D_ + 1) - (n_d - 1) * dt)
        return pl.pallas_call(
            kernel,
            grid=(n_h, n_d),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((vol_planes, h_pad, wo),
                                           camera.dtype),
            scratch_shapes=[
                pltpu.VMEM((band_rows, wcc), camera.dtype),
                pltpu.VMEM((band_rows, pw), camera.dtype),
                pltpu.VMEM((hb, wo), camera.dtype),
                pltpu.VMEM((hb, wo), camera.dtype),
                pltpu.VMEM((hb, syw), camera.dtype),
                pltpu.VMEM((hb, syw), camera.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, dt, hb, wo), camera.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(cam_p, proj_p)

    kernel = functools.partial(
        _variant_kernel, D=D_, k=k, eps=1e-8, hb=hb, dt=dt, wo=wo,
        wcc=wcc, pw=pw, syw=syw, lp=lp,
        n_last=(D_ + 1) - (n_d - 1) * dt, variant=variant)

    if variant == "nostore":
        out_spec = pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((h_pad, wo), camera.dtype)
    elif variant == "dhw":
        out_spec = pl.BlockSpec((dt, hb, wo), lambda h, d: (d, h, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((vol_planes, h_pad, wo),
                                         camera.dtype)
    else:
        out_spec = pl.BlockSpec((hb, dt, wo), lambda h, d: (h, d, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((h_pad, vol_planes, wo),
                                         camera.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n_h, n_d),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((band_rows, wcc), camera.dtype),
            pltpu.VMEM((band_rows, pw), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.VMEM((hb, syw), camera.dtype),
            pltpu.VMEM((hb, syw), camera.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(cam_p, proj_p)


def _readback(x):
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def _chain(fn, args, n, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _readback(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _time(fn, *args):
    for _ in range(3):
        _readback(fn(*args))
    _chain(fn, args, 24, 1)
    slopes = sorted(
        (_chain(fn, args, 24, 1) - _chain(fn, args, 6, 1)) / 18
        for _ in range(5))
    return max(slopes[len(slopes) // 2], 1e-9)


def check():
    """Each mirror's volume vs the shipped kernel (on-device, small)."""
    Hs, Ws, Ds = 56, 200, 24
    rng = np.random.default_rng(3)
    cam = jnp.asarray(rng.random((Hs, Ws), dtype=np.float32))
    proj = jnp.asarray(rng.random((Hs, Ws), dtype=np.float32))
    ref = np.asarray(pallas_cost_volume_banded_hdw(
        cam, proj, Ds, K, 1e-8, 16, 8, False, False))
    for variant in ("shipped", "dhw", "stack", "manual"):
        got = np.asarray(_variant_call(cam, proj, Ds, K, 16, 8, variant))
        if variant in ("dhw", "manual"):
            got = np.transpose(got, (1, 0, 2))
        got = got[:Hs, :Ds + 1, :Ws]
        err = np.abs(got - ref[:Hs, :Ds + 1, :Ws]).max()
        print(f"check {variant}: max|diff| vs shipped = {err:g}", flush=True)
        assert err < 1e-6, variant


def main():
    if "--check" in sys.argv:
        check()
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((H, W), dtype=np.float32))

    for variant in ("shipped", "nostore", "dhw", "stack", "manual"):
        try:
            fn = jax.jit(lambda c, p, v=variant: _variant_call(
                c, p, D, K, 48, 8, v))
            t = _time(fn, cam, proj)
            print(f"{variant:8s} (48, 8): {t*1e3:.3f} ms ({1/t:.1f} fps)",
                  flush=True)
        except Exception as e:
            print(f"{variant:8s} (48, 8): FAIL "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    if "--sweep" in sys.argv:
        for hb, dt in [(48, 8), (48, 16), (48, 24), (64, 8), (96, 8),
                       (32, 8), (48, 40)]:
            for variant in ("manual", "dhw"):
                try:
                    fn = jax.jit(lambda c, p, v=variant, a=hb, b=dt:
                                 _variant_call(c, p, D, K, a, b, v))
                    t = _time(fn, cam, proj)
                    print(f"sweep {variant} ({hb}, {dt}): {t*1e3:.3f} ms",
                          flush=True)
                except Exception as e:
                    print(f"sweep {variant} ({hb}, {dt}): FAIL "
                          f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
