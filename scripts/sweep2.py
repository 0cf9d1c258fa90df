"""Round-2 perf experiments: pipeline head ablations + bwd OOM diagnosis."""

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

from custereomatching_tpu.ops.pallas_zncc import (
    _box_from_band,
    _round_up,
    pallas_cost_volume_banded_hdw,
)
from custereomatching_tpu.ops.pallas_zncc_bwd import (
    pallas_camera_grad_banded_hdw,
)

H, W, D, K = 375, 1242, 192, 15


def _readback(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


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
    t1 = _chain(fn, args, 8)
    t2 = _chain(fn, args, 32)
    return max((t2 - t1) / 24, 1e-9)


def _ablation_kernel(cam_hbm, proj_hbm, m_ref,
                     cam_vmem, proj_vmem, sx_scr, ex2_scr, sy_scr, ey2_scr,
                     m_scr, s_scr, t_scr, am_scr, sems,
                     *, D, k, eps, beta, hb, dt, wo, wcc, pw, syw, lp,
                     mode):
    """Pipeline kernel with selectable head:
    mode 0 = full online-softmax head (same math as production)
    mode 1 = max-only head (no exp/recip/softmax)
    mode 2 = plain accumulate (sum of planes; no head at all)
    """
    h_idx = pl.program_id(0)
    d_idx = pl.program_id(1)
    n_d = pl.num_programs(1)
    p = k // 2
    band_rows = _round_up(hb + 2 * p, 8)
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
        sx = _box_from_band(cam, k, hb, wo)
        sx_scr[:, :] = sx * inv_k2
        ex2_scr[:, :] = _box_from_band(cam * cam, k, hb, wo) \
            - sx * sx * inv_k2
        proj = proj_vmem[:, :]
        sy = _box_from_band(proj, k, hb, syw)
        sy_scr[:, :] = sy
        ey2_scr[:, :] = (_box_from_band(proj * proj, k, hb, syw)
                         - sy * sy * inv_k2)
        m_scr[:, :] = jnp.full((hb, wo), -3.0e38, m_scr.dtype)
        s_scr[:, :] = jnp.zeros((hb, wo), s_scr.dtype)
        t_scr[:, :] = jnp.zeros((hb, wo), t_scr.dtype)
        am_scr[:, :] = jnp.zeros((hb, wo), am_scr.dtype)

    band = cam_vmem[:, :]
    mux = sx_scr[:, :]
    ex2 = ex2_scr[:, :]
    d_base = d_idx * dt
    shift = lp - (d_base + dt - 1)
    psh = pltpu.roll(proj_vmem[:, :], pw - shift, axis=1)
    syb = pltpu.roll(sy_scr[:, :], syw - shift, axis=1)
    ey2b = pltpu.roll(ey2_scr[:, :], syw - shift, axis=1)

    for j in range(dt):
        c0 = dt - 1 - j
        prod = band * psh[:, c0:c0 + wcc]
        sxy = _box_from_band(prod, k, hb, wo)
        exy = sxy - mux * syb[:, c0:c0 + wo]
        r = lax.rsqrt(ex2 * ey2b[:, c0:c0 + wo] + eps)
        c = (exy + eps) * r
        d = d_base + j
        d_f = d.astype(c.dtype)
        if mode == 2:
            m_scr[:, :] = m_scr[:, :] + c
        elif mode == 1:
            valid = d <= D
            cm = jnp.where(valid, c, -3.0e38)
            better = cm > m_scr[:, :]
            am_scr[:, :] = jnp.where(better, d_f, am_scr[:, :])
            m_scr[:, :] = jnp.where(better, cm, m_scr[:, :])
        else:
            bm = m_scr[:, :]
            bc = beta * c
            em = jnp.where(d <= D, jnp.exp(bc - bm), 0.0)
            better = em > 1.0
            scale = jnp.where(better, 1.0 / em, 1.0)
            e = jnp.where(better, 1.0, em)
            s_scr[:, :] = s_scr[:, :] * scale + e
            t_scr[:, :] = t_scr[:, :] * scale + d_f * e
            am_scr[:, :] = jnp.where(better, d_f, am_scr[:, :])
            m_scr[:, :] = jnp.where(better, bc, bm)

    @pl.when(d_idx == n_d - 1)
    def _fin():
        m_ref[:, :] = m_scr[:, :] + s_scr[:, :] + t_scr[:, :]


def ablation(camera, projector, mode, hb=32, bd=40):
    k = K
    p = k // 2
    Dv = D
    hb = _round_up(hb, 8)
    n_d = -(-(Dv + 1) // bd)
    dt = _round_up(-(-(Dv + 1) // n_d), 8)
    wo = _round_up(max(W, 128), 128)
    wcc = _round_up(wo + 2 * p, 128)
    lp = _round_up(max(Dv + 1, n_d * dt), 128)
    syw = wcc + lp
    pw = _round_up(syw + 2 * p, 128)
    n_h = -(-H // hb)
    h_pad = n_h * hb
    band_rows = _round_up(hb + 2 * p, 8)
    src_rows = h_pad + band_rows
    cam_p = jnp.zeros((src_rows, wcc), camera.dtype)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (p, p))
    proj_p = jnp.zeros((src_rows, pw), projector.dtype)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (p, lp + p))
    kernel = functools.partial(
        _ablation_kernel, D=Dv, k=k, eps=1e-8, beta=50.0, hb=hb, dt=dt,
        wo=wo, wcc=wcc, pw=pw, syw=syw, lp=lp, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(n_h, n_d),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec((hb, wo), lambda h, d: (h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_pad, wo), camera.dtype),
        scratch_shapes=[
            pltpu.VMEM((band_rows, wcc), camera.dtype),
            pltpu.VMEM((band_rows, pw), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.VMEM((hb, syw), camera.dtype),
            pltpu.VMEM((hb, syw), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.VMEM((hb, wo), camera.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(cam_p, proj_p)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    cam = jnp.asarray(rng.random((H, W), dtype=np.float32))
    proj = jnp.asarray(rng.random((H, W), dtype=np.float32))

    if which in ("ablate", "all"):
        for mode, name in [(0, "full-head"), (1, "max-only"),
                           (2, "no-head")]:
            fn = jax.jit(lambda c, p, m=mode: ablation(c, p, m))
            t = _time(fn, cam, proj)
            print(f"ablation {name}: {t*1e3:.3f} ms", flush=True)
        for hb in (16, 24):
            fn = jax.jit(lambda c, p, h=hb: ablation(c, p, 0, hb=h))
            t = _time(fn, cam, proj)
            print(f"ablation full-head hb={hb}: {t*1e3:.3f} ms", flush=True)

    if which in ("volume", "all"):
        for hb, dt in [(48, 16), (40, 16), (32, 8), (56, 8)]:
            try:
                fn = jax.jit(
                    lambda c, p, hb=hb, dt=dt: pallas_cost_volume_banded_hdw(
                        c, p, D, K, 1e-8, hb, dt, False, True))
                t = _time(fn, cam, proj)
                print(f"volume-hdw hb={hb} dt={dt}: {t*1e3:.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"volume-hdw hb={hb} dt={dt}: FAIL "
                      f"{str(e).splitlines()[0][:100]}", flush=True)

    if which in ("bwd", "all"):
        # Plane-major padded cotangent (round 4).
        g = jnp.asarray(rng.random((200, 384, 1280), dtype=np.float32))
        for hb in (80, 96):
            try:
                fn = jax.jit(
                    lambda c, p, gg, hb=hb:
                    pallas_camera_grad_banded_hdw(c, p, gg, D, K, 1e-8,
                                                  hb, 8))
                t = _time(fn, cam, proj, g)
                print(f"bwd-hdw hb={hb} dt=8: {t*1e3:.3f} ms", flush=True)
            except Exception as e:
                msg = str(e)
                lines = [l for l in msg.splitlines()
                         if "vmem" in l.lower() or "exceed" in l.lower()
                         or "Mosaic" in l or "ERROR" in l][:4]
                print(f"bwd-hdw hb={hb}: FAIL", *lines, flush=True)


if __name__ == "__main__":
    main()
