"""Stage-gated ablation sweep for the all-pairs Pallas/MXU forward.

BENCH r4 has the all-pairs im2col kernel (ops/pallas_allpairs.py) at
~80% of its mxuhi-priced bound at the reference's verify shape
(330x422, k=15).  VERDICT r3 #4 suspects the k² im2col copies; this
mirror gates each stage so the missing 20% can be attributed the way
sweep4/sweep6/sweep7 did for the backward family:

  do_stats   box stats + the two identity-dot transposes (per block)
  do_rolls   the 2·k lane-rolls of the bands (per block)
  do_stacks  the k² per-row im2col copies into the 8-aligned stacks
  do_mm      the per-row k²-contraction matmul
  do_norm    the normalization epilogue (exy/deno/combine)

Also sweeps structure: hr (row-block height), batched-vs-looped
contraction, and precision.

Run:  python scripts/sweep8_allpairs_ablate.py [--check]
``--check`` verifies the full config against the production kernel in
interpreter mode (CPU).  Timing runs measure on the device.
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


def _kernel(cam_hbm, proj_hbm, out_ref,
            cam_band, proj_band, crolled, prolled, bc_all, bp_all,
            sxc_scr, ex2c_scr, sy_scr, ey2_scr, sems,
            *, H, W, k, eps, prec, hr, rb, wi, wo, yt,
            do_stats, do_rolls, do_stacks, do_mm, do_norm, batched_mm,
            sw_pipe=False):
    h_idx = pl.program_id(0)
    y_idx = pl.program_id(1)
    p = k // 2
    kb = _round_up(k, 8)
    inv_k2 = 1.0 / float(k * k)
    r0 = h_idx * hr

    @pl.when(jnp.logical_and(h_idx == 0, y_idx == 0))
    def _zero_pads():
        if kb > k:
            for j in range(k):
                for s in (bc_all, bp_all):
                    s[:, j * kb + k:(j + 1) * kb, :] = jnp.zeros(
                        (hr, kb - k, wo), s.dtype)

    @pl.when(y_idx == 0)
    def _stage_row_block():
        cam_dma = pltpu.make_async_copy(
            cam_hbm.at[pl.ds(r0, rb), :], cam_band, sems.at[0])
        proj_dma = pltpu.make_async_copy(
            proj_hbm.at[pl.ds(r0, rb), :], proj_band, sems.at[1])
        cam_dma.start()
        proj_dma.start()
        cam_dma.wait()
        proj_dma.wait()

        if do_stats:
            camv = cam_band[:, :]
            sx_rows = _box_from_band(camv, k, hr, wo)
            ex2_rows = (_box_from_band(camv * camv, k, hr, wo)
                        - sx_rows * sx_rows * inv_k2)
            projv = proj_band[:, :]
            sy_rows = _box_from_band(projv, k, hr, wo)
            ey2_rows = (_box_from_band(projv * projv, k, hr, wo)
                        - sy_rows * sy_rows * inv_k2)
            sy_scr[:, :] = sy_rows
            ey2_scr[:, :] = ey2_rows
            eye = jnp.eye(hr, dtype=jnp.float32)
            tdims = (((0,), (0,)), ((), ()))
            sxc_scr[:, :] = lax.dot_general(
                sx_rows, eye, tdims, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            ex2c_scr[:, :] = lax.dot_general(
                ex2_rows, eye, tdims, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        if do_rolls:
            for j in range(k):
                crolled[j] = pltpu.roll(cam_band[:, :], wi - j, axis=1)
                prolled[j] = pltpu.roll(proj_band[:, :], wi - j, axis=1)

        if do_stacks:
            for t in range(hr):
                for j in range(k):
                    bc_all[t, j * kb:j * kb + k, :] = \
                        crolled[j, t:t + k, 0:wo]
                    bp_all[t, j * kb:j * kb + k, :] = \
                        prolled[j, t:t + k, 0:wo]

    tdims = (((0,), (0,)), ((), ()))
    y0 = pl.multiple_of(y_idx * yt, 128)
    if batched_mm and do_mm:
        bdims = (((1,), (1,)), ((0,), (0,)))
        ab = lax.dot_general(bc_all[:, :, :], bp_all[:, :, pl.ds(y0, yt)],
                             bdims, precision=prec,
                             preferred_element_type=jnp.float32)
        for t in range(hr):
            a = ab[t]
            if do_norm:
                sx_c = sxc_scr[:, t:t + 1]
                ex2_c = ex2c_scr[:, t:t + 1]
                sy_r = sy_scr[t:t + 1, pl.ds(y0, yt)]
                ey2_r = ey2_scr[t:t + 1, pl.ds(y0, yt)]
                exy = a - sx_c * (sy_r * inv_k2)
                deno = lax.rsqrt(ex2_c * ey2_r + eps)
                out_ref[t] = ((exy + eps) * deno)[0:W, :]
            else:
                out_ref[t] = a[0:W, :]
        return
    def _dot(t):
        if do_mm:
            return lax.dot_general(bc_all[t], bp_all[t, :, pl.ds(y0, yt)],
                                   tdims, precision=prec,
                                   preferred_element_type=jnp.float32)
        # [wo, yt] stand-in with no MXU work (bc_all's mid dim is
        # k·kb < wo, so a direct slice would be shape-wrong).
        return sxc_scr[:, t:t + 1] + sy_scr[t:t + 1, pl.ds(y0, yt)]

    def _emit(t, a):
        if do_norm:
            sx_c = sxc_scr[:, t:t + 1]
            ex2_c = ex2c_scr[:, t:t + 1]
            sy_r = sy_scr[t:t + 1, pl.ds(y0, yt)]
            ey2_r = ey2_scr[t:t + 1, pl.ds(y0, yt)]
            exy = a - sx_c * (sy_r * inv_k2)
            deno = lax.rsqrt(ex2_c * ey2_r + eps)
            out_ref[t] = ((exy + eps) * deno)[0:W, :]
        else:
            out_ref[t] = a[0:W, :]

    if sw_pipe:
        # Software-pipeline the row loop: issue dot t+1 before row t's
        # normalize+store consumes its result, so the VPU epilogue never
        # drains the MXU pipeline between dots.
        a_cur = _dot(0)
        for t in range(1, hr):
            a_next = _dot(t)
            _emit(t - 1, a_cur)
            a_cur = a_next
        _emit(hr - 1, a_cur)
    else:
        for t in range(hr):
            _emit(t, _dot(t))


def build(shape=(330, 422, 15), hr=8, interpret=False, precision="highest",
          y_tile=0, batched_mm=False, **gates):
    H, W, k = shape
    p = k // 2
    hr = max(8, _round_up(hr, 8))
    kb = _round_up(k, 8)
    wo = _round_up(W, 128)
    wi = _round_up(max(W + 2 * p, wo + 2 * p), 128)
    n_h = -(-H // hr)
    h_pad = n_h * hr
    rb = _round_up(hr + 2 * p, 8)
    src_rows = h_pad + rb

    budget = 24 * 2**20
    divisors = [d for d in range(128, wo + 1, 128) if wo % d == 0]
    if y_tile:
        want = _round_up(min(int(y_tile), wo), 128)
        yt = max(d for d in divisors if d <= want)
    else:
        fitting = [d for d in divisors if 2 * hr * W * d * 4 <= budget]
        yt = max(fitting) if fitting else divisors[0]
    n_y = wo // yt

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    camera = jax.random.uniform(k1, (H, W), jnp.float32)
    projector = jax.random.uniform(k2, (H, W), jnp.float32)
    cam_p = jnp.zeros((src_rows, wi), jnp.float32)
    cam_p = lax.dynamic_update_slice(cam_p, camera, (p, p))
    proj_p = jnp.zeros((src_rows, wi), jnp.float32)
    proj_p = lax.dynamic_update_slice(proj_p, projector, (p, p))

    gates_full = dict(do_stats=True, do_rolls=True, do_stacks=True,
                      do_mm=True, do_norm=True)
    gates_full.update(gates)
    prec = {"highest": lax.Precision.HIGHEST,
            "default": lax.Precision.DEFAULT}[precision]
    kernel = functools.partial(
        _kernel, H=H, W=W, k=k, eps=EPS, prec=prec, hr=hr, rb=rb,
        wi=wi, wo=wo, yt=yt, batched_mm=batched_mm, **gates_full)

    @jax.jit
    def run(cam_p, proj_p):
        return pl.pallas_call(
            kernel,
            grid=(n_h, n_y),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec((hr, W, yt), lambda h, y: (h, 0, y),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W, W), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((rb, wi), jnp.float32),
                pltpu.VMEM((rb, wi), jnp.float32),
                pltpu.VMEM((k, rb, wi), jnp.float32),
                pltpu.VMEM((k, rb, wi), jnp.float32),
                pltpu.VMEM((hr, k * kb, wo), jnp.float32),
                pltpu.VMEM((hr, k * kb, wo), jnp.float32),
                pltpu.VMEM((wo, hr), jnp.float32),
                pltpu.VMEM((wo, hr), jnp.float32),
                pltpu.VMEM((hr, wo), jnp.float32),
                pltpu.VMEM((hr, wo), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(cam_p, proj_p)

    return run, (cam_p, proj_p), (camera, projector)


CONFIGS = {
    "full": {},
    "no_stats": {"do_stats": False},
    "no_rolls": {"do_rolls": False, "do_stacks": False},
    "no_stacks": {"do_stacks": False},
    "no_mm": {"do_mm": False},
    "no_norm": {"do_norm": False},
    "mm_only": {"do_stats": False, "do_norm": False},
    "full_hr16": {"hr": 16},
    "full_hr32": {"hr": 32},
    "full_batched": {"batched_mm": True},
    "full_yt128": {"y_tile": 128},
    "full_yt256": {"y_tile": 256},
    "full_default": {"precision": "default"},
    "full_swpipe": {"sw_pipe": True},
    "swpipe_hr16": {"sw_pipe": True, "hr": 16},
}


def check():
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from custereomatching_tpu.ops.pallas_allpairs import (
        pallas_cost_volume_allpairs)

    shape = (24, 40, 5)
    fn, data, (camera, projector) = build(shape=shape, interpret=True)
    got = fn(*data)
    want = pallas_cost_volume_allpairs(camera, projector, shape[2], EPS,
                                       8, True, "highest")
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"check full: max|Δ| {err:.3e} {'OK' if err < 1e-6 else 'MISMATCH'}",
          flush=True)
    fn2, data2, _ = build(shape=shape, interpret=True, batched_mm=True)
    err2 = float(jnp.max(jnp.abs(fn2(*data2) - want)))
    print(f"check batched: max|Δ| {err2:.3e} "
          f"{'OK' if err2 < 1e-6 else 'MISMATCH'}", flush=True)
    return 0 if max(err, err2) < 1e-6 else 1


def _readback(x):
    # Scalar fence: slice ON DEVICE, fetch one element.  np.asarray here
    # would pull the whole 235 MB volume through the tunnel (~seconds),
    # and that transfer's noise swamps the ~10 ms slope being measured.
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
        if jax.devices()[0].platform != "tpu":
            return 0
    results = {}
    for name in args.configs.split(","):
        cfg = CONFIGS[name]
        try:
            fn, data, _ = build(**cfg)
            # Short chains (bench.py uses the same for all-pairs): a
            # [330, 422, 422] output is 235 MB, so 50 in-flight results
            # would stack ~12 GB of HBM and the slope would measure
            # allocator thrash (measured: 87 ms/call), not the kernel.
            t = _time(fn, data, n1=4, n2=16)
            results[name] = t
            delta = ""
            if "full" in results and name != "full":
                delta = f"  (full − this = {1e3*(results['full']-t):+.3f})"
            print(f"{name:>12}: {t*1e3:.3f} ms{delta}", flush=True)
        except Exception as e:
            print(f"{name:>12}: FAIL {str(e).splitlines()[0][:140]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
