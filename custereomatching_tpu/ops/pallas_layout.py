"""Pallas layout-conversion kernels between the plane-major padded
volume and the reference-parity ``[H, W, D+1]`` layout.

Since round 4 the production volume kernels read/write the padded
PLANE-MAJOR layout ``[ndt, h_pad, wo]`` (``ops/pallas_zncc.py``); the
reference's layout (custma/src/stereo_matching_kernel.cu:200-201 — the
banded variant the reference intended at cu:30-33,197) keeps the
disparity axis LAST.  The parity surface therefore pays one
leading-axis permute each way.  Through XLA that permute runs at ~0.3
of HBM bandwidth at KITTI scale (~2.3 ms — BENCH r4 measured the
adapter at 62% of its bound, the weakest priced path); these kernels do
the same conversion as a tiled DMA-in → in-VMEM relayout → DMA-out
pipeline.

Both directions also FOLD THE MASKING IN for free: the parity→padded
direction writes exact zeros into every padded row/column/plane, which
is precisely the zero-cotangent contract the direct-DMA backwards
require (``pallas_zncc_bwd.py``) — the XLA path needed a separate
zeros + dynamic_update_slice for that.

MEASURED DECISION (round 4, ``scripts/sweep9_layout.py``, healthy
window): the XLA permute wins.  At KITTI scale (200×384×1280 ↔
375×1242×193) the XLA forward permute measures 2.27 ms and the best
kernel here (``t2d1`` at (32, 640)) 2.89 ms — the permute is
relayout-bound and XLA's lowering is already at that limit; the
kernels' serial DMA-in and in-VMEM shuffle passes cannot beat it.  The
parity→plane-major direction additionally CANNOT COMPILE on Mosaic for
any real D: its input DMA slices the cotangent's minor axis at extent
``D+1``, and Mosaic requires DMA lane-dim slices to be 128-aligned
("Slice shape along dimension 2 must be aligned to tiling (128)").
The adapter therefore keeps the XLA permute (priced with the measured
``xla_t3d`` rate); these kernels stay as the measured alternative and
as regression probes.  ``parity_to_plane_major`` raises on the
compiled path when ``(D+1) % 128 != 0`` so the Mosaic rejection
surfaces at trace time instead of as an opaque compile failure (the
interpret path still runs for tests, mirroring the k=1 rejection in
``pallas_zncc.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from custereomatching_tpu.ops.pallas_zncc import _round_up


def _to_parity_kernel(vol_hbm, out_ref, buf, sems, *, D, hb2, wc, ndt,
                      method):
    """One (row-tile, col-tile) step: stage ``[ndt, hb2, wc]`` of the
    plane-major volume, emit its ``(1, 2, 0)`` transpose as the
    ``[hb2, wc, D+1]`` out block.

    ``method`` selects the in-VMEM relayout strategy (the naive 3D
    ``jnp.transpose`` lowers element-wise and blows the Mosaic VMEM
    stack — 108 MB scoped for a 3.3 MB block):

    * ``"dot"``: ONE batched identity contraction per block —
      ``dot_general(buf[ndt, hb2, wc], I[ndt, ndt])`` contracting the
      plane axes is exactly the ``(1, 2, 0)`` permute (·1.0 + Σ·0.0 at
      HIGHEST precision reconstructs each fp32 bit-exactly), and as a
      single ``M=hb2·wc, K=N=ndt`` matmul it keeps the MXU busy where
      the per-row variants issue ``hb2`` skinny dots.
    * ``"t2d1"``: ONE flat 2D transpose per block —
      ``[ndt, hb2·wc] → [hb2·wc, ndt]`` IS the ``(1, 2, 0)`` permute
      after reshapes, and both reshapes are layout no-ops (``wc`` is a
      128-multiple, so regrouping the sublane axis keeps (8, 128) tile
      boundaries).  No MXU involvement.
    * ``"mxu"``: per output row x, transpose the ``[ndt, wc]`` slab with
      one identity contraction on the MXU (exact: ·1.0 + Σ·0.0 passes).
    * ``"t2d"``: per output row x, a 2D ``jnp.transpose``.
    """
    h_idx = pl.program_id(0)
    w_idx = pl.program_id(1)
    r0 = h_idx * hb2          # multiple of 8 (hb2 is)
    c0 = w_idx * wc           # multiple of 128 (wc is)
    dma = pltpu.make_async_copy(
        vol_hbm.at[:, pl.ds(r0, hb2), pl.ds(c0, wc)], buf, sems.at[0])
    dma.start()
    dma.wait()
    if method == "dot":
        eye = jnp.eye(ndt, dtype=jnp.float32)
        tdims = (((0,), (0,)), ((), ()))
        t = lax.dot_general(buf[:, :, :], eye, tdims,
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        out_ref[:, :, :] = t[:, :, :D + 1]
    elif method == "t2d1":
        flat = jnp.reshape(buf[:, :, :], (ndt, hb2 * wc))
        t = jnp.reshape(jnp.transpose(flat), (hb2, wc, ndt))
        out_ref[:, :, :] = t[:, :, :D + 1]
    elif method == "mxu":
        eye = jnp.eye(ndt, dtype=jnp.float32)
        tdims = (((0,), (0,)), ((), ()))
        for x in range(hb2):
            t = lax.dot_general(buf[:, x, :], eye, tdims,
                                precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
            out_ref[x] = t[:, :D + 1]
    elif method == "t2d":
        for x in range(hb2):
            out_ref[x] = jnp.transpose(buf[:, x, :])[:, :D + 1]
    else:
        out_ref[:, :, :] = jnp.transpose(
            buf[:, :, :], (1, 2, 0))[:, :, :D + 1]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def plane_major_to_parity(
    vol: jax.Array,
    H: int,
    W: int,
    num_disparities: int,
    block_rows: int = 16,
    block_cols: int = 256,
    interpret: bool = False,
    method: str = "mxu",
) -> jax.Array:
    """``[ndt, h_pad, wo]`` plane-major padded volume → reference-parity
    ``[H, W, D+1]`` (crop + leading-axis permute in one kernel)."""
    ndt, h_pad, wo = vol.shape
    D = int(num_disparities)
    hb2 = _round_up(int(block_rows), 8)
    while hb2 > 8 and -(-H // hb2) * hb2 > h_pad:
        hb2 -= 8
    wc = _round_up(min(int(block_cols), wo), 128)
    while wo % wc:
        wc -= 128
    n_h = -(-H // hb2)
    n_w = wo // wc

    kernel = functools.partial(_to_parity_kernel, D=D, hb2=hb2, wc=wc,
                               ndt=ndt, method=method)
    return pl.pallas_call(
        kernel,
        grid=(n_h, n_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((hb2, wc, D + 1), lambda h, w: (h, w, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, D + 1), vol.dtype),
        scratch_shapes=[
            pltpu.VMEM((ndt, hb2, wc), vol.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * ndt * H * wo * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(vol)


def _to_plane_major_kernel(g_hbm, out_ref, buf, sems,
                           *, H, W, D, hb2, wc, ndt, method):
    """One (row-tile, col-tile) step: stage ``[hb2, wc, D+1]`` of the
    parity cotangent, emit its ``(2, 0, 1)`` transpose as the
    ``[ndt, hb2, wc]`` out block with exact zeros in every padded
    row/column/plane (the zero-cotangent contract).

    ``method``: ``"dot"`` is ONE batched identity contraction per block
    (``dot_general(I[D+1, D+1], buf, contract I.1 x buf.2)`` → the
    ``(2, 0, 1)`` permute, bit-exact at HIGHEST precision); ``"mxu"``
    transposes each untiled-x ``[wc, D+1]`` slab with an exact identity
    contraction; ``"naive"`` is the 3D ``jnp.transpose`` (interpret-mode
    reference — its Mosaic lowering blows the VMEM stack at production
    shapes)."""
    h_idx = pl.program_id(0)
    w_idx = pl.program_id(1)
    r0 = h_idx * hb2
    c0 = w_idx * wc
    # The source is pre-padded to [h_pad, wo, D+1], so every block read
    # is in-bounds; masking below re-zeros the padded rows/columns (they
    # are already zeros in the padded source — the mask keeps the
    # contract independent of the caller's padding).
    dma = pltpu.make_async_copy(
        g_hbm.at[pl.ds(r0, hb2), pl.ds(c0, wc), :], buf, sems.at[0])
    dma.start()
    dma.wait()
    if method == "dot":
        eye = jnp.eye(D + 1, dtype=jnp.float32)
        tdims = (((1,), (2,)), ((), ()))
        # [D+1, hb2, wc]: lhs free dim then rhs free dims.
        t = lax.dot_general(eye, buf[:, :, :], tdims,
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        ri = lax.broadcasted_iota(jnp.int32, (D + 1, hb2, wc), 1) + r0
        ci = lax.broadcasted_iota(jnp.int32, (D + 1, hb2, wc), 2) + c0
        out_ref[0:D + 1] = jnp.where((ri < H) & (ci < W), t, 0.0)
        if ndt > D + 1:
            out_ref[D + 1:ndt] = jnp.zeros((ndt - D - 1, hb2, wc),
                                           buf.dtype)
        return
    if method == "t2d1":
        # [hb2·wc, D+1] → [D+1, hb2·wc] is the (2, 0, 1) permute after
        # layout-no-op reshapes (wc is a 128-multiple).
        flat = jnp.reshape(buf[:, :, :], (hb2 * wc, D + 1))
        t = jnp.reshape(jnp.transpose(flat), (D + 1, hb2, wc))
        ri = lax.broadcasted_iota(jnp.int32, (D + 1, hb2, wc), 1) + r0
        ci = lax.broadcasted_iota(jnp.int32, (D + 1, hb2, wc), 2) + c0
        out_ref[0:D + 1] = jnp.where((ri < H) & (ci < W), t, 0.0)
        if ndt > D + 1:
            out_ref[D + 1:ndt] = jnp.zeros((ndt - D - 1, hb2, wc),
                                           buf.dtype)
        return
    if method == "mxu":
        eye = jnp.eye(wc, dtype=jnp.float32)
        tdims = (((0,), (0,)), ((), ()))
        ci2 = lax.broadcasted_iota(jnp.int32, (D + 1, wc), 1) + c0
        for x in range(hb2):
            t = lax.dot_general(buf[x], eye, tdims,
                                precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
            ok = jnp.logical_and(r0 + x < H, ci2 < W)
            out_ref[0:D + 1, x, :] = jnp.where(ok, t, 0.0)
        if ndt > D + 1:
            out_ref[D + 1:ndt] = jnp.zeros((ndt - D - 1, hb2, wc),
                                           buf.dtype)
        return
    t = jnp.transpose(buf[:, :, :], (2, 0, 1))          # [D+1, hb2, wc]
    # Zero every padded row/column/plane (the zero-cotangent contract).
    ri = lax.broadcasted_iota(jnp.int32, (D + 1, hb2, wc), 1) + r0
    ci = lax.broadcasted_iota(jnp.int32, (D + 1, hb2, wc), 2) + c0
    out_ref[0:D + 1] = jnp.where((ri < H) & (ci < W), t, 0.0)
    if ndt > D + 1:
        out_ref[D + 1:ndt] = jnp.zeros((ndt - D - 1, hb2, wc), t.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def parity_to_plane_major(
    g: jax.Array,
    n_planes: int,
    h_pad: int,
    wo: int,
    num_disparities: int,
    block_rows: int = 16,
    block_cols: int = 256,
    interpret: bool = False,
    method: str = "mxu",
) -> jax.Array:
    """Reference-parity ``[H, W, D+1]`` cotangent → plane-major padded
    ``[n_planes, h_pad, wo]`` with exact zeros in the padding (the
    zero-cotangent contract of the direct-DMA backwards).

    Compiled path requires ``(D+1) % 128 == 0``: the input DMA slices
    the cotangent's minor axis at extent ``D+1`` and Mosaic rejects
    lane-dim slices that are not 128-aligned — raised here at trace
    time so the constraint fails loudly (the production adapter uses
    the XLA permute, which sweep9 measured faster anyway)."""
    H, W, _ = g.shape
    D = int(num_disparities)
    if not interpret and (D + 1) % 128:
        raise ValueError(
            f"parity_to_plane_major cannot compile on Mosaic with "
            f"D+1={D + 1} (input DMA lane-dim slices must be "
            f"128-aligned); use the XLA permute path "
            f"(zeros + dynamic_update_slice + transpose), which "
            f"sweep9_layout.py measured faster at every shape tried.")
    hb2 = _round_up(int(block_rows), 8)
    while hb2 > 8 and -(-H // hb2) * hb2 > h_pad:
        hb2 -= 8
    if h_pad % hb2:
        hb2 = 8
    wc = _round_up(min(int(block_cols), wo), 128)
    while wo % wc:
        wc -= 128
    n_h = h_pad // hb2
    n_w = wo // wc

    # Pad the parity cotangent so every input block is in-bounds (an
    # out-of-range Pallas input block would stage garbage; the padding
    # is zeros, which the mask also enforces).
    gp = g
    if h_pad > H or wo > W:
        gp = jnp.pad(g, ((0, h_pad - H), (0, wo - W), (0, 0)))

    kernel = functools.partial(_to_plane_major_kernel, H=H, W=W, D=D,
                               hb2=hb2, wc=wc, ndt=n_planes,
                               method=method)
    return pl.pallas_call(
        kernel,
        grid=(n_h, n_w),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((n_planes, hb2, wc),
                               lambda h, w: (0, h, w),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_planes, h_pad, wo), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((hb2, wc, D + 1), g.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * n_planes * h_pad * wo * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(gp)
