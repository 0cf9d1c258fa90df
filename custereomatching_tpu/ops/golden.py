"""Golden (oracle) implementation of the ZNCC stereo cost volume.

Pure ``jnp``, patch-based, differentiable with ``jax.grad``, runnable on
CPU.  This mirrors — in math, not in code — the reference's own golden
path: the pure-PyTorch ``torch_cost_volume_backward`` in
``examples/verify.py:81-133`` (zero-pad → unfold patches → subtract
per-patch mean → row-wise matmul → ``(EXY+eps)/sqrt(EX2*EY2+eps)``),
which the reference author used as the oracle for the CUDA kernels.

Semantics shared with the reference CUDA forward
(``custma/src/stereo_matching_kernel.cu:17-72``):

* Out-of-bounds window reads are zero (``query_ij``, kernel.cu:6-12).
* Patch means divide by ``kernel_size**2`` *including* the zero padding
  (kernel.cu:53-54).
* ``cost = (exy + eps) / sqrt(ex2*ey2 + eps)`` with ``eps = 1e-8``
  (kernel.cu:4,71) — note eps is added to the numerator and inside the
  sqrt, not to each factor.
* All-pairs mode: the ``D`` argument is ignored and the volume is
  ``[H, W, W]`` with the last axis being the absolute projector column
  (kernel.cu:14,35-37,194,200 — the reference's actual behavior).
* Banded mode (this package's extension; the layout the reference
  *intended* but commented out, kernel.cu:30-33,197): ``[H, W, D+1]``
  where band index ``d`` correlates the camera patch at ``(h, w)`` with
  the projector patch centered at column ``w - d`` (rectified-stereo
  disparity convention, cf. the commented pipeline in
  ``examples/test.py:78-86`` where ``disparity = template - correspondence``).
  Patch reads left of column 0 are zero, consistent with ``query_ij``.

This module is intentionally simple and memory-hungry (it materializes
``[H, W, k^2]`` patch tensors); it is the *oracle*, not the fast path.
Use :mod:`custereomatching_tpu.ops.zncc` for production.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

EPSILON = 1e-8  # reference: custma/src/stereo_matching_kernel.cu:4

# The oracle must accumulate in full fp32 like the reference's CUDA scalar
# loops (kernel.cu:56-70); XLA's *default* dot precision uses reduced-
# precision passes (observably ~1e-3 error) and is not acceptable here.
_HIGHEST = lax.Precision.HIGHEST


def extract_patches(img: jax.Array, kernel_size: int) -> jax.Array:
    """Extract zero-padded k×k patches around every pixel.

    Returns ``[H, W, k*k]`` where entry ``(h, w, i*k + j)`` is the pixel at
    ``(h + i - k//2, w + j - k//2)`` of the zero-padded image — the same
    window enumeration as the reference's window loops
    (custma/src/stereo_matching_kernel.cu:42-48) and the same layout as its
    ``extract_image_patch_pytoch`` helper (examples/verify.py:18-28).
    """
    if img.ndim != 2:
        raise ValueError(f"expected [H, W] image, got shape {img.shape}")
    k = kernel_size
    p = k // 2
    H, W = img.shape
    padded = jnp.pad(img, ((p, p), (p, p)))
    shifts = [padded[i:i + H, j:j + W] for i in range(k) for j in range(k)]
    return jnp.stack(shifts, axis=-1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def zncc_cost_volume(
    camera: jax.Array,
    projector: jax.Array,
    num_disparities: Optional[int] = None,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
) -> jax.Array:
    """ZNCC cost volume, oracle implementation.

    Args:
      camera: ``[H, W]`` float image.
      projector: ``[H, W]`` float image (same shape).
      num_disparities: ``None`` → all-pairs ``[H, W, W]`` (reference
        behavior); integer ``D`` → banded ``[H, W, D+1]``.
      kernel_size: odd window side ``k``.
      epsilon: numerical epsilon (see module docstring).

    Returns:
      The cost volume.
    """
    if camera.shape != projector.shape:
        raise ValueError(
            f"camera {camera.shape} and projector {projector.shape} must match")
    k = kernel_size
    k2 = k * k
    H, W = camera.shape

    camp = extract_patches(camera, k)
    camc = camp - jnp.mean(camp, axis=-1, keepdims=True)
    ex2 = jnp.sum(camc * camc, axis=-1)  # [H, W]

    if num_disparities is None:
        projp = extract_patches(projector, k)
        projc = projp - jnp.mean(projp, axis=-1, keepdims=True)
        ey2 = jnp.sum(projc * projc, axis=-1)  # [H, W] indexed by abs column d
        exy = jnp.einsum("hwc,hdc->hwd", camc, projc,
                         preferred_element_type=camera.dtype,
                         precision=_HIGHEST)
        deno = jnp.sqrt(ex2[:, :, None] * ey2[:, None, :] + epsilon)
        return (exy + epsilon) / deno

    D = num_disparities
    # Left-extend the projector by D zero columns so that a patch centered at
    # column (w - d) is always a valid gather; zeros reproduce query_ij
    # semantics for reads left of column 0.
    proj_ext = jnp.pad(projector, ((0, 0), (D, 0)))
    p = k // 2
    He, We = proj_ext.shape
    padded = jnp.pad(proj_ext, ((p, p), (p, p)))
    shifts = [padded[i:i + He, j:j + We] for i in range(k) for j in range(k)]
    projp_ext = jnp.stack(shifts, axis=-1)  # [H, W + D, k2]

    # band gather: ext column (w - d) + D
    idx = (jnp.arange(W)[:, None] - jnp.arange(D + 1)[None, :]) + D  # [W, D+1]
    projp_band = projp_ext[:, idx, :]  # [H, W, D+1, k2]
    projc_band = projp_band - jnp.mean(projp_band, axis=-1, keepdims=True)
    ey2_band = jnp.sum(projc_band * projc_band, axis=-1)  # [H, W, D+1]
    exy = jnp.einsum("hwc,hwdc->hwd", camc, projc_band,
                     preferred_element_type=camera.dtype,
                     precision=_HIGHEST)
    deno = jnp.sqrt(ex2[:, :, None] * ey2_band + epsilon)
    return (exy + epsilon) / deno


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def zncc_camera_grad(
    camera: jax.Array,
    projector: jax.Array,
    cost_volume_grad: jax.Array,
    num_disparities: Optional[int] = None,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
) -> jax.Array:
    """Oracle camera-image gradient: ``jax.grad`` through the oracle forward.

    Mathematically identical to the reference's hand-derived backward
    (custma/src/stereo_matching_kernel.cu:75-179): the reference omits the
    patch-mean dependence of the chain rule, which is exact because the sum
    of mean-centered values over each full (padding-inclusive) window is
    identically zero.
    """
    def scalar_loss(cam):
        cv = zncc_cost_volume(cam, projector, num_disparities, kernel_size,
                              epsilon)
        return jnp.sum(cv * cost_volume_grad)

    return jax.grad(scalar_loss)(camera)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def zncc_projector_grad(
    camera: jax.Array,
    projector: jax.Array,
    cost_volume_grad: jax.Array,
    num_disparities: Optional[int] = None,
    kernel_size: int = 15,
    epsilon: float = EPSILON,
) -> jax.Array:
    """Oracle projector-image gradient (the reference never implemented this;
    its backward returns None for the projector,
    custma/stereo_matching_wrapper.py:33)."""
    def scalar_loss(proj):
        cv = zncc_cost_volume(camera, proj, num_disparities, kernel_size,
                              epsilon)
        return jnp.sum(cv * cost_volume_grad)

    return jax.grad(scalar_loss)(projector)
