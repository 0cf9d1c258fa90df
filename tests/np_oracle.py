"""Brute-force NumPy transliteration of the ZNCC semantics, in float64.

This is the lowest-level oracle: a direct per-element evaluation of the
windowed ZNCC definition (zero-padded reads, k²-divisor means,
(exy+eps)/sqrt(ex2*ey2+eps)) exactly as specified by the reference CUDA
kernel's observable behavior (custma/src/stereo_matching_kernel.cu:17-72).
Written fresh from the math; used only on tiny shapes to validate the
golden jnp oracle, which in turn validates everything else.
"""

import numpy as np

EPS = 1e-8


def zncc_brute(cam, proj, kernel_size, num_disparities=None, eps=EPS):
    """Per-element ZNCC cost volume in float64.

    num_disparities=None → all-pairs [H, W, W] (last axis = absolute
    projector column); int D → banded [H, W, D+1] (projector column w−d).

    Window reads come from zero-padded copies of the images, which is
    exactly the query_ij out-of-bounds-is-zero rule; the math per element
    is the direct two-pass (mean, then centered moments) definition.
    """
    cam = np.asarray(cam, np.float64)
    proj = np.asarray(proj, np.float64)
    H, W = cam.shape
    k = kernel_size
    p = k // 2
    L = W if num_disparities is None else num_disparities + 1
    # Zero-pad so any window the loop can request is a plain slice. The
    # projector needs extra left padding in banded mode where the window
    # center column (w - d) can be negative.
    dpad = 0 if num_disparities is None else num_disparities
    cam_pad = np.pad(cam, ((p, p), (p, p)))
    proj_pad = np.pad(proj, ((p, p), (p + dpad, p)))
    out = np.zeros((H, W, L), np.float64)
    k2 = float(k * k)
    for h in range(H):
        for w in range(W):
            cwin = cam_pad[h:h + k, w:w + k]
            for d in range(L):
                pc = d if num_disparities is None else w - d
                pwin = proj_pad[h:h + k, pc + dpad:pc + dpad + k]
                cm = cwin.sum() / k2
                pm = pwin.sum() / k2
                c = cwin - cm
                r = pwin - pm
                exy = (c * r).sum()
                ex2 = (c * c).sum()
                ey2 = (r * r).sum()
                out[h, w, d] = (exy + eps) / np.sqrt(ex2 * ey2 + eps)
    return out
