"""Generate the checked-in real-capture-style stereo pair (run once).

The reference's verify script consumes real PNG captures that are NOT in
its repo (/root/reference/examples/verify.py:137-142), so it cannot run
as shipped.  Here we deterministically render a capture with realistic
camera degradations — optical blur, vignetting, gain/offset, sensor
noise, 8-bit quantization — at the reference's verify resolution
(330x422), and CHECK IN the PNGs so the real-image path (native libpng
decode → pipeline → EPE) is exercised from a clean checkout.

Outputs (committed):
  examples/data/capture_camera.png      8-bit grayscale camera frame
  examples/data/capture_projector.png   8-bit grayscale speckle pattern
  examples/data/capture_disparity.npy   float32 ground-truth disparity
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from custereomatching_tpu.data import render_camera, speckle_pattern

H, W = 330, 422
OUT = os.path.join(os.path.dirname(__file__), "..", "examples", "data")


def _gauss_blur(img, sigma):
    radius = max(1, int(3 * sigma))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    img = np.apply_along_axis(lambda r: np.convolve(r, g, "same"), 1, img)
    return np.apply_along_axis(lambda c: np.convolve(c, g, "same"), 0, img)


def main():
    rng = np.random.default_rng(2024)

    # Scene: slanted floor + two boxes at different depths.
    disp = np.broadcast_to(
        np.linspace(10.0, 26.0, W, dtype=np.float32)[None, :],
        (H, W)).copy()
    disp[60:170, 60:190] = 34.0
    disp[190:300, 230:360] = 42.0

    proj = speckle_pattern(H, W, dot_density=0.10, dot_sigma=0.9, seed=7)
    cam = render_camera(proj, disp)

    # Camera degradations: PSF blur, vignetting, gain/offset, shot-ish
    # noise, then 8-bit quantization (the PNG write itself).
    cam = _gauss_blur(cam, 0.6)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    r2 = (((yy - H / 2) / (H / 2)) ** 2 + ((xx - W / 2) / (W / 2)) ** 2)
    cam = cam * (1.0 - 0.25 * r2)                    # vignette
    cam = 0.92 * cam + 0.03                          # gain/offset
    cam = cam + 0.012 * rng.standard_normal((H, W)).astype(np.float32)
    cam = np.clip(cam, 0.0, 1.0)

    os.makedirs(OUT, exist_ok=True)
    from PIL import Image

    Image.fromarray((cam * 255).round().astype(np.uint8)).save(
        os.path.join(OUT, "capture_camera.png"))
    Image.fromarray((proj * 255).round().astype(np.uint8)).save(
        os.path.join(OUT, "capture_projector.png"))
    np.save(os.path.join(OUT, "capture_disparity.npy"),
            disp.astype(np.float32))
    print(f"wrote capture pair to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
