"""Data-layer and native-library tests."""

import os

import numpy as np
import pytest

from custereomatching_tpu.data import (
    load_stereo_pair_npy,
    make_stereo_pair,
    make_video_batch,
    render_camera,
    save_stereo_pair_npz,
    speckle_pattern,
)


def test_speckle_pattern_properties():
    img = speckle_pattern(64, 96, seed=3)
    assert img.shape == (64, 96) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert img.std() > 0.05  # has texture


def test_render_camera_integer_shift():
    proj = speckle_pattern(32, 48, seed=1)
    disp = np.full((32, 48), 5.0, np.float32)
    cam = render_camera(proj, disp)
    np.testing.assert_allclose(cam[:, 5:], proj[:, :-5], atol=1e-6)
    assert np.all(cam[:, :5] == 0)  # out-of-view left edge zeros


def test_make_stereo_pair_recoverable():
    """The generated scene is actually solvable by the matcher."""
    import jax.numpy as jnp

    from custereomatching_tpu.config import StereoConfig
    from custereomatching_tpu.models import StereoMatcher

    cam, proj, disp = make_stereo_pair(48, 64, scene="slant", d_min=2,
                                       d_max=6, seed=0)
    model = StereoMatcher(StereoConfig(kernel_size=7, num_disparities=8,
                                       backend="xla"))
    out = model(jnp.asarray(cam)[None], jnp.asarray(proj)[None])
    m = np.asarray(out.mask[0]) > 0
    err = np.abs(np.asarray(out.disparity[0]) - np.round(disp))[m]
    assert m.mean() > 0.5
    assert (err <= 1).mean() > 0.95


def test_npz_roundtrip(tmp_path):
    cam, proj, disp = make_stereo_pair(16, 24)
    path = str(tmp_path / "pair.npz")
    save_stereo_pair_npz(path, cam, proj, disp)
    c2, p2 = load_stereo_pair_npy(path)
    np.testing.assert_array_equal(c2, cam)
    np.testing.assert_array_equal(p2, proj)


def test_video_batch_shapes():
    cams, projs, disps = make_video_batch(3, 16, 24)
    assert cams.shape == projs.shape == disps.shape == (3, 16, 24)


def test_native_library():
    """Native decode/parse paths agree with numpy/PIL implementations."""
    from custereomatching_tpu import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)

    arr = rng.random((5, 7, 9)).astype(np.float32)
    np.save("/tmp/cst_test.npy", arr)
    ld = native.load_npy_f32("/tmp/cst_test.npy")
    assert ld.shape == arr.shape and np.array_equal(ld, arr)

    u8 = (rng.random((11, 13)) * 255).astype(np.uint8)
    np.testing.assert_allclose(native.u8_to_f32_gray(u8), u8 / 255.0,
                               atol=1e-7)

    a = rng.random((5, 7)).astype(np.float32)
    pad = native.pad_image_f32(a, 10, 16, 2, 3)
    assert np.array_equal(pad[2:7, 3:10], a)
    mask = np.ones((10, 16), bool)
    mask[2:7, 3:10] = False
    assert (pad[mask] == 0).all()

    try:
        from PIL import Image
    except ImportError:
        return
    img = (rng.random((37, 53, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save("/tmp/cst_test.png")
    dec = native.decode_png_gray("/tmp/cst_test.png", 0)
    np.testing.assert_allclose(dec, img[:, :, 0] / 255.0, atol=1e-6)


def _write_adam7_gray_png(path, img):
    """Minimal Adam7-interlaced grayscale-8 PNG writer (PIL can't)."""
    import struct
    import zlib

    h, w = img.shape

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)

    # (x0, y0, dx, dy) for the seven Adam7 passes.
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)  # filter type None
            raw.extend(row.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)  # interlace=1
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(bytes(raw))))
        f.write(chunk(b"IEND", b""))


def test_native_png_interlaced(tmp_path):
    """Adam7-interlaced PNGs decode pixel-exact (advisor finding)."""
    from custereomatching_tpu import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    img = (rng.random((23, 31)) * 255).astype(np.uint8)
    path = str(tmp_path / "adam7.png")
    _write_adam7_gray_png(path, img)
    try:
        from PIL import Image

        np.testing.assert_array_equal(np.asarray(Image.open(path)), img)
    except ImportError:
        pass
    dec = native.decode_png_gray(path)
    assert dec is not None
    np.testing.assert_allclose(dec, img / 255.0, atol=1e-6)


def _write_npy_with_header(path, header, payload=b""):
    import struct

    body = header.encode()
    pad = (64 - (10 + len(body) + 1) % 64) % 64
    body += b" " * pad + b"\n"
    with open(path, "wb") as f:
        f.write(b"\x93NUMPY\x01\x00")
        f.write(struct.pack("<H", len(body)))
        f.write(body)
        f.write(payload)


def test_native_npy_rejects_hostile_headers(tmp_path):
    """Negative/overflowing/>4-dim shapes are rejected, not over-read."""
    from custereomatching_tpu import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    cases = {
        "neg.npy": "{'descr': '<f4', 'fortran_order': False, "
                   "'shape': (-3, 4), }",
        "5d.npy": "{'descr': '<f4', 'fortran_order': False, "
                  "'shape': (2, 2, 2, 2, 2), }",
        "ovf.npy": "{'descr': '<f4', 'fortran_order': False, "
                   "'shape': (4611686018427387904, 8), }",
    }
    for name, header in cases.items():
        path = str(tmp_path / name)
        _write_npy_with_header(path, header, b"\0" * 128)
        assert native.load_npy_f32(path) is None, name


def test_metrics():
    import jax.numpy as jnp

    from custereomatching_tpu.utils import disparity_metrics

    pred = jnp.asarray([[1.0, 2.0, 10.0]])
    truth = jnp.asarray([[1.0, 3.5, 2.0]])
    m = disparity_metrics(pred, truth)
    np.testing.assert_allclose(m["epe"], (0 + 1.5 + 8) / 3, rtol=1e-6)
    np.testing.assert_allclose(m["bad3"], 1 / 3, rtol=1e-6)
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    m2 = disparity_metrics(pred, truth, mask)
    np.testing.assert_allclose(m2["epe"], 0.75, rtol=1e-6)


def test_native_frame_loader(tmp_path):
    """Prefetching loader yields frames in order, matching direct decode."""
    from custereomatching_tpu import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL needed to author test frames")

    rng = np.random.default_rng(11)
    paths, want = [], []
    for i in range(6):
        img = (rng.random((20 + i, 30)) * 255).astype(np.uint8)
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
        want.append(img.astype(np.float32) / 255.0)

    got = []
    with native.FrameLoader(paths, capacity=2) as frames:
        for f in frames:
            got.append(f)
    assert len(got) == 6
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=1e-6)


def test_native_frame_loader_bad_frame(tmp_path):
    """A corrupt frame raises but iteration continues to later frames."""
    from custereomatching_tpu import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL needed to author test frames")

    ok1 = str(tmp_path / "a.png")
    bad = str(tmp_path / "bad.png")
    ok2 = str(tmp_path / "b.png")
    img = (np.random.default_rng(3).random((12, 16)) * 255).astype(np.uint8)
    Image.fromarray(img).save(ok1)
    Image.fromarray(img).save(ok2)
    with open(bad, "wb") as f:
        f.write(b"not a png at all")

    frames = native.FrameLoader([ok1, bad, ok2], capacity=2)
    out, errors = [], 0
    while True:
        try:
            out.append(next(frames))
        except StopIteration:
            break
        except IOError:
            errors += 1
    frames.close()
    assert len(out) == 2 and errors == 1


def test_native_frame_loader_pool_ordering(tmp_path):
    """The multi-thread decode pool preserves path order exactly.

    Each frame carries its index in pixel [0, 0]; 32 frames through a
    4-thread pool with a tight window must come back 0..31 in order
    (the round-4 pool parks finished frames in an ordered map keyed by
    path index — this pins the in-order-delivery contract)."""
    from custereomatching_tpu import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL needed to author test frames")

    rng = np.random.default_rng(7)
    paths = []
    for i in range(32):
        img = (rng.random((16, 24)) * 255).astype(np.uint8)
        img[0, 0] = i
        p = str(tmp_path / f"f{i:02d}.png")
        Image.fromarray(img).save(p)
        paths.append(p)

    for threads, capacity in [(4, 4), (8, 2), (3, 16), (0, 4)]:
        with native.FrameLoader(paths, capacity=capacity,
                                threads=threads) as frames:
            idx = [int(round(f[0, 0] * 255.0)) for f in frames]
        assert idx == list(range(32)), (threads, capacity, idx)


def test_native_frame_loader_pool_bad_frame(tmp_path):
    """Error frames surface at their ordinal position under the pool."""
    from custereomatching_tpu import native

    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL needed to author test frames")

    rng = np.random.default_rng(5)
    paths = []
    for i in range(8):
        img = (rng.random((12, 16)) * 255).astype(np.uint8)
        img[0, 0] = i
        p = str(tmp_path / f"g{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    with open(paths[3], "wb") as f:
        f.write(b"corrupt")

    frames = native.FrameLoader(paths, capacity=3, threads=4)
    got, err_at = [], None
    pos = 0
    while True:
        try:
            got.append(int(round(next(frames)[0, 0] * 255.0)))
        except StopIteration:
            break
        except IOError:
            err_at = pos
        pos += 1
    frames.close()
    assert err_at == 3
    assert got == [0, 1, 2, 4, 5, 6, 7]
