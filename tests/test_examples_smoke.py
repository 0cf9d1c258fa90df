"""Smoke tests for the example scripts (tiny sizes, CPU backend).

The reference's examples were unrunnable as shipped (missing data, stale
argument shapes — survey §2.3 E5/E6); these tests pin ours to stay
runnable from a clean checkout.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)


def test_verify_script():
    r = _run(["examples/verify.py", "--height", "24", "--width", "64",
              "--disparities", "6", "-k", "5", "--interpret",
              "--skip-allpairs"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "VERIFY: PASS" in r.stdout


def test_demo_script(tmp_path):
    png = str(tmp_path / "disp.png")
    r = _run(["examples/demo.py", "--height", "32", "--width", "64",
              "--disparities", "8", "-k", "5", "--backend", "xla",
              "--save-png", png])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "pipeline latency" in r.stdout
    assert os.path.exists(png)


def test_train_script_with_mesh_and_ckpt(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    args = ["examples/train.py", "--steps", "4", "--height", "32",
            "--width", "64", "--frames", "2", "--disparities", "8",
            "-k", "5", "--mesh", "2x4", "--backend", "xla",
            "--ckpt-dir", ckpt, "--ckpt-every", "2"]
    r = _run(args)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "final disparity-vs-target" in r.stdout
    # resume from the checkpoint
    r2 = _run(args[:2] + ["6"] + args[3:])
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "resumed from step" in r2.stdout


def test_video_depth_script():
    r = _run(["examples/video_depth.py", "--frames", "2", "--height", "32",
              "--width", "64", "--disparities", "8", "-k", "5",
              "--backend", "xla"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "depth maps/s" in r.stdout


def test_real_capture_script():
    """The checked-in capture pair decodes (native path) and solves."""
    r = _run(["examples/real_capture.py", "--backend", "xla",
              "--num-disparities", "48", "--kernel-size", "15"], timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "REAL-CAPTURE PASS" in r.stdout


def test_video_depth_png_streaming(tmp_path):
    """The native prefetching loader drives the streaming example."""
    import numpy as np

    try:
        from PIL import Image
    except ImportError:
        import pytest

        pytest.skip("PIL needed to author frames")
    rng = np.random.default_rng(5)
    proj = (rng.random((32, 64)) * 255).astype(np.uint8)
    proj_path = str(tmp_path / "proj.png")
    Image.fromarray(proj).save(proj_path)
    cams = []
    for i in range(3):
        cam = (rng.random((32, 64)) * 255).astype(np.uint8)
        p = str(tmp_path / f"cam{i}.png")
        Image.fromarray(cam).save(p)
        cams.append(p)
    r = _run(["examples/video_depth.py", "--disparities", "8", "-k", "5",
              "--backend", "xla", "--height", "32", "--width", "64",
              "--projector-png", proj_path, "--camera-pngs"] + cams)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "streamed 3 PNG keyframes" in r.stdout


def test_pipeline_stages_script():
    r = _run(["examples/pipeline_stages.py", "--stages", "4", "--frames",
              "4", "--height", "24", "--width", "48", "-D", "7",
              "--kernel-size", "5"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PIPELINE-STAGES PASS" in r.stdout


def test_serve_script():
    r = _run(["examples/serve.py", "--loops", "2", "--num-disparities",
              "16", "--kernel-size", "7", "--backend", "xla"],
             timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SERVE: OK" in r.stdout


def test_scaling_script_strong_mode():
    r = _run(["examples/scaling.py", "--backend", "xla", "--height", "16",
              "--width", "64", "--disparities", "8", "--kernel-size", "5",
              "--pipeline", "volume", "--strong", "--halo-breakdown"],
             timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "overhead" in r.stdout
    assert "halo exchange alone" in r.stdout
