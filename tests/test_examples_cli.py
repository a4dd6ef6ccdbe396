"""End-to-end CLI smoke tests: tiny synthetic datasets on disk, the real
example entry points run as subprocesses, trajectories written and then
evaluated by the real evaluation scripts."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CFG = """
Camera.fx: 80.0
Camera.fy: 80.0
Camera.cx: 80.0
Camera.cy: 60.0
Camera.bf: 8.0
Camera.width: 160
Camera.height: 120
ThDepth: 35
SuperPoint.model_dir: "/nonexistent/"
superpoint:
  max_keypoints: 96
  keypoint_threshold: 0.0005
  remove_borders: 4
lightglue:
  image_width: 160
  image_height: 120
Backend.window_size: 4
"""


def _png(path, arr):
    import cv2

    cv2.imwrite(path, arr)


def _run(args, cwd=REPO):
    """Light scripts (no jax) run as real subprocesses."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", SUPERSLAM_NO_LOG_FILE="1")
    env.pop("SUPERSLAM_ENABLE_LOOP", None)
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, capture_output=True, text=True,
        timeout=600,
    )


def _run_example(module: str, argv: list[str], monkeypatch):
    """Example runners execute in-process (sharing the warm jit cache; a
    fresh subprocess would recompile the fused programs for minutes on this
    single-core host). argv/env mirror the CLI exactly."""
    import importlib

    monkeypatch.setattr(sys, "argv", [module] + argv)
    monkeypatch.delenv("SUPERSLAM_ENABLE_LOOP", raising=False)
    sys.path.insert(0, REPO)
    mod = importlib.import_module(f"examples.{module}")
    mod.main()


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_seq")
    (root / "image_0").mkdir()
    (root / "image_1").mkdir()
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (140, 200)).astype(np.uint8)
    times = []
    for i in range(4):
        left = base[i : i + 120, 2 * i : 2 * i + 160]
        _png(str(root / "image_0" / f"{i:06d}.png"), left)
        _png(str(root / "image_1" / f"{i:06d}.png"), np.roll(left, -4, axis=1))
        times.append(f"{0.1 * i:.6f}")
    (root / "times.txt").write_text("\n".join(times) + "\n")
    return root


def test_kitti_runner_and_evaluation(kitti_dir, tmp_path, monkeypatch):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(TINY_CFG)
    out = tmp_path / "est.txt"
    _run_example(
        "kitti", [str(cfg), str(kitti_dir), "--no-viewer", "--out", str(out)], monkeypatch
    )
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 4

    # Evaluate against itself: perfect scores, exercises the real script.
    r2 = _run(["scripts/evaluate_kitti.py", str(out), str(out)])
    assert r2.returncode == 0, r2.stderr[-2000:]
    metrics = json.loads(r2.stdout.strip().splitlines()[-1])
    assert metrics["ate_rmse_m"] == pytest.approx(0.0, abs=1e-6)
    assert metrics["frames"] == 4


def test_tum_runner(tmp_path, monkeypatch):
    seq = tmp_path / "tum_seq"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    rng = np.random.default_rng(1)
    rgb_lines, depth_lines = [], []
    for i in range(3):
        t = 0.05 * i
        img = rng.uniform(0, 255, (120, 160)).astype(np.uint8)
        d = (rng.uniform(0.5, 3.0, (120, 160)) * 5000).astype(np.uint16)
        _png(str(seq / "rgb" / f"{i}.png"), img)
        _png(str(seq / "depth" / f"{i}.png"), d)
        rgb_lines.append(f"{t:.6f} rgb/{i}.png")
        depth_lines.append(f"{t + 0.003:.6f} depth/{i}.png")
    (seq / "rgb.txt").write_text("# ts name\n" + "\n".join(rgb_lines))
    (seq / "depth.txt").write_text("# ts name\n" + "\n".join(depth_lines))

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(TINY_CFG + "\nDepthMapFactor: 5000.0\n")
    out = tmp_path / "est_tum.txt"
    _run_example(
        "tum_rgbd", [str(cfg), str(seq), "--no-viewer", "--out", str(out)], monkeypatch
    )
    assert len(out.read_text().strip().splitlines()) == 3
    r2 = _run(["scripts/evaluate_tum.py", str(out), str(out)])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert json.loads(r2.stdout.strip().splitlines()[-1])["ate_rmse_m"] == pytest.approx(
        0.0, abs=1e-6
    )
