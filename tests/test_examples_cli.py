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


def test_multi_sequence_runner(kitti_dir, tmp_path, monkeypatch):
    """Config-5 runner: two replicated sequences through the batched fused
    program (8 virtual CPU devices -> the mesh-sharded path), per-sequence
    KITTI trajectories written and identical (same input stream)."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(TINY_CFG)
    out_dir = tmp_path / "multi"
    _run_example(
        "multi_sequence",
        [str(cfg), str(kitti_dir), "--replicate", "2", "--out-dir", str(out_dir)],
        monkeypatch,
    )
    t0 = (out_dir / "seq00.txt").read_text().strip().splitlines()
    t1 = (out_dir / "seq01.txt").read_text().strip().splitlines()
    assert len(t0) == 4 and t0 == t1


def test_euroc_runner_with_rectification(tmp_path, monkeypatch):
    """EuRoC layout (mav0/cam0/{data.csv,data/}) with identity-rotation
    rectification maps built from the LEFT.*/RIGHT.* yaml blocks — the
    on-the-fly remap path of examples/stereo/euroc.cc."""
    seq = tmp_path / "euroc_seq"
    for cam in ("cam0", "cam1"):
        (seq / "mav0" / cam / "data").mkdir(parents=True)
    rng = np.random.default_rng(2)
    base = rng.uniform(0, 255, (140, 200)).astype(np.uint8)
    lines = ["#timestamp [ns],filename"]
    for i in range(4):
        left = base[i : i + 120, 2 * i : 2 * i + 160]
        name = f"{1403636579763555584 + i * 50000000}.png"
        _png(str(seq / "mav0" / "cam0" / "data" / name), left)
        _png(str(seq / "mav0" / "cam1" / "data" / name), np.roll(left, -4, axis=1))
        lines.append(f"{1403636579763555584 + i * 50000000},{name}")
    (seq / "mav0" / "cam0" / "data.csv").write_text("\n".join(lines) + "\n")

    rect = """
LEFT.width: 160
LEFT.height: 120
LEFT.K: {rows: 3, cols: 3, data: [80.0, 0.0, 80.0, 0.0, 80.0, 60.0, 0.0, 0.0, 1.0]}
LEFT.D: {rows: 1, cols: 5, data: [0.0, 0.0, 0.0, 0.0, 0.0]}
LEFT.R: {rows: 3, cols: 3, data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]}
LEFT.P: {rows: 3, cols: 4, data: [80.0, 0.0, 80.0, 0.0, 0.0, 80.0, 60.0, 0.0, 0.0, 0.0, 1.0, 0.0]}
RIGHT.width: 160
RIGHT.height: 120
RIGHT.K: {rows: 3, cols: 3, data: [80.0, 0.0, 80.0, 0.0, 80.0, 60.0, 0.0, 0.0, 1.0]}
RIGHT.D: {rows: 1, cols: 5, data: [0.0, 0.0, 0.0, 0.0, 0.0]}
RIGHT.R: {rows: 3, cols: 3, data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]}
RIGHT.P: {rows: 3, cols: 4, data: [80.0, 0.0, 80.0, 0.0, 0.0, 80.0, 60.0, 0.0, 0.0, 0.0, 1.0, 0.0]}
"""
    cfg = tmp_path / "euroc.yaml"
    cfg.write_text(TINY_CFG + rect)
    out = tmp_path / "est_euroc.txt"
    _run_example(
        "euroc", [str(cfg), str(seq), "--no-viewer", "--out", str(out)], monkeypatch
    )
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 4  # TUM format: ts x y z qx qy qz qw
    assert all(len(l.split()) == 8 for l in lines)
    # EuRoC ground truth is its own CSV schema (ns, t, q_wxyz): synthesize a
    # GT file from the estimate so the evaluator's association + Umeyama
    # path runs for real and scores 0 against itself.
    gt = tmp_path / "gt.csv"
    rows = ["#timestamp, p_x, p_y, p_z, q_w, q_x, q_y, q_z"]
    for l in lines:
        v = l.split()
        ts_ns = int(round(float(v[0]) * 1e9))
        x, y, z, qx, qy, qz, qw = map(float, v[1:])
        rows.append(f"{ts_ns},{x},{y},{z},{qw},{qx},{qy},{qz}")
    gt.write_text("\n".join(rows) + "\n")
    r2 = _run(["scripts/evaluate_euroc.py", str(out), str(gt)])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert json.loads(r2.stdout.strip().splitlines()[-1])["ate_rmse_m"] == pytest.approx(
        0.0, abs=1e-5
    )


def test_tartan_runner(tmp_path, monkeypatch):
    """TartanAir layout: image_left/image_right, 10 Hz synthesized stamps."""
    seq = tmp_path / "tartan_seq"
    (seq / "image_left").mkdir(parents=True)
    (seq / "image_right").mkdir()
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, (140, 200)).astype(np.uint8)
    for i in range(3):
        left = base[i : i + 120, 2 * i : 2 * i + 160]
        _png(str(seq / "image_left" / f"{i:06d}_left.png"), left)
        _png(str(seq / "image_right" / f"{i:06d}_right.png"), np.roll(left, -4, axis=1))
    cfg = tmp_path / "tartan.yaml"
    cfg.write_text(TINY_CFG)
    out = tmp_path / "est_tartan.txt"
    _run_example(
        "tartan", [str(cfg), str(seq), "--no-viewer", "--out", str(out)], monkeypatch
    )
    assert len(out.read_text().strip().splitlines()) == 3


def test_benchmark_runner(kitti_dir, tmp_path, monkeypatch, capsys):
    """The dataset benchmark (examples/stereo/benchmark.cc analogue) must
    report latency percentiles + sustained fps over a KITTI sequence."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(TINY_CFG)
    _run_example(
        "benchmark",
        [str(cfg), str(kitti_dir), "--no-viewer", "--warmup", "1"],
        monkeypatch,
    )
    text = capsys.readouterr().out + capsys.readouterr().err
    assert "fps" in text and "p95" in text


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
