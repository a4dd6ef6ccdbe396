#!/usr/bin/env python
"""Offline accuracy matrix over rendered ground-truth sequences.

The zero-egress counterpart of the reference's dataset benchmarks
(``/root/reference/scripts/benchmarks/_eval_common.py:38-111``): every leg
renders a sprite-world sequence with exact ground truth
(scripts/make_synthetic_sequence.py), runs the REAL end-to-end facade CLI
(examples/kitti.py / examples/tum_rgbd.py) with the render-domain-trained
SuperPoint weights, and evaluates ATE/RPE with the native metrics
(scripts/evaluate_kitti.py / evaluate_tum.py). Writes one JSON object per
leg plus the suite table to --out (default ACCURACY.json at the repo
root — the committed accuracy artifact).

Legs:
  stereo          pipelined facade on the 150-frame circuit (full lap)
  stereo_sync     SUPERSLAM_PIPELINE=0 — must track at least as well
  stereo_devkf    SUPERSLAM_DEVICE_TRACKER=1 — in-program solve + zero-lag
                  keyframe promotion (ops.frontend_step.track_kf_scan);
                  the TPU default path. The PROGRAM is platform-agnostic
                  (same XLA semantics on CPU), but the leg is NOT expected
                  to equal the host-solved legs: the device chain solves in
                  f32 against keyframe world points grounded at the
                  instantaneous LM pose, while the host chain solves in f64
                  against smoother-corrected keyframes (see the
                  stereo_devtrack / stereo_devkf_* bisect ablations)
  stereo_nogate   SUPERSLAM_TRACK_GATE=0 ablation (documents the gate's
                  measured value; see FrameTracker.track_gated)
  stereo_loop     SUPERSLAM_ENABLE_LOOP=1 on the same lap (laps=1.06
                  revisits the start)
  stereo_passthrough  analytic mutual-NN matcher ablation (documents what
                  the trained LightGlue transformer buys)
  rgbd            TUM-layout RGB-D rendering through examples/tum_rgbd.py

All legs except stereo_passthrough run the full trained model stack:
render-trained SuperPoint + synthetically-trained LightGlue (both
committed in weights/).

Usage:
  python scripts/accuracy_suite.py                  # all legs, ~30 min CPU
  python scripts/accuracy_suite.py --legs stereo rgbd
  python scripts/accuracy_suite.py --frames 80      # faster smoke
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER_SHIM = """\
import sys
import jax
jax.config.update("jax_platforms", "{platform}")
sys.argv = ["runner"] + sys.argv[1:]
import runpy
runpy.run_path({runner!r}, run_name="__main__")
"""


def _run(cmd, env_extra=None, timeout=4800):
    env = dict(os.environ)
    env["SUPERSLAM_NO_LOG_FILE"] = "1"
    if env_extra:
        env.update(env_extra)
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout
    )
    if r.returncode != 0:
        raise RuntimeError(
            f"{' '.join(cmd)} failed ({r.returncode}):\n{r.stderr[-2000:]}"
        )
    return r.stdout


def _shim(platform: str, runner: str) -> str:
    fd, path = tempfile.mkstemp(suffix=".py", prefix="acc_shim_")
    with os.fdopen(fd, "w") as f:
        f.write(RUNNER_SHIM.format(platform=platform, runner=runner))
    return path


def _eval_json(stdout: str) -> dict:
    return json.loads(stdout.strip().splitlines()[-1])


def run_stereo_leg(
    seq_dir: str, name: str, env_extra: dict, platform: str,
    config: str = "config.yaml",
) -> dict:
    shim = _shim(platform, os.path.join(REPO, "examples", "kitti.py"))
    est = os.path.join(seq_dir, f"est_{name}.txt")
    t0 = time.time()
    try:
        _run(
            [sys.executable, shim, os.path.join(seq_dir, config), seq_dir,
             "--no-viewer", "--out", est],
            env_extra,
        )
    finally:
        os.unlink(shim)
    out = _run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate_kitti.py"),
         est, os.path.join(seq_dir, "poses_gt.txt")]
    )
    m = _eval_json(out)
    m["leg"] = name
    m["wall_s"] = round(time.time() - t0, 1)
    return m


def run_rgbd_leg(seq_dir: str, name: str, env_extra: dict, platform: str) -> dict:
    shim = _shim(platform, os.path.join(REPO, "examples", "tum_rgbd.py"))
    est = os.path.join(seq_dir, f"est_{name}.txt")
    t0 = time.time()
    try:
        _run(
            [sys.executable, shim, os.path.join(seq_dir, "config.yaml"), seq_dir,
             "--no-viewer", "--out", est],
            env_extra,
        )
    finally:
        os.unlink(shim)
    out = _run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate_tum.py"),
         est, os.path.join(seq_dir, "groundtruth.txt")]
    )
    m = _eval_json(out)
    m["leg"] = name
    m["wall_s"] = round(time.time() - t0, 1)
    return m


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "ACCURACY.json"))
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--work-dir", default=None)
    ap.add_argument(
        "--platform", default="cpu",
        help="jax platform for the facade runs (cpu keeps the suite "
        "hermetic; tpu exercises the fused device pipeline)",
    )
    ap.add_argument(
        "--legs", nargs="*",
        default=["stereo", "stereo_sync", "stereo_devkf", "stereo_nogate",
                 "stereo_loop", "stereo_passthrough", "rgbd"],
    )
    ap.add_argument(
        "--lg-checkpoints", nargs="*", default=None,
        help="LightGlue checkpoint face-off: for each weights/<name>, run "
        "the stereo leg on the same render and store the table under the "
        "artifact's lightglue_checkpoints key (merged in place). Mirrors "
        "the reference's published per-model tables.",
    )
    ap.add_argument(
        "--merge", action="store_true",
        help="merge this run into an existing --out artifact instead of "
        "overwriting it: non-cpu runs are stored under a platform-named "
        "legs key (e.g. tpu_legs), so the committed ACCURACY.json can "
        "carry the CPU matrix plus the on-hardware validation block",
    )
    args = ap.parse_args()

    work = args.work_dir or tempfile.mkdtemp(prefix="accuracy_suite_")
    os.makedirs(work, exist_ok=True)
    stereo_seq = os.path.join(work, "stereo_seq")
    rgbd_seq = os.path.join(work, "rgbd_seq")

    need_stereo = any(leg.startswith("stereo") for leg in args.legs) or bool(
        args.lg_checkpoints
    )
    if need_stereo and not os.path.exists(os.path.join(stereo_seq, "poses_gt.txt")):
        print(f"[suite] rendering stereo circuit ({args.frames} frames)...")
        _run([sys.executable, os.path.join(REPO, "scripts", "make_synthetic_sequence.py"),
              stereo_seq, "--frames", str(args.frames)])
    if "rgbd" in args.legs and not os.path.exists(
        os.path.join(rgbd_seq, "groundtruth.txt")
    ):
        print(f"[suite] rendering rgbd circuit ({args.frames} frames)...")
        _run([sys.executable, os.path.join(REPO, "scripts", "make_synthetic_sequence.py"),
              rgbd_seq, "--format", "tum", "--frames", str(args.frames)])

    stereo_envs = {
        "stereo": {},
        "stereo_sync": {"SUPERSLAM_PIPELINE": "0"},
        "stereo_devkf": {"SUPERSLAM_DEVICE_TRACKER": "1"},
        "stereo_nogate": {"SUPERSLAM_TRACK_GATE": "0"},
        "stereo_loop": {"SUPERSLAM_ENABLE_LOOP": "1"},
        # Analytic mutual-NN matcher ablation: documents what the trained
        # LightGlue transformer buys (0.103 -> 0.068 m ATE, measured).
        "stereo_passthrough": {},
        # --- devkf bisect ablations (not in the default matrix) ---
        # Device f32 LM solve + host gates + dispatch-frozen keyframe:
        # isolates the device-solve/adoption factor from the in-program
        # keyframe chain.
        "stereo_devtrack": {
            "SUPERSLAM_DEVICE_TRACKER": "1",
            "SUPERSLAM_DEVICE_KF": "0",
        },
        # Full devkf with the speculative hybrid disabled (round-3 shape:
        # every frame re-matches in-scan).
        "stereo_devkf_nohybrid": {
            "SUPERSLAM_DEVICE_TRACKER": "1",
            "SUPERSLAM_DEVICE_KF_HYBRID": "0",
        },
        # Full devkf under the analytic passthrough matcher (legs ending in
        # _passthrough run on the passthrough config copy).
        "stereo_devkf_passthrough": {"SUPERSLAM_DEVICE_TRACKER": "1"},
        # Keyframe-cadence ablation: the suite config's covis_ratio 0.75
        # inserts a keyframe every 1-2 frames under the trained matcher's
        # covisibility statistics, putting a window solve + insertion path
        # on nearly every frame (bench decomposition measured the nokf
        # tracker at 3 fps vs 23.5 at covis 0.3, same process/phase). This
        # leg documents what the dense cadence buys in ATE.
        "stereo_covis03": {"SUPERSLAM_KF_COVIS": "0.3"},
        # MXU-precision kill-switch ablation (TPU-only semantics: on CPU
        # the wrapper is a documented no-op). ops/precision.py wraps every
        # solver program in default_matmul_precision('highest') because
        # XLA's default bf16-input f32 matmuls corrupt the geometry chains
        # (device-tracked ATE 0.2757 m vs 0.0705 host before the fix);
        # this leg re-measures that failure mode with the fix disabled.
        "stereo_devkf_f32off": {
            "SUPERSLAM_DEVICE_TRACKER": "1",
            "SUPERSLAM_F32_PRECISION": "0",
        },
        # Loop leg with a RANDOM-INIT place recognizer (loop.weights_file
        # pointed at a nonexistent file -> load_params falls back): the
        # ablation documenting what the trained EigenPlaces retrieval buys
        # over a random projection (reference src/EigenPlaces.cc:145-174
        # ships a trained network).
        "stereo_loop_randomplace": {"SUPERSLAM_ENABLE_LOOP": "1"},
    }
    need_passthrough_cfg = any(
        leg.endswith("_passthrough") for leg in args.legs
    )
    if need_passthrough_cfg and need_stereo:
        # Same rendered sequence, analytic matcher: swap the lightglue
        # checkpoint for __passthrough__ in a config copy.
        src = os.path.join(stereo_seq, "config.yaml")
        dst = os.path.join(stereo_seq, "config_passthrough.yaml")
        sec = ""
        with open(src) as f, open(dst, "w") as g:
            for line in f:
                if line and not line[0].isspace() and line.rstrip().endswith(":"):
                    sec = line.strip().rstrip(":")
                if sec == "lightglue" and line.strip().startswith("weights_file:"):
                    line = "  weights_file: __passthrough__\n"
                g.write(line)

    if "stereo_loop_randomplace" in args.legs and need_stereo:
        # Loop config copy with the recognizer checkpoint pointed at a
        # nonexistent file: load_params warns and falls back to random init.
        src = os.path.join(stereo_seq, "config.yaml")
        dst = os.path.join(stereo_seq, "config_randomplace.yaml")
        with open(src) as f, open(dst, "w") as g:
            for line in f:
                g.write(line)
                if line.strip() == "loop:":
                    g.write("  weights_file: __random_init_ablation__\n")

    results = []
    for leg in args.legs:
        print(f"[suite] running leg {leg}...")
        try:
            if leg == "rgbd":
                m = run_rgbd_leg(rgbd_seq, leg, {}, args.platform)
            elif leg.endswith("_passthrough"):
                m = run_stereo_leg(
                    stereo_seq, leg, stereo_envs.get(leg, {}), args.platform,
                    config="config_passthrough.yaml",
                )
            elif leg == "stereo_loop_randomplace":
                m = run_stereo_leg(
                    stereo_seq, leg, stereo_envs[leg], args.platform,
                    config="config_randomplace.yaml",
                )
            else:
                m = run_stereo_leg(stereo_seq, leg, stereo_envs[leg], args.platform)
        except Exception as e:  # record the failure, keep the suite going
            m = {"leg": leg, "error": str(e)[-500:]}
        print(f"[suite] {json.dumps(m)}")
        results.append(m)

    ckpt_results = []
    for ckpt in args.lg_checkpoints or []:
        # Same rendered sequence, a different committed LightGlue
        # checkpoint: swap weights_file in a config copy and run the
        # plain stereo leg (the reference publishes per-model tables;
        # this is the zero-egress equivalent).
        src = os.path.join(stereo_seq, "config.yaml")
        cfg = f"config_faceoff_{ckpt}.yaml"
        sec = ""
        substituted = False
        with open(src) as f, open(os.path.join(stereo_seq, cfg), "w") as g:
            for line in f:
                if line and not line[0].isspace() and line.rstrip().endswith(":"):
                    sec = line.strip().rstrip(":")
                if sec == "lightglue" and line.strip().startswith("weights_file:"):
                    line = f"  weights_file: {ckpt}\n"
                    substituted = True
                g.write(line)
        name = f"stereo_lg_{os.path.splitext(ckpt)[0]}"
        print(f"[suite] running checkpoint face-off {name}...")
        try:
            if not substituted:
                # Without the rewrite the leg would silently score the
                # default checkpoint under this row's name.
                raise RuntimeError(
                    f"no lightglue.weights_file line found in {src}; "
                    "face-off substitution did not fire"
                )
            m = run_stereo_leg(stereo_seq, name, {}, args.platform, config=cfg)
            m["checkpoint"] = ckpt
            side = os.path.join(REPO, "weights", ckpt + ".json")
            if os.path.exists(side):
                with open(side) as f:
                    meta = json.load(f)
                for k in ("steps", "platform", "precision", "recall"):
                    if k in meta:
                        m[f"train_{k}"] = meta[k]
        except Exception as e:
            m = {"leg": name, "checkpoint": ckpt, "error": str(e)[-500:]}
        print(f"[suite] {json.dumps(m)}")
        ckpt_results.append(m)

    suite = {
        "suite": "rendered-world accuracy",
        "frames": args.frames,
        "platform": args.platform,
        "weights": "render-domain trained SuperPoint + synthetically-trained "
        "LightGlue (weights/; stereo_passthrough = analytic-matcher ablation)",
        "legs": results,
    }
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            suite = json.load(f)
        key = "legs" if args.platform == "cpu" else f"{args.platform}_legs"
        # The TPU platform registers as 'axon' in this environment; name
        # the block by what it is, not the transport.
        key = "tpu_legs" if key == "axon_legs" else key
        # Update by leg name: re-running a subset refreshes those legs in
        # place without dropping the rest of the block.
        merged = {m["leg"]: m for m in suite.get(key, [])}
        merged.update({m["leg"]: m for m in results})
        suite[key] = list(merged.values())
        if key != "legs":
            suite[f"{key.split('_')[0]}_frames"] = args.frames
        if ckpt_results:
            merged_c = {m["leg"]: m for m in suite.get("lightglue_checkpoints", [])}
            merged_c.update({m["leg"]: m for m in ckpt_results})
            suite["lightglue_checkpoints"] = list(merged_c.values())
    elif ckpt_results:
        suite["lightglue_checkpoints"] = ckpt_results
    with open(args.out, "w") as f:
        json.dump(suite, f, indent=2)
        f.write("\n")
    print(f"[suite] wrote {args.out}")


if __name__ == "__main__":
    main()
