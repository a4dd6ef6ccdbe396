"""Shared CLI helpers for the example runners.

Equivalent of ``/root/reference/examples/example_common.h:44-108``: argument
parsing (``<settings.yaml> <sequence_dir> [--no-viewer]``), optional pacing
to the dataset frame rate, and the tracking-time report.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def parse_example_args(dataset: str, extra: dict | None = None) -> argparse.Namespace:
    ap = argparse.ArgumentParser(prog=dataset)
    ap.add_argument("settings", help="settings yaml")
    ap.add_argument("sequence", help="sequence directory")
    ap.add_argument("--no-viewer", dest="viewer", action="store_false", default=True)
    ap.add_argument("--viewer", dest="viewer", action="store_true")
    ap.add_argument("--max-frames", type=int, default=0, help="0 = all")
    ap.add_argument("--pace", action="store_true", help="play back at dataset rate")
    ap.add_argument(
        "--out", default=None, help="trajectory output path (default results/...)"
    )
    for name, kw in (extra or {}).items():
        ap.add_argument(name, **kw)
    args = ap.parse_args()
    if not os.path.isfile(args.settings):
        print(f"Cannot open settings file: {args.settings}", file=sys.stderr)
        sys.exit(1)
    if not os.path.isdir(args.sequence):
        print(f"Cannot open sequence dir: {args.sequence}", file=sys.stderr)
        sys.exit(1)
    return args


def pace_to_timestamp(track_ms: float, dt: float) -> None:
    remain_ms = dt * 1000.0 - track_ms
    time.sleep(max(remain_ms, 10.0) / 1000.0 if remain_ms > 10.0 else 0.01)


def report_timing(times_ms: list[float]) -> None:
    if not times_ms:
        return
    t = np.sort(np.asarray(times_ms))
    print(
        f"=== Tracking time: mean {t.mean():.2f}ms  median {t[len(t) // 2]:.2f}ms"
        f"  over {len(t)} frames ==="
    )


def load_gray(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img
