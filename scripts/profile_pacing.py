#!/usr/bin/env python
"""Does pacing the submit rate prevent the relay's throughput decay?

CLAUDE.md: the tunnel runs ~70 fps for the first seconds then settles to
~45-55 (buffer backlog). If the decay is self-induced by over-submission,
a min-interval throttle should HOLD the early rate; if it is server-side
degradation, pacing just caps us lower. Run on the real chip.

Usage: python scripts/profile_pacing.py [min_interval_ms ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run(min_interval_s: float, frames, tracker, n=100) -> tuple[float, list]:
    lat = []
    t_next = time.perf_counter()
    t0 = time.perf_counter()
    win, wins = 25, []
    t_win = t0
    for i in range(n):
        now = time.perf_counter()
        if min_interval_s > 0 and now < t_next:
            time.sleep(t_next - now)
        t_next = time.perf_counter() + min_interval_s
        l, r = frames[i % len(frames)]
        s = time.perf_counter()
        tracker.track(l, r, 0.1 * i)
        lat.append(time.perf_counter() - s)
        if (i + 1) % win == 0:
            now = time.perf_counter()
            wins.append(win / (now - t_win))
            t_win = now
    tracker.flush()
    return n / (time.perf_counter() - t0), wins


def main() -> None:
    from superslam_tpu.slam import _enable_compilation_cache

    _enable_compilation_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench as b
    from superslam_tpu.frontend.pipelined import PipelinedStereoTracker

    intervals = [float(a) / 1e3 for a in sys.argv[1:]] or [0.0, 0.014, 0.018]
    frames = b.synth_sequence(40)
    for iv in intervals:
        pipeline, estimator = b.make_slam()
        tracker = PipelinedStereoTracker(
            pipeline, estimator, depth=3, batch=4,
            device_tracking=b._device_tracker_flag(),
        )
        for i in range(5):
            l, r = frames[i]
            tracker.track(l, r, 0.1 * i)
        tracker.flush()
        fps, wins = run(iv, frames, tracker)
        print(
            f"interval {iv*1e3:5.1f} ms: sustained {fps:5.1f} fps, "
            f"windows {[round(w, 1) for w in wins]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
