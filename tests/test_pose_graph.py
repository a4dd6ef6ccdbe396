"""GlobalPoseGraph: chain recovery from perturbed seeds, loop drift
correction, and newest-loop-edge rollback on an inconsistent edge
(mirrors tests/test_global_pose_graph.cc + GlobalPoseGraph.cc:68-98)."""

import numpy as np

from superslam_tpu.core.pose_graph import GlobalPoseGraph
from superslam_tpu.geometry import Pose3


def _sigmas(r=0.02, t=0.05):
    return np.array([r, r, r, t, t, t])


def test_chain_recovery_from_perturbed_seeds():
    rng = np.random.default_rng(31)
    true_poses = [Pose3(t=np.array([1.0 * i, 0.0, 0.0])) for i in range(6)]
    g = GlobalPoseGraph()
    for i, tp in enumerate(true_poses):
        seed = tp if i == 0 else tp.retract(rng.standard_normal(6) * 0.1)
        g.add_keyframe(i, seed, is_first=(i == 0))
    for i in range(5):
        rel = true_poses[i].between(true_poses[i + 1])
        g.add_odometry(i, i + 1, rel, _sigmas())
    result = g.optimize_and_get_all()
    for i, tp in enumerate(true_poses):
        assert np.linalg.norm(result[i].t - tp.t) < 1e-3


def test_loop_corrects_drift():
    """Odometry with systematic drift; a loop edge to the start pulls the
    final pose back."""
    n = 8
    true_rel = Pose3(t=np.array([1.0, 0.0, 0.0]))
    drift_rel = Pose3(t=np.array([1.0, 0.08, 0.0]))  # biased odometry
    g = GlobalPoseGraph()
    pose = Pose3()
    g.add_keyframe(0, pose, is_first=True)
    for i in range(1, n):
        pose = pose * drift_rel
        g.add_keyframe(i, pose, is_first=False)
        g.add_odometry(i - 1, i, drift_rel, _sigmas())
    drifted_final = g.pose_of(n - 1)
    assert abs(drifted_final.t[1]) > 0.4

    # True relative pose from node 0 to node n-1 (what verification recovers).
    true_final = Pose3(t=np.array([float(n - 1), 0.0, 0.0]))
    g.add_loop(0, n - 1, true_final, np.array([0.02, 0.02, 0.02, 0.05, 0.05, 0.05]))
    result = g.optimize_and_get_all()
    assert not g.last_loop_rejected()
    assert abs(result[n - 1].t[1]) < abs(drifted_final.t[1]) * 0.5


def test_insane_loop_edge_rolled_back():
    g = GlobalPoseGraph()
    g.add_keyframe(0, Pose3(), is_first=True)
    g.add_keyframe(1, Pose3(t=np.array([1.0, 0, 0])), is_first=False)
    g.add_odometry(0, 1, Pose3(t=np.array([1.0, 0, 0])), _sigmas())
    # A non-finite loop edge is refused outright at add time.
    bad = Pose3(t=np.array([np.nan, 0, 0]))
    g.add_loop(0, 1, bad, _sigmas())
    result = g.optimize_and_get_all()
    assert result[1].is_finite()
    # An absurd-but-finite edge with near-zero sigma that explodes the solve
    # gets popped by the rollback loop.
    g2 = GlobalPoseGraph()
    g2.add_keyframe(0, Pose3(), is_first=True)
    g2.add_keyframe(1, Pose3(t=np.array([1.0, 0, 0])), is_first=False)
    g2.add_odometry(0, 1, Pose3(t=np.array([1.0, 0, 0])), _sigmas())
    g2.add_loop(0, 1, Pose3(t=np.array([1e9, 0, 0])), np.full(6, 1e-12))
    result2 = g2.optimize_and_get_all()
    for p in result2.values():
        assert p.is_finite()
        assert p.translation_norm() < 1e6


def test_warm_start_and_idempotent_add():
    g = GlobalPoseGraph()
    g.add_keyframe(0, Pose3(), is_first=True)
    g.add_keyframe(0, Pose3(t=np.array([5.0, 0, 0])), is_first=False)  # ignored
    assert g.size() == 1
    r = g.optimize_and_get_all()
    assert r[0].translation_norm() < 1e-6


def test_native_and_numpy_solvers_agree(monkeypatch):
    """optimize_and_get_all routes through the C++ core when built; both
    backends run the same factors/Huber/damping and must agree on a graph
    with drift + a loop edge."""
    from superslam_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native core not built")

    def build():
        g = GlobalPoseGraph()
        rng = np.random.default_rng(3)
        pose = Pose3()
        g.add_keyframe(0, pose, is_first=True)
        for i in range(1, 12):
            rel = Pose3.expmap(
                np.concatenate([rng.normal(0, 0.02, 3), [1.0, 0, 0.05]])
            )
            drift = Pose3.expmap(rng.normal(0, 0.01, 6))
            pose = pose * rel * drift
            g.add_keyframe(i, pose, is_first=False)
            g.add_odometry(i - 1, i, rel, _sigmas())
        g.add_loop(0, 11, Pose3(t=np.array([0.5, 0, 0])), _sigmas())
        return g

    monkeypatch.setenv("SUPERSLAM_NATIVE", "1")
    rn = build().optimize_and_get_all()
    monkeypatch.setenv("SUPERSLAM_NATIVE", "0")
    rp = build().optimize_and_get_all()
    for k in rn:
        d = rn[k].inverse() * rp[k]
        assert np.linalg.norm(d.logmap()) < 1e-4, (k, d.logmap())
