"""KeyframeDatabase round-trip/order + SparseMap anchor transform + frame
backprojection (mirrors tests/test_keyframe_database.cc etc.)."""

import numpy as np
import pytest

from superslam_tpu.core.frame import StereoFrame
from superslam_tpu.core.keyframes import KeyframeDatabase, KeyframeRecord
from superslam_tpu.core.sparse_map import SparseMap
from superslam_tpu.geometry import Pose3

from helpers import make_calib


def test_database_roundtrip_and_order():
    db = KeyframeDatabase()
    for kid in (5, 2, 9):
        db.add(KeyframeRecord(keyframe_id=kid, timestamp=0.1 * kid))
    assert len(db) == 3
    assert db.has(2) and not db.has(3)
    assert db.get(9).timestamp == pytest.approx(0.9)
    assert [r.keyframe_id for r in db.records()] == [5, 2, 9]  # insertion order
    with pytest.raises(KeyError):
        db.get(42)


def test_sparse_map_anchor_transform():
    m = SparseMap()
    pts_cam = np.array([[0.0, 0.0, 5.0], [1.0, 0.0, 5.0]])
    m.add_keyframe(0, pts_cam)
    anchor = Pose3(t=np.array([10.0, 0.0, 0.0]))
    cloud = m.cloud({0: anchor})
    np.testing.assert_allclose(cloud, pts_cam + np.array([10.0, 0.0, 0.0]))
    # Keyframes without anchors are skipped.
    m.add_keyframe(1, pts_cam)
    assert m.cloud({0: anchor}).shape[0] == 2
    assert m.keyframe_count() == 2


def test_frame_backprojection():
    calib = make_calib()
    pose = Pose3(t=np.array([2.0, 0.0, 0.0]))
    X_cam = np.array([1.0, -0.5, 8.0])
    uL = calib.fx * X_cam[0] / X_cam[2] + calib.cx
    uR = calib.fx * (X_cam[0] - calib.baseline) / X_cam[2] + calib.cx
    v = calib.fy * X_cam[1] / X_cam[2] + calib.cy
    f = StereoFrame(
        keypoints_left=np.array([[uL, v]], dtype=np.float32),
        stereo=np.array([[uL, uR, v]]),
        has_depth=np.array([True]),
        pose=pose,
    )
    np.testing.assert_allclose(f.backproject(0, calib), X_cam + [2, 0, 0], atol=1e-9)
    np.testing.assert_allclose(
        f.backproject_all(calib, np.array([0])), [X_cam + [2, 0, 0]], atol=1e-9
    )
