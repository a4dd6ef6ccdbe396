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


def test_device_record_budget_demotes_oldest_to_host():
    """Beyond SUPERSLAM_DEVICE_KF_RECORDS the database demotes the OLDEST
    device-resident record's descriptors to host float32 rows (bounding
    HBM growth over long runs); newer records stay on device and demoted
    ones still match via the host path."""
    import jax.numpy as jnp

    from superslam_tpu.core.keyframes import KeyframeDatabase, KeyframeRecord
    from superslam_tpu.frontend.features import PaddedFeatures

    db = KeyframeDatabase(device_record_budget=2)
    K = 8

    def device_rec(i):
        return KeyframeRecord(
            keyframe_id=i,
            descriptors_left=PaddedFeatures(
                kpts=jnp.zeros((K, 2)), desc=jnp.full((K, 256), float(i)),
                n=4, width=32, height=32,
            ),
        )

    for i in range(4):
        db.add(device_rec(i))
    # Records 0 and 1 demoted to float32 host rows truncated to n.
    for i in (0, 1):
        d = db.get(i).descriptors_left
        assert isinstance(d, np.ndarray) and d.dtype == np.float32
        assert d.shape == (4, 256) and np.all(d == float(i))
    for i in (2, 3):
        assert not isinstance(db.get(i).descriptors_left, np.ndarray)

    # Host records never enter the device ledger.
    db2 = KeyframeDatabase(device_record_budget=1)
    db2.add(KeyframeRecord(keyframe_id=0, descriptors_left=np.zeros((4, 256))))
    db2.add(device_rec(1))
    db2.add(device_rec(2))
    assert isinstance(db2.get(1).descriptors_left, np.ndarray)
    assert not isinstance(db2.get(2).descriptors_left, np.ndarray)
