"""Device ring-buffer cosine index must agree with the host
CosineDescriptorIndex on ranking, excludeRecent, topK, and minScore."""

import numpy as np

from superslam_tpu.core.place_recognition import CosineDescriptorIndex
from superslam_tpu.ops.retrieval import DeviceCosineIndex


def test_device_index_matches_host():
    rng = np.random.default_rng(0)
    host = CosineDescriptorIndex()
    dev = DeviceCosineIndex(capacity=64, dim=32)
    descs = rng.standard_normal((20, 32)).astype(np.float32)
    for i, d in enumerate(descs):
        host.add(i, d)
        dev.add(i, d)

    for exclude, topk, min_score in [(0, 5, -1.0), (3, 3, 0.0), (5, 10, 0.2)]:
        q = descs[7] + rng.normal(0, 0.05, 32).astype(np.float32)
        h = host.query(q, exclude, topk, min_score)
        d = dev.query(q, exclude, topk, min_score)
        assert [c.keyframe_id for c in h] == [i for i, _ in d]
        np.testing.assert_allclose(
            [c.score for c in h], [s for _, s in d], atol=1e-5
        )


def test_sharded_index_matches_host():
    """Mesh-sharded retrieval (rows over all 8 virtual devices, per-shard
    top-k + all_gather) must reproduce the host index exactly — ranking,
    excludeRecent recency semantics (round-robin physical layout), topK,
    minScore."""
    from superslam_tpu.ops.retrieval import ShardedCosineIndex
    from superslam_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(1)
    mesh = make_mesh(8)
    host = CosineDescriptorIndex()
    shard = ShardedCosineIndex(mesh, capacity=64, dim=32)
    descs = rng.standard_normal((37, 32)).astype(np.float32)
    for i, d in enumerate(descs):
        host.add(100 + i, d)
        shard.add(100 + i, d)

    for exclude, topk, min_score in [(0, 5, -1.0), (3, 3, 0.0), (10, 8, 0.1)]:
        q = descs[11] + rng.normal(0, 0.05, 32).astype(np.float32)
        h = host.query(q, exclude, topk, min_score)
        s = shard.query(q, exclude, topk, min_score)
        assert [c.keyframe_id for c in h] == [i for i, _ in s], (exclude, topk)
        np.testing.assert_allclose(
            [c.score for c in h], [x for _, x in s], atol=1e-5
        )


def test_sharded_index_breaks_ties_by_insertion_like_host():
    """Duplicate descriptors (static scenes) land on DIFFERENT shards under
    the round-robin layout; the winner must still be the OLDEST insertion,
    exactly like the host index's stable sort — pins the host-side
    lexsort over the gathered per-shard winners."""
    from superslam_tpu.ops.retrieval import ShardedCosineIndex
    from superslam_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    host = CosineDescriptorIndex()
    shard = ShardedCosineIndex(make_mesh(8), capacity=32, dim=16)
    d_dup = rng.standard_normal(16).astype(np.float32)
    for i in range(12):
        d = d_dup if i in (1, 6, 9) else rng.standard_normal(16).astype(np.float32)
        host.add(200 + i, d)
        shard.add(200 + i, d)
    h = host.query(d_dup, 0, 4, 0.5)
    s = shard.query(d_dup, 0, 4, 0.5)
    assert [c.keyframe_id for c in h] == [i for i, _ in s]
    assert [i for i, _ in s][:3] == [201, 206, 209]  # insertion order on ties


def test_sharded_index_empty_and_excluded():
    from superslam_tpu.ops.retrieval import ShardedCosineIndex
    from superslam_tpu.parallel.mesh import make_mesh

    idx = ShardedCosineIndex(make_mesh(8), capacity=16, dim=4)
    assert idx.query(np.ones(4), 0, 3, 0.0) == []
    idx.add(0, np.ones(4))
    assert idx.query(np.ones(4), 1, 3, 0.0) == []  # nothing old enough
    out = idx.query(np.ones(4), 0, 3, 0.0)
    assert out and out[0][0] == 0


def test_device_index_empty_and_excluded():
    dev = DeviceCosineIndex(capacity=8, dim=4)
    assert dev.query(np.ones(4), 0, 3, 0.0) == []
    dev.add(0, np.ones(4))
    assert dev.query(np.ones(4), 1, 3, 0.0) == []  # nothing old enough
    out = dev.query(np.ones(4), 0, 3, 0.0)
    assert out and out[0][0] == 0
