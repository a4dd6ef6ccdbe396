"""SE(3)/SO(3) Lie-group invariants (GTSAM Pose3 conventions)."""

import numpy as np
import pytest

from superslam_tpu.geometry import Pose3, so3_expmap, so3_logmap


def rand_xi(rng, scale=1.0):
    return rng.standard_normal(6) * scale


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_expmap_logmap_roundtrip(rng):
    for _ in range(50):
        xi = rand_xi(rng)
        T = Pose3.expmap(xi)
        np.testing.assert_allclose(T.logmap(), xi, atol=1e-9)


def test_so3_roundtrip_small_and_large(rng):
    for scale in (1e-8, 1e-3, 1.0, 3.0):
        w = rng.standard_normal(3)
        w = w / np.linalg.norm(w) * scale
        R = so3_expmap(w)
        np.testing.assert_allclose(so3_logmap(R), w, atol=1e-7)
        # Orthonormality
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0


def test_so3_near_pi():
    w = np.array([0.0, 0.0, np.pi - 1e-9])
    R = so3_expmap(w)
    w2 = so3_logmap(R)
    np.testing.assert_allclose(np.abs(w2[2]), np.pi, atol=1e-6)


def test_compose_inverse_between(rng):
    a = Pose3.expmap(rand_xi(rng))
    b = Pose3.expmap(rand_xi(rng))
    ab = a * b
    np.testing.assert_allclose((a.inverse() * ab).matrix(), b.matrix(), atol=1e-12)
    np.testing.assert_allclose(a.between(ab).matrix(), b.matrix(), atol=1e-12)
    ident = a * a.inverse()
    np.testing.assert_allclose(ident.matrix(), np.eye(4), atol=1e-12)


def test_retract_local_inverse(rng):
    T = Pose3.expmap(rand_xi(rng))
    xi = rand_xi(rng, 0.3)
    np.testing.assert_allclose(T.local(T.retract(xi)), xi, atol=1e-10)


def test_transform_roundtrip_and_batch(rng):
    T = Pose3.expmap(rand_xi(rng))
    p = rng.standard_normal((10, 3))
    w = T.transform_from(p)
    np.testing.assert_allclose(T.transform_to(w), p, atol=1e-12)
    # single-point consistency
    np.testing.assert_allclose(T.transform_from(p[0]), w[0], atol=1e-12)


def test_adjoint_identity(rng):
    """Ad(T) xi == Log(T Exp(xi) T^-1) to first order and exactly."""
    T = Pose3.expmap(rand_xi(rng))
    xi = rand_xi(rng, 0.5)
    lhs = T.adjoint() @ xi
    rhs = (T * Pose3.expmap(xi) * T.inverse()).logmap()
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)
