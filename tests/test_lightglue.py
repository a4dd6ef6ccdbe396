"""LightGlue JAX matcher: shape contracts, padding invariance (the key
static-shape property), mutual-argmax extraction semantics, and keypoint
normalization parity with the reference wrapper (src/LightGlue.cc:163-172)."""

import numpy as np
import pytest

import jax.numpy as jnp

from superslam_tpu.models.lightglue import (
    extract_matches,
    init_lightglue_params,
    lightglue_forward,
    lightglue_match,
    normalize_keypoints,
)


@pytest.fixture(scope="module")
def params():
    return init_lightglue_params(seed=0)


def make_inputs(rng, n0, n1, pad_to=None):
    k0 = rng.uniform(-1, 1, (1, n0, 2)).astype(np.float32)
    k1 = rng.uniform(-1, 1, (1, n1, 2)).astype(np.float32)
    d0 = rng.standard_normal((1, n0, 256)).astype(np.float32)
    d1 = rng.standard_normal((1, n1, 256)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    m0 = np.ones((1, n0), bool)
    m1 = np.ones((1, n1), bool)
    if pad_to:
        def pad(a, n):
            w = [(0, 0), (0, pad_to - n)] + [(0, 0)] * (a.ndim - 2)
            return np.pad(a, w)
        k0, d0, m0 = pad(k0, n0), pad(d0, n0), pad(m0, n0)
        k1, d1, m1 = pad(k1, n1), pad(d1, n1), pad(m1, n1)
    return map(jnp.asarray, (k0, d0, k1, d1, m0, m1))


def test_fused_pallas_layers_match_xla(params, monkeypatch):
    """The fused Pallas transformer layers (interpret mode on CPU) must
    reproduce the XLA layer stack's log-assignment."""
    rng = np.random.default_rng(5)
    k0, d0, k1, d1, m0, m1 = make_inputs(rng, 40, 36, pad_to=48)
    monkeypatch.setenv("SUPERSLAM_PALLAS_LG", "0")
    ref = np.asarray(
        lightglue_forward(params, k0, d0, k1, d1, m0, m1, compute_dtype=jnp.float32)
    )
    monkeypatch.setenv("SUPERSLAM_PALLAS_LG", "1")
    got = np.asarray(
        lightglue_forward(params, k0, d0, k1, d1, m0, m1, compute_dtype=jnp.float32)
    )
    assert got.shape == ref.shape
    # Same argmax structure and close log-probs on the valid block.
    v = ref[:, :40, :36]
    g = got[:, :40, :36]
    assert (np.argmax(v, axis=2) == np.argmax(g, axis=2)).mean() > 0.97
    assert np.abs(np.exp(v) - np.exp(g)).max() < 5e-3


def test_passthrough_init_recovers_permutation():
    """init_lightglue_params(passthrough=True) must recover a permuted
    identical descriptor set (the property bench.py's real-tracking
    workload depends on; fully random layers decorrelate features to ~0
    matches)."""
    from superslam_tpu.models.lightglue import extract_matches

    lg = init_lightglue_params(0, passthrough=True)
    rng = np.random.default_rng(1)
    K = 96
    d = rng.standard_normal((1, K, 256)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    k0 = rng.uniform(-1, 1, (1, K, 2)).astype(np.float32)
    perm = rng.permutation(K)
    m0 = np.ones((1, K), bool)
    la = lightglue_forward(
        lg, jnp.asarray(k0), jnp.asarray(d),
        jnp.asarray(k0[:, perm] + 0.01), jnp.asarray(d[:, perm]),
        jnp.asarray(m0), jnp.asarray(m0),
    )
    m, _ = extract_matches(la, jnp.asarray(m0), jnp.asarray(m0), 0.1)
    m = np.asarray(m[0])
    correct = sum(1 for i in range(K) if m[i] >= 0 and perm[m[i]] == i)
    assert correct > 0.9 * K, correct


def test_forward_shape(params):
    rng = np.random.default_rng(0)
    k0, d0, k1, d1, m0, m1 = make_inputs(rng, 32, 48)
    la = lightglue_forward(params, k0, d0, k1, d1, m0, m1)
    assert la.shape == (1, 32, 48)
    assert np.isfinite(np.asarray(la)[:, :32, :48]).all()


def test_padding_invariance(params):
    """Padding both sets to a larger static K must not change the scores or
    matches of the real keypoints — the property that makes one compiled
    program serve every frame."""
    rng = np.random.default_rng(1)
    k0, d0, k1, d1, m0, m1 = make_inputs(rng, 24, 40)
    la_exact = np.asarray(
        lightglue_forward(params, k0, d0, k1, d1, m0, m1, compute_dtype=jnp.float32)
    )
    rng = np.random.default_rng(1)
    k0p, d0p, k1p, d1p, m0p, m1p = make_inputs(rng, 24, 40, pad_to=64)
    la_pad = np.asarray(
        lightglue_forward(
            params, k0p, d0p, k1p, d1p, m0p, m1p, compute_dtype=jnp.float32
        )
    )
    # f32 reduction order differs between the two shapes; only bitwise-order
    # noise is tolerated, not structural leakage from the padding.
    np.testing.assert_allclose(la_pad[:, :24, :40], la_exact, atol=2e-3)

    me, se = lightglue_match(params, k0, d0, k1, d1, m0, m1)
    mp, sp = lightglue_match(params, k0p, d0p, k1p, d1p, m0p, m1p)
    np.testing.assert_array_equal(np.asarray(mp)[:, :24], np.asarray(me))
    # Padding rows must never match.
    assert (np.asarray(mp)[:, 24:] == -1).all()


def test_extract_matches_semantics():
    """Hand-built log-assignment: mutual-argmax + threshold + masks."""
    p = np.full((1, 3, 3), -10.0, np.float32)
    p[0, 0, 1] = np.log(0.9)  # 0 <-> 1 mutual, strong
    p[0, 1, 1] = np.log(0.3)  # 1 -> 1 not mutual (1's best is row 0)
    p[0, 2, 2] = np.log(0.05)  # mutual but below threshold
    m0 = np.ones((1, 3), bool)
    m1 = np.ones((1, 3), bool)
    matches, scores = extract_matches(jnp.asarray(p), jnp.asarray(m0), jnp.asarray(m1), 0.1)
    matches, scores = np.asarray(matches), np.asarray(scores)
    assert matches[0, 0] == 1 and scores[0, 0] == pytest.approx(0.9, rel=1e-5)
    assert matches[0, 1] == -1
    assert matches[0, 2] == -1  # below threshold


def test_log_assignment_is_log_probability(params):
    """exp(scores) must form a valid sub-assignment: row/col sums <= 1."""
    rng = np.random.default_rng(2)
    k0, d0, k1, d1, m0, m1 = make_inputs(rng, 16, 16)
    la = np.asarray(
        lightglue_forward(params, k0, d0, k1, d1, m0, m1, compute_dtype=jnp.float32)
    )
    p = np.exp(la[0])
    assert (p.sum(axis=1) <= 1.0 + 1e-4).all()
    assert (p.sum(axis=0) <= 1.0 + 1e-4).all()


def test_normalize_keypoints():
    kpts = jnp.asarray(np.array([[[0.0, 0.0], [1241.0, 376.0], [620.5, 188.0]]], np.float32))
    out = np.asarray(normalize_keypoints(kpts, 1241, 376))
    # (kpt - size/2) / (max(w,h)/2)
    np.testing.assert_allclose(out[0, 2], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[0, 0], [-1.0, -376.0 / 1241.0], atol=1e-5)
    np.testing.assert_allclose(out[0, 1], [1.0, 376.0 / 1241.0], atol=1e-5)


def test_identical_descriptor_sets_prefer_diagonal(params):
    """Two identical keypoint+descriptor sets: the similarity structure must
    make i<->i the argmax for most rows (architecture sanity, weight-free)."""
    rng = np.random.default_rng(3)
    k0, d0, _, _, m0, _ = make_inputs(rng, 32, 32)
    la = np.asarray(
        lightglue_forward(params, k0, d0, k0, d0, m0, m0, compute_dtype=jnp.float32)
    )
    diag_is_max = (np.argmax(la[0], axis=1) == np.arange(32)).mean()
    assert diag_is_max > 0.9


def test_bf16_matches_f32_assignments(params):
    """SURVEY §7 hard part: bf16 numerics must not change match decisions —
    the robust back-end absorbs score jitter, but the assignment structure
    (who matches whom) must be stable across compute dtypes."""
    rng = np.random.default_rng(9)
    k0, d0, k1, d1, m0, m1 = make_inputs(rng, 48, 48)
    la16 = np.asarray(
        lightglue_forward(params, k0, d0, k1, d1, m0, m1, compute_dtype=jnp.bfloat16)
    )
    la32 = np.asarray(
        lightglue_forward(params, k0, d0, k1, d1, m0, m1, compute_dtype=jnp.float32)
    )
    m16, _ = extract_matches(jnp.asarray(la16), m0, m1, 0.1)
    m32, _ = extract_matches(jnp.asarray(la32), m0, m1, 0.1)
    m16, m32 = np.asarray(m16[0]), np.asarray(m32[0])
    agree = (m16 == m32).mean()
    assert agree > 0.9, f"bf16/f32 assignment agreement {agree:.2f}"


def test_retain_for_matching_device_records():
    """Keyframe records retained by the matcher stay device-resident and
    match identically to the host float32 rows they replace (the loop
    verifier's data path: record PaddedFeatures -> matcher.match with no
    host round trip)."""
    import jax.numpy as jnp

    from superslam_tpu.frontend.features import PaddedFeatures, host_descriptors
    from superslam_tpu.frontend.matcher import LightGlueMatcher

    K, W, H = 64, 160, 120
    params = init_lightglue_params(0)
    matcher = LightGlueMatcher(params, image_width=W, image_height=H, max_keypoints=K)
    rng = np.random.default_rng(5)

    def feats(seed, n):
        r = np.random.default_rng(seed)
        kp = np.zeros((K, 2), np.float32)
        kp[:n] = r.uniform([4, 4], [W - 4, H - 4], (n, 2))
        d = r.standard_normal((K, 256)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d[n:] = 0
        return PaddedFeatures(
            kpts=jnp.asarray(kp), desc=jnp.asarray(d), n=n, width=W, height=H,
            valid=jnp.asarray(np.arange(K) < n),
        )

    f0, f1 = feats(1, 40), feats(2, 36)
    r0, r1 = matcher.retain_for_matching(f0), matcher.retain_for_matching(f1)
    assert not isinstance(r0, np.ndarray)  # stayed on device

    kp0 = np.asarray(f0.kpts)[: f0.n]
    kp1 = np.asarray(f1.kpts)[: f1.n]
    m_dev = matcher.match(kp0, r0, kp1, r1)
    m_host = matcher.match(
        kp0, host_descriptors(f0), kp1, host_descriptors(f1)
    )
    np.testing.assert_array_equal(m_dev.matches, m_host.matches)

    # Host/numpy records fall back to float32 rows.
    host_rec = matcher.retain_for_matching(host_descriptors(f0))
    assert isinstance(host_rec, np.ndarray) and host_rec.dtype == np.float32
