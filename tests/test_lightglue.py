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


def test_extract_matches_tie_safety():
    """Two rows with EXACTLY tied logits on the same column: only the first
    row may claim it (first-occurrence mutual-argmax, matching the
    reference's exact argmax semantics, src/LightGlue.cc:326-363)."""
    p = np.full((1, 4, 4), -10.0, np.float32)
    p[0, 1, 2] = np.log(0.8)  # rows 1 and 3 tie on column 2
    p[0, 3, 2] = np.log(0.8)
    m = np.ones((1, 4), bool)
    matches, scores = extract_matches(jnp.asarray(p), jnp.asarray(m), jnp.asarray(m), 0.1)
    matches = np.asarray(matches)
    assert matches[0, 1] == 2  # first row wins the tie
    assert matches[0, 3] == -1  # second tied row must NOT also claim col 2


def _build_torch_lightglue(torch):
    """cvg/LightGlue matcher-only forward in torch, with the NATIVE state-dict
    names and layouts (including the interleaved (head, channel, qkv) Wqkv
    packing) — the same architecture the reference exports
    (utils/convert_lightglue_to_onnx.py:56-125). Written fresh here as the
    independent oracle for the weight-loading contract."""
    import torch.nn as nn
    import torch.nn.functional as F

    DIM, HEADS, LAYERS = 256, 4, 9
    HEAD_DIM = DIM // HEADS

    def rotate_half(t):
        t = t.unflatten(-1, (-1, 2))
        t1, t2 = t.unbind(dim=-1)
        return torch.stack((-t2, t1), dim=-1).flatten(start_dim=-2)

    class Posenc(nn.Module):
        def __init__(self):
            super().__init__()
            self.Wr = nn.Linear(2, HEAD_DIM // 2, bias=False)

        def forward(self, kpts):
            proj = self.Wr(kpts)  # (B, N, 32)
            emb = torch.stack([torch.cos(proj), torch.sin(proj)], 0)
            return emb.unsqueeze(-3).repeat_interleave(2, dim=-1)  # (2,B,1,N,64)

    def make_ffn():
        return nn.Sequential(
            nn.Linear(2 * DIM, 2 * DIM),
            nn.LayerNorm(2 * DIM),
            nn.GELU(),
            nn.Linear(2 * DIM, DIM),
        )

    class SelfBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.Wqkv = nn.Linear(DIM, 3 * DIM)
            self.out_proj = nn.Linear(DIM, DIM)
            self.ffn = make_ffn()

        def forward(self, x, enc):
            b, n, _ = x.shape
            qkv = self.Wqkv(x).unflatten(-1, (HEADS, -1, 3)).transpose(1, 2)
            q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
            q = q * enc[0] + rotate_half(q) * enc[1]
            k = k * enc[0] + rotate_half(k) * enc[1]
            sim = torch.einsum("bhid,bhjd->bhij", q, k) / HEAD_DIM**0.5
            ctx = torch.einsum("bhij,bhjd->bhid", F.softmax(sim, -1), v)
            msg = self.out_proj(ctx.transpose(1, 2).flatten(start_dim=-2))
            return x + self.ffn(torch.cat([x, msg], -1))

    class CrossBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.to_qk = nn.Linear(DIM, DIM)
            self.to_v = nn.Linear(DIM, DIM)
            self.to_out = nn.Linear(DIM, DIM)
            self.ffn = make_ffn()

        def forward(self, x0, x1):
            def heads(t):
                return t.unflatten(-1, (HEADS, -1)).transpose(1, 2)

            qk0, qk1 = heads(self.to_qk(x0)), heads(self.to_qk(x1))
            v0, v1 = heads(self.to_v(x0)), heads(self.to_v(x1))
            sim = torch.einsum("bhid,bhjd->bhij", qk0, qk1) / HEAD_DIM**0.5
            m0 = torch.einsum("bhij,bhjd->bhid", F.softmax(sim, -1), v1)
            m1 = torch.einsum(
                "bhji,bhjd->bhid", F.softmax(sim.transpose(-2, -1), -1).transpose(-2, -1), v0
            )

            def out(t):
                return self.to_out(t.transpose(1, 2).flatten(start_dim=-2))

            x0 = x0 + self.ffn(torch.cat([x0, out(m0)], -1))
            x1 = x1 + self.ffn(torch.cat([x1, out(m1)], -1))
            return x0, x1

    class TransformerLayer(nn.Module):
        def __init__(self):
            super().__init__()
            self.self_attn = SelfBlock()
            self.cross_attn = CrossBlock()

    class MatchAssignment(nn.Module):
        def __init__(self):
            super().__init__()
            self.matchability = nn.Linear(DIM, 1)
            self.final_proj = nn.Linear(DIM, DIM)

        def forward(self, x0, x1):
            d0, d1 = self.final_proj(x0), self.final_proj(x1)
            s = DIM**0.25
            sim = torch.einsum("bmd,bnd->bmn", d0 / s, d1 / s)
            z0 = F.logsigmoid(self.matchability(x0))  # (B, M, 1)
            z1 = F.logsigmoid(self.matchability(x1))
            return F.log_softmax(sim, 2) + F.log_softmax(
                sim.transpose(-1, -2), 2
            ).transpose(-1, -2) + z0 + z1.transpose(1, 2)

    class TokenConfidence(nn.Module):
        def __init__(self):
            super().__init__()
            self.token = nn.Sequential(nn.Linear(DIM, 1), nn.Sigmoid())

    class Matcher(nn.Module):
        def __init__(self):
            super().__init__()
            self.input_proj = nn.Linear(DIM, DIM)
            self.posenc = Posenc()
            self.transformers = nn.ModuleList(TransformerLayer() for _ in range(LAYERS))
            self.log_assignment = nn.ModuleList(MatchAssignment() for _ in range(LAYERS))
            # Present in real checkpoints (early-exit head, unused here).
            self.token_confidence = nn.ModuleList(
                TokenConfidence() for _ in range(LAYERS - 1)
            )

        def forward(self, kpts0, desc0, kpts1, desc1):
            x0, x1 = self.input_proj(desc0), self.input_proj(desc1)
            e0, e1 = self.posenc(kpts0), self.posenc(kpts1)
            for layer in self.transformers:
                x0 = layer.self_attn(x0, e0)
                x1 = layer.self_attn(x1, e1)
                x0, x1 = layer.cross_attn(x0, x1)
            return self.log_assignment[-1](x0, x1)

    def filter_matches(scores, th):
        # The reference engine's exact mutual argmax (src/LightGlue.cc:326-363).
        max0, max1 = scores.max(2), scores.max(1)
        m0 = max0.indices
        idx0 = torch.arange(m0.shape[1])[None]
        mutual0 = idx0 == max1.indices.gather(1, m0)
        mscores0 = torch.where(mutual0, max0.values.exp(), torch.zeros(()))
        valid0 = mutual0 & (mscores0 > th)
        return torch.where(valid0, m0, -1), mscores0

    return Matcher().eval(), filter_matches


def test_parity_with_torch_reference_architecture(tmp_path):
    """The full weight contract, end to end: a torch cvg/LightGlue state
    dict (native names/layouts, interleaved Wqkv) saved as .pth, loaded
    through models/weights.load_params, must reproduce the torch forward's
    log-assignment and matches (VERDICT r2 item 1)."""
    torch = pytest.importorskip("torch")

    from superslam_tpu.models.weights import load_params

    torch.manual_seed(0)
    model, filter_matches = _build_torch_lightglue(torch)
    path = str(tmp_path / "lightglue.pth")
    torch.save(model.state_dict(), path)
    params = load_params(path, fallback=lambda: (_ for _ in ()).throw(AssertionError))

    rng = np.random.default_rng(7)
    n0, n1 = 56, 48
    k0 = rng.uniform(-1, 1, (1, n0, 2)).astype(np.float32)
    k1 = rng.uniform(-1, 1, (1, n1, 2)).astype(np.float32)
    d0 = rng.standard_normal((1, n0, 256)).astype(np.float32)
    d1 = rng.standard_normal((1, n1, 256)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)

    with torch.no_grad():
        la_t = model(
            torch.from_numpy(k0), torch.from_numpy(d0.copy()),
            torch.from_numpy(k1), torch.from_numpy(d1.copy()),
        )
        mt0, st0 = filter_matches(la_t, 0.0)

    m0 = jnp.asarray(np.ones((1, n0), bool))
    m1 = jnp.asarray(np.ones((1, n1), bool))
    la_j = lightglue_forward(
        params, jnp.asarray(k0), jnp.asarray(d0), jnp.asarray(k1), jnp.asarray(d1),
        m0, m1, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(la_j), la_t.numpy(), atol=2e-4,
        err_msg="log-assignment diverged from the torch oracle",
    )
    # Match extraction parity at threshold 0 (every mutual pair counts —
    # untrained weights rarely clear 0.1) and at the production 0.1.
    for th in (0.0, 0.1):
        mj, sj = extract_matches(la_j, m0, m1, th)
        with torch.no_grad():
            mt, st = filter_matches(la_t, th)
        np.testing.assert_array_equal(np.asarray(mj)[0], mt.numpy()[0])
        valid = mt.numpy()[0] >= 0
        np.testing.assert_allclose(
            np.asarray(sj)[0][valid], st.numpy()[0][valid], atol=1e-5
        )


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
