"""SuperPoint JAX model: shape contracts, NMS/top-K selection semantics, and
numeric parity against an equivalent torch forward (the same architecture the
reference exports, utils/convert_superpoint_to_onnx.py:26-124)."""

import numpy as np
import pytest

import jax.numpy as jnp

from superslam_tpu.models.superpoint import (
    init_superpoint_params,
    select_keypoints,
    superpoint_dense,
    superpoint_extract,
)


@pytest.fixture(scope="module")
def params():
    return init_superpoint_params(seed=0)


def test_dense_shapes(params):
    img = jnp.asarray(np.random.default_rng(9).uniform(0, 1, (2, 64, 96)))
    scores, desc = superpoint_dense(params, img)
    assert scores.shape == (2, 64, 96)
    assert desc.shape == (2, 8, 12, 256)
    # Descriptor grid rows ~unit norm.
    n = np.linalg.norm(np.asarray(desc, np.float32), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=2e-2)


def test_extract_static_shapes_and_mask(params):
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 96)))
    kpts, scores, valid, desc = superpoint_extract(
        params, img, max_keypoints=128, keypoint_threshold=0.005
    )
    assert kpts.shape == (1, 128, 2)
    assert scores.shape == (1, 128)
    assert valid.shape == (1, 128)
    assert desc.shape == (1, 128, 256)
    # Scores sorted descending (top_k contract).
    s = np.asarray(scores[0])
    assert (np.diff(s) <= 1e-6).all()
    # Valid rows have unit descriptors; invalid rows are zeroed.
    d = np.asarray(desc[0])
    v = np.asarray(valid[0])
    if v.any():
        np.testing.assert_allclose(np.linalg.norm(d[v], axis=-1), 1.0, atol=1e-3)
    if (~v).any():
        np.testing.assert_allclose(d[~v], 0.0)


def test_select_keypoints_semantics():
    """Hand-built score map: selection must return the peaks, respect borders
    and threshold, and gather the right descriptor cells."""
    h, w, k = 32, 32, 8
    scores = np.zeros((1, h, w), np.float32)
    scores[0, 16, 16] = 0.9  # cell (2, 2)
    scores[0, 8, 24] = 0.5  # cell (1, 3)
    scores[0, 2, 2] = 0.8  # inside border=4 -> suppressed
    desc = np.zeros((1, h // 8, w // 8, 4), np.float32)
    desc[0, 2, 2] = [1, 0, 0, 0]
    desc[0, 1, 3] = [0, 1, 0, 0]
    kpts, s, valid, d = select_keypoints(
        jnp.asarray(scores), jnp.asarray(desc), k, 0.1, 4
    )
    kpts, s, valid, d = map(np.asarray, (kpts, s, valid, d))
    assert valid[0].sum() == 2
    assert tuple(kpts[0, 0]) == (16.0, 16.0) and s[0, 0] == pytest.approx(0.9)
    assert tuple(kpts[0, 1]) == (24.0, 8.0) and s[0, 1] == pytest.approx(0.5)
    np.testing.assert_allclose(d[0, 0], [1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(d[0, 1], [0, 1, 0, 0], atol=1e-6)


def test_nms_suppresses_neighbors(params):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64)))
    scores, _ = superpoint_dense(params, img, nms_radius=4)
    s = np.asarray(scores[0])
    ys, xs = np.nonzero(s)
    # Any two surviving peaks are >4 px apart OR have equal score (ties).
    for i in range(min(len(ys), 20)):
        d = np.maximum(np.abs(ys - ys[i]), np.abs(xs - xs[i]))
        close = (d <= 4) & (d > 0)
        assert (s[ys[close], xs[close]] == s[ys[i], xs[i]]).all()


def test_parity_with_torch_reference_architecture(params):
    """The JAX forward must match a torch NCHW forward of the same
    architecture on the same random weights (f32, no NMS)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (1, 48, 64)).astype(np.float32)

    # Torch forward using our params (HWIO -> OIHW).
    def tconv(x, name, pad):
        w = torch.from_numpy(
            np.transpose(np.asarray(params[f"{name}.weight"], np.float32), (3, 2, 0, 1))
        )
        b = torch.from_numpy(np.asarray(params[f"{name}.bias"], np.float32))
        return F.conv2d(x, w, b, padding=pad)

    x = torch.from_numpy(img[None])  # NCHW
    for blk in ("1", "2", "3", "4"):
        x = F.relu(tconv(x, f"conv{blk}a", 1))
        x = F.relu(tconv(x, f"conv{blk}b", 1))
        if blk != "4":
            x = F.max_pool2d(x, 2, 2)
    scores_t = tconv(F.relu(tconv(x, "convPa", 1)), "convPb", 0)
    scores_t = torch.softmax(scores_t, 1)[:, :-1]
    b, _, hh, ww = scores_t.shape
    scores_t = scores_t.permute(0, 2, 3, 1).reshape(b, hh, ww, 8, 8)
    scores_t = scores_t.permute(0, 1, 3, 2, 4).reshape(b, hh * 8, ww * 8)
    desc_t = tconv(F.relu(tconv(x, "convDa", 1)), "convDb", 0)
    desc_t = F.normalize(desc_t, p=2, dim=1)

    scores_j, desc_j = superpoint_dense(
        params, jnp.asarray(img), nms_radius=0, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(scores_j), scores_t.detach().numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(desc_j, np.float32),
        desc_t.detach().numpy().transpose(0, 2, 3, 1),
        atol=1e-5,
    )


def test_subpixel_parabolic_refinement():
    """select_keypoints with raw_scores must recover a sub-pixel peak placed
    as an additive quadratic (exact for 1-D parabolic fits), clamp offsets to
    +-0.5 px, and leave invalid rows untouched."""
    H, W, D = 32, 32, 8
    # Additive separable quadratic with its peak at (10.3, 11.75).
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    x_star, y_star = 10.3, 11.75
    q = 1.0 - 0.02 * (xs - x_star) ** 2 - 0.03 * (ys - y_star) ** 2
    raw = np.maximum(q, 0.0).astype(np.float32)

    # NMS'd map: keep only the integer argmax, zero the rest (mirrors
    # superpoint_dense's suppression).
    nms = np.zeros_like(raw)
    iy, ix = np.unravel_index(np.argmax(raw), raw.shape)
    nms[iy, ix] = raw[iy, ix]

    grid = np.random.default_rng(0).normal(size=(1, H // 8, W // 8, D))
    grid /= np.linalg.norm(grid, axis=-1, keepdims=True)

    kpts, scores, valid, desc = select_keypoints(
        jnp.asarray(nms[None]),
        jnp.asarray(grid, jnp.float32),
        max_keypoints=4,
        keypoint_threshold=0.01,
        remove_borders=2,
        raw_scores=jnp.asarray(raw[None]),
    )
    k = np.asarray(kpts[0])
    v = np.asarray(valid[0])
    assert v[0] and not v[1:].any()
    # Parabolic fit is exact on a quadratic.
    np.testing.assert_allclose(k[0, 0], x_star, atol=1e-3)
    np.testing.assert_allclose(k[0, 1], y_star, atol=1e-3)
    # Invalid rows keep integer coords (offset zeroed by the valid mask).
    assert (k[1:] == np.round(k[1:])).all()


def test_subpixel_offsets_clamped():
    """A maximally skewed neighborhood must never move a keypoint by more
    than half a pixel."""
    H, W, D = 16, 16, 8
    raw = np.zeros((H, W), np.float32)
    # Peak at (8, 8) with an extreme one-sided neighbor: the unclamped
    # parabola vertex would fall outside +-0.5.
    raw[8, 8] = 1.0
    raw[8, 7] = 0.999999
    raw[8, 9] = 0.0
    nms = np.zeros_like(raw)
    nms[8, 8] = 1.0
    grid = np.ones((1, 2, 2, D), np.float32) / np.sqrt(D)
    kpts, _, valid, _ = select_keypoints(
        jnp.asarray(nms[None]),
        jnp.asarray(grid),
        max_keypoints=2,
        keypoint_threshold=0.5,
        remove_borders=2,
        raw_scores=jnp.asarray(raw[None]),
    )
    assert np.asarray(valid[0])[0]
    assert abs(float(kpts[0, 0, 0]) - 8.0) <= 0.5 + 1e-6
    assert abs(float(kpts[0, 0, 1]) - 8.0) <= 1e-6  # symmetric in y


def test_packed_readback_subpixel_roundtrip():
    """Fractional keypoints and disparities must survive the int16 fixed-
    point packed readback to within half a quantum (1/32 px)."""
    from superslam_tpu.frontend.features import PaddedFeatures
    from superslam_tpu.frontend.fused import decode_packed
    from superslam_tpu.ops.frontend_step import PACK_SCALE, _pack

    rng = np.random.default_rng(3)
    K = 16
    kl = rng.uniform(4, 120, (1, K, 2)).astype(np.float32)
    vl = np.zeros((1, K), bool)
    vl[0, :10] = True
    disparity = rng.uniform(1, 40, (1, K)).astype(np.float32)
    stereo_ok = vl & (np.arange(K)[None] % 2 == 0)
    track_m = np.where(vl, np.arange(K)[None] % 5, -1).astype(np.int32)

    packed = np.asarray(
        _pack(
            jnp.asarray(kl), jnp.asarray(vl), jnp.asarray(disparity),
            jnp.asarray(stereo_ok), jnp.asarray(track_m),
        )
    )
    feats = PaddedFeatures(kpts=None, desc=None, n=0, width=128, height=128)
    frame, matches = decode_packed(packed, 0.0, feats)
    assert len(frame) == 10
    np.testing.assert_allclose(
        frame.keypoints_left, kl[0, :10], atol=0.5 / PACK_SCALE + 1e-6
    )
    d = frame.has_depth
    np.testing.assert_array_equal(d, stereo_ok[0, :10])
    got_disp = frame.stereo[d, 0] - frame.stereo[d, 1]
    np.testing.assert_allclose(
        got_disp, disparity[0, :10][d], atol=1.0 / PACK_SCALE + 1e-6
    )
