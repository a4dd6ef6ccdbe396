"""EigenPlaces JAX model: shapes, L2 normalization, preprocessing contract,
and ResNet18 parity against an equivalent torch forward."""

import numpy as np
import pytest

import jax.numpy as jnp

from superslam_tpu.models.eigenplaces import (
    eigenplaces_descriptor,
    init_eigenplaces_params,
    preprocess_image,
)


@pytest.fixture(scope="module")
def params():
    return init_eigenplaces_params(seed=0)


def test_descriptor_shape_and_norm(params):
    img = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    )
    d = np.asarray(eigenplaces_descriptor(params, img))
    assert d.shape == (1, 512)
    assert np.linalg.norm(d[0]) == pytest.approx(1.0, abs=1e-4)


def test_preprocess_gray_and_bgr():
    gray = (np.random.default_rng(1).uniform(0, 255, (100, 160)) + 0.0).astype(np.uint8)
    out = preprocess_image(gray, size=64)
    assert out.shape == (1, 64, 64, 3)
    # Gray replicated: all three channels identical.
    np.testing.assert_allclose(
        out[0, :, :, 0] * 0.229 + 0.485, out[0, :, :, 1] * 0.224 + 0.456, atol=1e-5
    )
    bgr = np.random.default_rng(2).uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    out = preprocess_image(bgr, size=64)
    # Channel flip: red channel of output comes from index 2 of input.
    expected_r = (bgr[..., 2].astype(np.float32) / 255.0 - 0.485) / 0.229
    np.testing.assert_allclose(out[0, :, :, 0], expected_r, atol=1e-4)


def test_resnet_parity_with_torch(params):
    """Backbone features must match a torch resnet18 forward built from the
    same random params (f32)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from superslam_tpu.models.eigenplaces import resnet18_features

    rng = np.random.default_rng(3)
    img = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)

    def tw(name):
        return torch.from_numpy(
            np.transpose(np.asarray(params[f"{name}.weight"], np.float32), (3, 2, 0, 1)).copy()
        )

    def tbn(x, name):
        g = torch.from_numpy(np.asarray(params[f"{name}.weight"], np.float32).copy())
        b = torch.from_numpy(np.asarray(params[f"{name}.bias"], np.float32).copy())
        m = torch.from_numpy(np.asarray(params[f"{name}.running_mean"], np.float32).copy())
        v = torch.from_numpy(np.asarray(params[f"{name}.running_var"], np.float32).copy())
        return F.batch_norm(x, m, v, g, b, training=False, eps=1e-5)

    x = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
    x = F.conv2d(x, tw("backbone.conv1"), stride=2, padding=3)
    x = F.relu(tbn(x, "backbone.bn1"))
    x = F.max_pool2d(x, 3, 2, padding=1)
    for stage, blocks, stride0 in (
        ("layer1", 2, 1),
        ("layer2", 2, 2),
        ("layer3", 2, 2),
        ("layer4", 2, 2),
    ):
        for bidx in range(blocks):
            name = f"backbone.{stage}.{bidx}"
            stride = stride0 if bidx == 0 else 1
            out = F.conv2d(x, tw(f"{name}.conv1"), stride=stride, padding=1)
            out = F.relu(tbn(out, f"{name}.bn1"))
            out = F.conv2d(out, tw(f"{name}.conv2"), stride=1, padding=1)
            out = tbn(out, f"{name}.bn2")
            if f"{name}.downsample.0.weight" in params:
                sc = F.conv2d(x, tw(f"{name}.downsample.0"), stride=stride)
                sc = tbn(sc, f"{name}.downsample.1")
            else:
                sc = x
            x = F.relu(out + sc)
    feat_t = x.detach().numpy().transpose(0, 2, 3, 1)

    feat_j = np.asarray(
        resnet18_features(params, jnp.asarray(img), dtype=jnp.float32), np.float32
    )
    np.testing.assert_allclose(feat_j, feat_t, atol=1e-3)


def test_device_gray_descriptor_matches_host_path():
    """eigenplaces_descriptor_from_device_gray (the pipelined loop path: no
    image re-upload) must reproduce preprocess_image + eigenplaces_descriptor
    on the same frame, including the padding slice."""
    import jax.numpy as jnp

    from superslam_tpu.models.eigenplaces import (
        eigenplaces_descriptor,
        eigenplaces_descriptor_from_device_gray,
        init_eigenplaces_params,
        preprocess_image,
    )

    params = init_eigenplaces_params(0)
    rng = np.random.default_rng(4)
    h, w, size = 120, 160, 64
    gray = rng.integers(0, 255, (h, w)).astype(np.uint8)

    host = np.asarray(
        eigenplaces_descriptor(
            params, jnp.asarray(preprocess_image(gray, size))
        )[0],
        np.float32,
    )
    padded = np.zeros((128, 160), np.uint8)  # pipeline-style bottom padding
    padded[:h] = gray
    dev = np.asarray(
        eigenplaces_descriptor_from_device_gray(
            params, jnp.asarray(padded), true_height=h, true_width=w, size=size
        ),
        np.float32,
    )
    np.testing.assert_allclose(dev, host, atol=2e-3)
    np.testing.assert_allclose(np.linalg.norm(dev), 1.0, atol=1e-4)


def test_train_forward_matches_inference_at_batch_stats():
    """The training forward (batch-stat BN, scripts/train_eigenplaces.py)
    must compute the inference network exactly when the running stats EQUAL
    the batch stats — pins the two forwards to one set of BN semantics, so
    a checkpoint whose running stats were EMA'd from training batches drops
    into the production eigenplaces_descriptor unchanged."""
    import jax.numpy as jnp
    import numpy as np

    from superslam_tpu.models.eigenplaces import (
        eigenplaces_descriptor,
        eigenplaces_descriptor_train,
        init_eigenplaces_params,
    )

    params = init_eigenplaces_params(7)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)

    desc_tr, stats = eigenplaces_descriptor_train(params, x)
    assert set(stats) == {k for k in params if "running_" in k}
    merged = dict(params)
    merged.update(stats)
    desc_inf = eigenplaces_descriptor(merged, x)
    # atol covers bf16 rounding divergence between the jitted inference
    # program and the eagerly-traced training forward (~6e-3 over 18
    # layers); a BN semantics mismatch would be O(0.1) or worse.
    np.testing.assert_allclose(
        np.asarray(desc_tr), np.asarray(desc_inf), atol=1e-2
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(desc_tr), axis=1), 1.0, atol=1e-4
    )
