"""Mesh sharding, TP rules, the sharded training step, and multi-sequence
batched tracking on the virtual 8-device CPU mesh (the same path the
driver's multi-chip dry-run exercises)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superslam_tpu.models.lightglue import init_lightglue_params
from superslam_tpu.models.superpoint import init_superpoint_params
from superslam_tpu.parallel.batched_tracking import batched_stereo_frontend
from superslam_tpu.parallel.mesh import (
    data_sharding,
    lightglue_param_sharding,
    make_mesh,
    replicate,
)
from superslam_tpu.parallel.training import (
    make_optimizer,
    matching_loss,
    synthetic_matching_batch,
    train_step,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_param_sharding_rules(mesh):
    params = init_lightglue_params(0)
    sh = lightglue_param_sharding(mesh, params)
    # FFN hidden dim sharded on model; matchability replicated.
    s = sh["transformers.0.self_attn.ffn.0.weight"]
    placed = jax.device_put(params["transformers.0.self_attn.ffn.0.weight"], s)
    assert len(placed.sharding.device_set) == 2 * 4 or placed.sharding.is_fully_replicated is False
    s2 = sh["log_assignment.8.matchability.weight"]
    placed2 = jax.device_put(params["log_assignment.8.matchability.weight"], s2)
    assert placed2.sharding.is_fully_replicated


def test_sharded_train_step_runs_and_matches_unsharded(mesh):
    rng = np.random.default_rng(0)
    B, K = 8, 32
    batch_np = synthetic_matching_batch(rng, B, K)

    params = init_lightglue_params(0)
    loss_ref = float(
        matching_loss(
            params,
            *[jnp.asarray(batch_np[k]) for k in
              ("kpts0", "desc0", "kpts1", "desc1", "mask0", "mask1", "gt_indices")],
        )
    )

    before = np.asarray(params["input_proj.weight"], np.float32).copy()
    sh = lightglue_param_sharding(mesh, params)
    params_s = {k: jax.device_put(v, sh[k]) for k, v in params.items()}
    tx = make_optimizer(1e-4)
    opt_state = tx.init(params_s)
    bshard = data_sharding(mesh)
    batch = {k: jax.device_put(jnp.asarray(v), bshard) for k, v in batch_np.items()}
    new_params, new_opt, loss = train_step(params_s, opt_state, batch, tx)
    assert np.isfinite(float(loss))
    # Sharded forward must agree with the unsharded one (bf16 matmuls +
    # cross-shard reduction order allow ~percent-level drift).
    assert float(loss) == pytest.approx(loss_ref, rel=3e-2)
    # Parameters actually moved.
    d = np.abs(np.asarray(new_params["input_proj.weight"], np.float32) - before).max()
    assert d > 0


def test_batched_tracking_sharded(mesh):
    rng = np.random.default_rng(1)
    sp = init_superpoint_params(0)
    lg = init_lightglue_params(0)
    sp = {k: jax.device_put(v, replicate(mesh)) for k, v in sp.items()}
    bshard = data_sharding(mesh)
    S = 4
    left = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (S, 48, 64)).astype(np.float32)), bshard
    )
    right = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (S, 48, 64)).astype(np.float32)), bshard
    )
    out = batched_stereo_frontend(sp, lg, left, right, max_keypoints=64)
    assert out["matches0"].shape == (S, 64)
    assert out["kpts_left"].shape == (S, 64, 2)
    assert np.isfinite(np.asarray(out["mscores0"])).all()


def test_graft_entry_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    assert "matches0" in out
    g.dryrun_multichip(8)
