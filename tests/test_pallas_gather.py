"""Pallas descriptor gather+normalize kernel vs the plain-XLA path.

Runs in interpreter mode on CPU (the same kernel compiles and matches on
the real TPU; see the fused-pipeline benches). The kernel is the TPU
counterpart of the reference's DescriptorGather.cu."""

import numpy as np

import jax.numpy as jnp

from superslam_tpu.ops.pallas.gather import gather_normalize


def test_gather_normalize_matches_reference():
    rng = np.random.default_rng(0)
    grid = rng.standard_normal((12, 16, 256)).astype(np.float32)
    cells = rng.integers(0, 12 * 16, size=64).astype(np.int32)

    out = np.asarray(
        gather_normalize(jnp.asarray(grid), jnp.asarray(cells), interpret=True)
    )
    ref = grid.reshape(-1, 256)[cells]
    ref = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)


def test_gather_repeated_and_boundary_cells():
    rng = np.random.default_rng(1)
    grid = rng.standard_normal((4, 4, 256)).astype(np.float32)
    cells = np.array([0, 0, 15, 15, 7, 0, 15, 7], np.int32)
    out = np.asarray(
        gather_normalize(jnp.asarray(grid), jnp.asarray(cells), interpret=True)
    )
    np.testing.assert_allclose(out[0], out[1], atol=0)
    np.testing.assert_allclose(out[2], out[3], atol=0)
