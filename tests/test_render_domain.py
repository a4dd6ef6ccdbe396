"""Render-domain training supervision: exact sprite-corner ground truth.

The sprite world (eval/synthetic_sequence.py) supervises SuperPoint on the
evaluation render domain the way the reference's published checkpoints were
supervised on real images (homographic adaptation, SURVEY §2 #25) — except
with analytically exact corner labels: every sprite texture records its
corner locations and render_view projects them through the per-sprite
texture->image homography with occlusion-aware visibility.
"""

import numpy as np
import pytest

from superslam_tpu.eval.synthetic_sequence import (
    circuit_trajectory,
    make_room_world,
    random_interior_pose,
    render_view,
)
from superslam_tpu.geometry import StereoCalib
from superslam_tpu.train.render_domain import RenderDomainSource
from superslam_tpu.train.synthetic_shapes import (
    CELL,
    corners_to_labels,
    pair_from_image,
    warp_points,
)


@pytest.fixture(scope="module")
def world():
    return make_room_world(np.random.default_rng(3), n_sprites=80)


@pytest.fixture(scope="module")
def calib():
    return StereoCalib(fx=160.0, fy=160.0, cx=80.0, cy=60.0, baseline=0.3)


def test_corners_are_visible_and_in_bounds(world, calib):
    pose = circuit_trajectory(10)[2]
    img, ids, corners = render_view(
        world, pose, calib, 120, 160, return_ids=True, return_corners=True
    )
    assert corners.shape[1] == 2 and len(corners) > 20
    assert (corners[:, 0] >= 0).all() and (corners[:, 0] < 160).all()
    assert (corners[:, 1] >= 0).all() and (corners[:, 1] < 120).all()
    # Every reported corner's 3x3 neighborhood touches a sprite pixel.
    xi = np.round(corners[:, 0]).astype(int)
    yi = np.round(corners[:, 1]).astype(int)
    near_sprite = np.zeros(len(corners), bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            near_sprite |= (
                ids[np.clip(yi + dy, 0, 119), np.clip(xi + dx, 0, 159)] >= 0
            )
    assert near_sprite.all()


def test_corners_sit_on_image_gradient(world, calib):
    """Projected corner GT must coincide with actual image structure:
    mean 3x3-max gradient at corners far exceeds that at random pixels."""
    import cv2

    rng = np.random.default_rng(0)
    pose = random_interior_pose(rng)
    img, corners = render_view(
        world, pose, calib, 120, 160, return_corners=True
    )
    if len(corners) < 10:
        pytest.skip("view too empty")
    g = np.hypot(
        cv2.Sobel(img, cv2.CV_32F, 1, 0), cv2.Sobel(img, cv2.CV_32F, 0, 1)
    )

    def max3x3(xs, ys):
        vals = [
            g[np.clip(ys + dy, 0, 119), np.clip(xs + dx, 0, 159)]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
        return np.stack(vals).max(0)

    at_c = max3x3(
        np.round(corners[:, 0]).astype(int), np.round(corners[:, 1]).astype(int)
    )
    at_r = max3x3(
        rng.integers(1, 159, 400), rng.integers(1, 119, 400)
    )
    assert at_c.mean() > 2.0 * at_r.mean()


def test_roi_rasterization_matches_ids(world, calib):
    """The bounding-box-cropped warp must paint exactly the pixels the ids
    map claims: sprite pixels differ from the pure-background render."""
    pose = circuit_trajectory(10)[0]
    img, ids = render_view(world, pose, calib, 120, 160, return_ids=True)
    empty = render_view(
        type(world)(
            np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0)
        ),
        pose,
        calib,
        120,
        160,
    )
    delta = np.abs(img - empty)
    # Background pixels untouched by any sprite must match exactly.
    assert np.max(delta[ids < 0]) == 0.0
    assert (ids >= 0).mean() > 0.02  # scene is not empty


def test_pair_from_image_targets(world, calib):
    rng = np.random.default_rng(1)
    pose = random_interior_pose(rng)
    img, corners = render_view(
        world, pose, calib, 120, 160, rng, return_corners=True
    )
    p = pair_from_image(rng, img, corners)
    assert p["img0"].shape == p["img1"].shape == (120, 160)
    gh, gw = 120 // CELL, 160 // CELL
    assert p["labels0"].shape == (gh, gw)
    assert p["corr"].shape == (gh * gw, gh * gw)
    # Warped labels are consistent with warping the corner set directly.
    np.testing.assert_array_equal(
        p["labels1"], corners_to_labels(warp_points(p["H"], corners), 120, 160)
    )
    # labels0 cells with corners are non-dustbin.
    assert (p["labels0"] != 64).sum() > 5


def test_render_domain_train_step_runs():
    import jax.numpy as jnp

    from superslam_tpu.models.superpoint import init_superpoint_params
    from superslam_tpu.train import make_sp_optimizer, sp_train_step

    rng = np.random.default_rng(2)
    src = RenderDomainSource(rng, 120, 160, fx=160.0, n_worlds=1, n_sprites=60)
    pairs = [src.compact_pair(rng) for _ in range(2)]
    batch = {k: jnp.asarray(np.stack([s[k] for s in pairs])) for k in pairs[0]}
    params = {
        k: jnp.asarray(v, jnp.float32)
        for k, v in init_superpoint_params().items()
    }
    tx = make_sp_optimizer(1e-3)
    opt = tx.init(params)
    params, opt, loss, aux = sp_train_step(params, opt, batch, tx)
    assert np.isfinite(float(loss))


def test_two_view_targets_zero_motion_exact():
    """With identical poses the sprite-plane reprojection must return each
    cell center exactly (the lift/reproject round-trip is analytic)."""
    rng = np.random.default_rng(5)
    src = RenderDomainSource(rng, 120, 160, fx=160.0, n_worlds=1, n_sprites=80)
    p = src.two_view_compact(rng, rot_sigma=0.0, trans_sigma=0.0)
    n = (120 // CELL) * (160 // CELL)
    ys = np.arange(120 // CELL) * CELL + CELL / 2 - 0.5
    xs = np.arange(160 // CELL) * CELL + CELL / 2 - 0.5
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    centers = np.stack([gx.ravel(), gy.ravel()], 1)
    valid = p["corr_pts"][:, 0] > -1e5
    assert valid.sum() > 10
    np.testing.assert_allclose(p["corr_pts"][valid], centers[valid], atol=1e-3)


def test_two_view_loss_has_hard_term():
    import jax.numpy as jnp

    from superslam_tpu.models.superpoint import init_superpoint_params
    from superslam_tpu.train.superpoint_train import sp_loss

    rng = np.random.default_rng(6)
    src = RenderDomainSource(rng, 120, 160, fx=160.0, n_worlds=1, n_sprites=80)
    pairs = [src.two_view_compact(rng) for _ in range(2)]
    batch = {k: jnp.asarray(np.stack([s[k] for s in pairs])) for k in pairs[0]}
    params = {
        k: jnp.asarray(v, jnp.float32)
        for k, v in init_superpoint_params().items()
    }
    loss, aux = sp_loss(params, batch)
    assert np.isfinite(float(loss))
    assert float(aux["hard"]) > 0.0  # untrained: hardest negative wins


def test_rendered_depth_is_exact_plane_intersection(world, calib):
    """Every depth pixel must backproject onto its owning sprite's plane
    (the depth map is analytic ray/plane intersection, not a z-buffer
    approximation), and background pixels must be 0."""
    pose = circuit_trajectory(8)[2]
    img, ids, depth = render_view(
        world, pose, calib, 120, 160, return_ids=True, return_depth=True
    )
    assert depth.shape == (120, 160)
    on = ids >= 0
    assert (depth[~on] == 0.0).all()
    assert on.sum() > 500  # the room is sprite-dense
    ys, xs = np.nonzero(on)
    sel = np.random.default_rng(0).choice(len(ys), 400, replace=False)
    ys, xs = ys[sel], xs[sel]
    z = depth[ys, xs].astype(np.float64)
    assert (z > 0.3).all()
    pc = np.stack(
        [(xs - calib.cx) / calib.fx * z, (ys - calib.cy) / calib.fy * z, z], 1
    )
    Xw = pose.transform_from(pc)
    sid = ids[ys, xs]
    n = np.cross(world.ax_u[sid], world.ax_v[sid])
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    plane_dist = np.abs(np.sum((Xw - world.centers[sid]) * n, axis=1))
    # Rasterization assigns edge pixels to the nearest sprite; the plane
    # distance of interior pixels is limited only by float math.
    assert np.quantile(plane_dist, 0.9) < 2e-3, np.quantile(plane_dist, 0.9)


def test_write_tum_sequence_roundtrip(tmp_path, world, calib):
    """The TUM writer must produce files examples/tum_rgbd.py associates
    and whose uint16 depth decodes back to the rendered Z."""
    import cv2

    from superslam_tpu.eval.synthetic_sequence import write_tum_sequence
    from superslam_tpu.io.trajectory import load_trajectory_tum

    poses = circuit_trajectory(3)
    write_tum_sequence(str(tmp_path), world, poses, calib, 48, 64, seed=5)
    for name in ("rgb.txt", "depth.txt", "groundtruth.txt"):
        assert (tmp_path / name).exists()
    rows = [
        l.split() for l in (tmp_path / "depth.txt").read_text().splitlines()
        if not l.startswith("#")
    ]
    assert len(rows) == 3
    d16 = cv2.imread(str(tmp_path / rows[1][1]), cv2.IMREAD_UNCHANGED)
    assert d16.dtype == np.uint16
    img, depth = render_view(
        world, poses[1], calib, 48, 64, np.random.default_rng(0),
        return_depth=True,
    )
    got = d16.astype(np.float64) / 5000.0
    on = depth > 0
    np.testing.assert_allclose(got[on], depth[on], atol=1.5 / 5000.0)
    # Ground truth parses back to the input poses.
    ts, gt = load_trajectory_tum(str(tmp_path / "groundtruth.txt"))
    assert len(gt) == 3
    for p, q in zip(poses, gt):
        np.testing.assert_allclose(q.t, p.t, atol=1e-6)
        np.testing.assert_allclose(q.R, p.R, atol=1e-6)
