"""Render-domain SuperPoint supervision from the sprite-world renderer.

The shapes-pretrained detector (train/synthetic_shapes.py) learns corners
but its descriptors collapse on the sprite-world evaluation renders (the
appearance statistics differ: dense small high-frequency patterns vs large
sparse primitives — measured within-image descriptor cosine 0.94 on renders
vs 0.67 on shapes). This module closes the domain gap the way the original
SuperPoint closed synthetic->real (homographic adaptation, reference model
export pipeline SURVEY §2 #25) — except better: the sprite world knows its
EXACT corner locations (eval/synthetic_sequence._sprite_texture records
them; render_view projects them through each sprite's analytic
texture->image homography with occlusion-aware visibility), so the
fine-tune uses exact supervision rather than detector-aggregated
pseudo-labels.

Training images are rendered at the SAME focal length as the evaluation
sequences (apparent feature scale is fx/z, independent of image size), so
the fine-tuned features see the test-time appearance scale.
"""

from __future__ import annotations

import numpy as np

from ..eval.synthetic_sequence import (
    SpriteWorld,
    make_room_world,
    random_interior_pose,
    render_view,
)
from ..geometry import Pose3, StereoCalib
from .synthetic_shapes import CELL, compact_from_pair, corners_to_labels, pair_from_image


def harvest_matching_pair(
    sp_params,
    world: SpriteWorld,
    pose0: Pose3,
    pose1: Pose3,
    calib: StereoCalib,
    h: int,
    w: int,
    cap: int,
    rng: np.random.Generator,
    keypoint_threshold: float = 0.012,
):
    """One matcher-training sample: SuperPoint features of two rendered
    views + the ground-truth assignment (sprite-plane lift -> reprojection
    -> sprite-id agreement; one-to-one by nearest). Returns None when too
    few covisible keypoints survive. Keypoints are normalized exactly as
    the production matcher wrapper does (frontend/matcher.py)."""
    import jax.numpy as jnp

    from ..models.superpoint import superpoint_extract

    img0, ids0 = render_view(world, pose0, calib, h, w, rng, return_ids=True)
    img1, ids1 = render_view(world, pose1, calib, h, w, rng, return_ids=True)
    kpts, scores, valid, desc = superpoint_extract(
        sp_params,
        jnp.asarray(np.stack([img0, img1])),
        max_keypoints=cap,
        keypoint_threshold=keypoint_threshold,
    )
    kpts = np.asarray(kpts)
    valid = np.asarray(valid)
    desc = np.asarray(desc)
    n0, n1 = int(valid[0].sum()), int(valid[1].sum())
    if n0 < 16 or n1 < 16:
        return None

    def sprite_id_at(ids, pts):
        xi = np.clip(np.round(pts[:, 0]).astype(int), 0, w - 1)
        yi = np.clip(np.round(pts[:, 1]).astype(int), 0, h - 1)
        return ids[yi, xi]

    K = np.array(
        [[calib.fx, 0, calib.cx], [0, calib.fy, calib.cy], [0, 0, 1]]
    )
    Kinv = np.linalg.inv(K)
    p0 = kpts[0][:n0]
    s0 = sprite_id_at(ids0, p0)
    rays = (Kinv @ np.concatenate([p0, np.ones((n0, 1))], 1).T).T
    d_w = rays @ pose0.R.T
    o = pose0.t
    gt = np.full(cap, -1, np.int32)
    p1 = kpts[1][:n1]
    s1 = sprite_id_at(ids1, p1)
    nrm = np.cross(world.ax_u, world.ax_v)
    R1, t1 = pose1.R, pose1.t
    taken = np.full(n1, False)
    for i in range(n0):
        sp = s0[i]
        if sp < 0:
            continue
        n_s = nrm[sp]
        denom = d_w[i] @ n_s
        if abs(denom) < 1e-9:
            continue
        lam = ((world.centers[sp] - o) @ n_s) / denom
        if lam <= 0:
            continue
        X = o + lam * d_w[i]
        pc = R1.T @ (X - t1)
        if pc[2] < 0.2:
            continue
        u = calib.fx * pc[0] / pc[2] + calib.cx
        v = calib.fy * pc[1] / pc[2] + calib.cy
        d = np.hypot(p1[:, 0] - u, p1[:, 1] - v)
        cand = np.flatnonzero((d < 3.0) & (s1 == sp) & ~taken)
        if cand.size:
            j = cand[np.argmin(d[cand])]
            gt[i] = j
            taken[j] = True

    if (gt >= 0).sum() < 8:
        return None
    center = np.array([w / 2.0, h / 2.0], np.float32)
    scale = np.float32(max(w, h) / 2.0)
    kn = (kpts - center) / scale
    mask = np.stack([np.arange(cap) < n0, np.arange(cap) < n1])
    return {
        "kpts0": kn[0].astype(np.float32),
        "desc0": desc[0].astype(np.float32),
        "kpts1": kn[1].astype(np.float32),
        "desc1": desc[1].astype(np.float32),
        "mask0": mask[0],
        "mask1": mask[1],
        "gt_indices": gt,
    }


def match_prf(matches: np.ndarray, gt: np.ndarray) -> tuple[float, float]:
    """Precision/recall of predicted (i, j) pairs vs a GT assignment."""
    pred = {(int(i), int(j)) for i, j in matches}
    truth = {(int(i), int(j)) for i, j in enumerate(gt) if j >= 0}
    if not pred or not truth:
        return 0.0, 0.0
    tp = len(pred & truth)
    return tp / len(pred), tp / len(truth)


def mutual_nn_prf(sample: dict[str, np.ndarray]) -> tuple[float, float]:
    """Descriptor-only mutual-NN precision/recall on a harvested sample —
    the gate for the analytic passthrough matcher."""
    n0 = int(sample["mask0"].sum())
    n1 = int(sample["mask1"].sum())
    sim = sample["desc0"][:n0] @ sample["desc1"][:n1].T
    a01 = sim.argmax(1)
    a10 = sim.argmax(0)
    mut = np.flatnonzero(a10[a01] == np.arange(n0))
    return match_prf(np.stack([mut, a01[mut]], 1), sample["gt_indices"])


class RenderDomainSource:
    """A bank of sprite worlds + the evaluation camera's intrinsics;
    draws homographic training pairs from random interior viewpoints."""

    def __init__(
        self,
        rng: np.random.Generator,
        h: int,
        w: int,
        fx: float = 320.0,
        n_worlds: int = 4,
        n_sprites: int = 240,
    ) -> None:
        self.h, self.w = h, w
        self.calib = StereoCalib(
            fx=fx, fy=fx, cx=w / 2.0, cy=h / 2.0, baseline=0.3
        )
        self.worlds: list[SpriteWorld] = [
            make_room_world(rng, n_sprites=n_sprites) for _ in range(n_worlds)
        ]

    def labeled_image(
        self, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray]:
        world = self.worlds[int(rng.integers(len(self.worlds)))]
        pose = random_interior_pose(rng)
        img, corners = render_view(
            world, pose, self.calib, self.h, self.w, rng, return_corners=True
        )
        return img, corners

    def training_pair(self, rng: np.random.Generator) -> dict[str, np.ndarray]:
        img, corners = self.labeled_image(rng)
        return pair_from_image(rng, img, corners)

    def compact_pair(self, rng: np.random.Generator) -> dict[str, np.ndarray]:
        return compact_from_pair(self.training_pair(rng))

    def matching_eval(
        self,
        sp_params,
        rng: np.random.Generator,
        n_pairs: int = 5,
        cap: int = 256,
    ) -> dict[str, float]:
        """Mutual-NN precision/recall across re-rendered VO-motion pairs —
        the quantity the tracking front-end actually depends on."""
        ps, rs = [], []
        tries = 0
        while len(ps) < n_pairs and tries < 3 * n_pairs:
            tries += 1
            pose0 = random_interior_pose(rng, yaw_jitter=0.2)
            xi = np.concatenate(
                [rng.normal(0, 0.02, 3), rng.normal(0, 0.08, 3)]
            )
            s = harvest_matching_pair(
                sp_params,
                self.worlds[int(rng.integers(len(self.worlds)))],
                pose0,
                pose0 * Pose3.expmap(xi),
                self.calib,
                self.h,
                self.w,
                cap,
                rng,
            )
            if s is not None:
                p, r = mutual_nn_prf(s)
                ps.append(p)
                rs.append(r)
        return {
            "nn_precision": float(np.mean(ps)) if ps else 0.0,
            "nn_recall": float(np.mean(rs)) if rs else 0.0,
            "n_pairs": len(ps),
        }

    def two_view_compact(
        self,
        rng: np.random.Generator,
        rot_sigma: float = 0.02,
        trans_sigma: float = 0.08,
    ) -> dict[str, np.ndarray]:
        """TRUE two-view sample: the same world rendered from two VO-like
        poses, with exact cross-view cell correspondence.

        Homographic warps of one render miss what tracking actually faces —
        independent rasterization, occlusion changes, and per-view noise
        between frames (measured: descriptors fine across a warp, mutual-NN
        precision 0.15 across a re-render). Each view0 cell center is lifted
        onto its sprite's plane, reprojected into view1, and kept only when
        the SAME sprite still owns the target pixel (occlusion-aware).
        Wire format: uint8 images, int32 labels, per-cell target points
        ``corr_pts`` (n, 2) f32 (far-away sentinel = no correspondence) —
        the corr matrix is built on device (pair_targets_from_points)."""
        h, w = self.h, self.w
        world = self.worlds[int(rng.integers(len(self.worlds)))]
        pose0 = random_interior_pose(rng)
        xi = np.concatenate(
            [rng.normal(0, rot_sigma, 3), rng.normal(0, trans_sigma, 3)]
        )
        pose1 = pose0 * Pose3.expmap(xi)
        img0, ids0, c0 = render_view(
            world, pose0, self.calib, h, w, rng,
            return_ids=True, return_corners=True,
        )
        img1, ids1, c1 = render_view(
            world, pose1, self.calib, h, w, rng,
            return_ids=True, return_corners=True,
        )

        gh, gw = h // CELL, w // CELL
        ys = np.arange(gh) * CELL + CELL / 2 - 0.5
        xs = np.arange(gw) * CELL + CELL / 2 - 0.5
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        centers = np.stack([gx.ravel(), gy.ravel()], 1)  # (n, 2)
        n = gh * gw
        sid = ids0[
            np.round(centers[:, 1]).astype(int), np.round(centers[:, 0]).astype(int)
        ]

        K = np.array(
            [
                [self.calib.fx, 0, self.calib.cx],
                [0, self.calib.fy, self.calib.cy],
                [0, 0, 1],
            ]
        )
        rays = (
            np.linalg.inv(K)
            @ np.concatenate([centers, np.ones((n, 1))], 1).T
        ).T
        d_w = rays @ pose0.R.T
        nrm = np.cross(world.ax_u, world.ax_v)  # (S, 3) plane normals
        corr_pts = np.full((n, 2), -1e6, np.float32)
        on = np.flatnonzero(sid >= 0)
        if on.size:
            s = sid[on]
            n_s = nrm[s]  # (m, 3)
            denom = np.sum(d_w[on] * n_s, axis=1)
            ok = np.abs(denom) > 1e-9
            lam = np.where(
                ok, np.sum((world.centers[s] - pose0.t) * n_s, 1) / np.where(ok, denom, 1.0), -1.0
            )
            X = pose0.t[None] + lam[:, None] * d_w[on]
            pc = (X - pose1.t) @ pose1.R  # R1^T (X - t1) row-wise
            ok &= (lam > 0) & (pc[:, 2] > 0.2)
            u = self.calib.fx * pc[:, 0] / np.where(ok, pc[:, 2], 1.0) + self.calib.cx
            v = self.calib.fy * pc[:, 1] / np.where(ok, pc[:, 2], 1.0) + self.calib.cy
            ui = np.clip(np.round(u).astype(int), 0, w - 1)
            vi = np.clip(np.round(v).astype(int), 0, h - 1)
            inb = (u >= 0) & (u < w) & (v >= 0) & (v < h)
            # Occlusion: the same sprite must own a pixel in the 3x3 around
            # the reprojection.
            vis = np.zeros(on.size, bool)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    vis |= (
                        ids1[
                            np.clip(vi + dy, 0, h - 1), np.clip(ui + dx, 0, w - 1)
                        ]
                        == s
                    )
            keep = ok & inb & vis
            corr_pts[on[keep]] = np.stack([u[keep], v[keep]], 1).astype(np.float32)

        return {
            "img0": np.round(img0 * 255).astype(np.uint8),
            "img1": np.round(img1 * 255).astype(np.uint8),
            "labels0": corners_to_labels(c0, h, w),
            "labels1": corners_to_labels(c1, h, w),
            "corr_pts": corr_pts,
        }
