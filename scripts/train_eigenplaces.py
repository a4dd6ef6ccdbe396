#!/usr/bin/env python
"""Train EigenPlaces (ResNet18+GeM) for loop-closure retrieval on the
rendered sprite world.

Third stage of the zero-egress bootstrap (after scripts/train_superpoint.py
and scripts/train_lightglue_synth.py): the reference downloads a published
EigenPlaces checkpoint (/root/reference/scripts/models/
download_weights_eigenplaces.py) — here the place-recognition embedding is
trained from scratch on the exact world the accuracy suite renders, closing
the last random-weights component in the shipped stack.

Objective: symmetric InfoNCE over (place, view) renders. A "place" is an
anchor pose on the circuit annulus (the loop leg's own viewpoint
distribution, eval/synthetic_sequence.random_interior_pose); its views are
small pose perturbations. In-batch negatives are masked to places whose
circuit angle differs by > --theta-margin: nearby angles see the same wall
and ARE the same place for loop-closure purposes — pushing them apart would
train against the downstream task.

Batch norm: training uses batch statistics (models.eigenplaces.
eigenplaces_descriptor_train) and EMAs them into the running stats the
inference forward (_bn) consumes, so the saved checkpoint drops into the
production loader unchanged.

The dataset lives ON DEVICE as one (N, size, size) uint8 array (~100 MB,
uploaded once); each step gathers its batch and ImageNet-normalizes
in-program — no per-step H2D beyond 64 indices.

Usage:
  python scripts/train_eigenplaces.py --steps 1500 \
      --out weights/eigenplaces_resnet18_512.safetensors
(the output name is what slam.py's loop path auto-loads from model_dir)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_place_views(world, anchors, n_views, calib, h, w, size, rng, jitter):
    """(P, V, size, size) uint8: aspect-squashed resizes of (h, w) renders —
    the same geometry EigenPlacesRecognizer.compute_global_descriptor feeds
    the network at inference (preprocess_image squashes the camera frame)."""
    import cv2

    from superslam_tpu.eval.synthetic_sequence import render_view
    from superslam_tpu.geometry import Pose3

    out = np.empty((len(anchors), n_views, size, size), np.uint8)
    for i, anchor in enumerate(anchors):
        for v in range(n_views):
            if v == 0:
                pose = anchor  # view 0 is the anchor itself (gallery view)
            else:
                xi = np.concatenate(
                    [rng.normal(0, jitter[0], 3), rng.normal(0, jitter[1], 3)]
                )
                pose = anchor * Pose3.expmap(xi)
            img = render_view(world, pose, calib, h, w, rng)
            img8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            out[i, v] = cv2.resize(img8, (size, size), cv2.INTER_LINEAR)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--places", type=int, default=96)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--eval-places", type=int, default=32)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch-places", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--fx", type=float, default=320.0)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--temperature", type=float, default=0.07)
    ap.add_argument(
        "--theta-margin", type=float, default=0.30,
        help="circuit-angle separation (rad) below which two places are NOT "
        "used as negatives of each other (they see the same scene)",
    )
    ap.add_argument("--rot-jitter", type=float, default=0.08)
    ap.add_argument("--trans-jitter", type=float, default=0.30)
    ap.add_argument("--bn-momentum", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="weights/eigenplaces_resnet18_512.safetensors")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from superslam_tpu.eval.synthetic_sequence import (
        make_room_world,
        random_interior_pose,
    )
    from superslam_tpu.geometry import StereoCalib
    from superslam_tpu.models.eigenplaces import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        eigenplaces_descriptor,
        eigenplaces_descriptor_train,
        init_eigenplaces_params,
    )
    from superslam_tpu.models.weights import save_params_torch_layout
    from superslam_tpu.slam import _enable_compilation_cache

    _enable_compilation_cache()
    rng = np.random.default_rng(args.seed)
    h, w, size = args.height, args.width, args.size
    calib = StereoCalib(fx=args.fx, fy=args.fx, cx=w / 2.0, cy=h / 2.0, baseline=0.3)

    # --- render train places on the suite's world, eval places on a FRESH
    # world (different sprites, same statistics): retrieval must generalize
    # to scene content, not memorize sprites.
    print(f"rendering {args.places}x{args.views} train views ...", flush=True)
    t0 = time.time()
    world = make_room_world(rng, n_sprites=300)
    anchors = [random_interior_pose(rng) for _ in range(args.places)]
    # A place's identity for negative-masking is its circuit angle,
    # recovered from the camera centre (c = [r sin t, y, -r cos t]).
    thetas = np.array([np.arctan2(p.t[0], -p.t[2]) for p in anchors])
    train_views = render_place_views(
        world, anchors, args.views, calib, h, w, size, rng,
        (args.rot_jitter, args.trans_jitter),
    )
    print(f"  train renders in {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    eval_world = make_room_world(np.random.default_rng(args.seed + 999),
                                 n_sprites=300)
    eval_anchors = [random_interior_pose(rng) for _ in range(args.eval_places)]
    eval_thetas = np.array([np.arctan2(p.t[0], -p.t[2]) for p in eval_anchors])
    eval_views = render_place_views(
        eval_world, eval_anchors, 2, calib, h, w, size, rng,
        (args.rot_jitter, args.trans_jitter),
    )
    print(f"  eval renders in {time.time() - t0:.1f}s", flush=True)

    # --- device-resident dataset
    data = jnp.asarray(train_views.reshape(-1, size, size))  # (P*V, s, s) u8
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    init = init_eigenplaces_params(args.seed)
    stats0 = {k: v for k, v in init.items() if "running_" in k}
    trainable = {k: jnp.asarray(v, jnp.float32) for k, v in init.items()
                 if "running_" not in k}

    sched = optax.warmup_cosine_decay_schedule(
        init_value=args.lr / 10.0, peak_value=args.lr,
        warmup_steps=max(1, args.steps // 15),
        decay_steps=args.steps, end_value=args.lr / 20.0,
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt = tx.init(trainable)

    def batch_images(idx):
        x = data[idx].astype(jnp.float32) / 255.0  # (B, s, s)
        x = jnp.repeat(x[..., None], 3, axis=-1)
        return (x - mean) / std

    def loss_fn(params, idx, theta_b, pair_to):
        desc, stats = eigenplaces_descriptor_train(params, batch_images(idx))
        logits = (desc @ desc.T) / args.temperature  # (B, B)
        B = logits.shape[0]
        dth = jnp.abs(theta_b[:, None] - theta_b[None, :])
        dth = jnp.minimum(dth, 2 * jnp.pi - dth)
        eye = jnp.eye(B, dtype=bool)
        is_pos = jnp.zeros((B, B), bool).at[jnp.arange(B), pair_to].set(True)
        # Valid contrast set: the paired view, plus places far enough along
        # the circuit to be genuinely different scenes.
        valid = is_pos | ((dth > args.theta_margin) & ~eye)
        masked = jnp.where(valid, logits, -jnp.inf)
        loss = -jnp.mean(
            jnp.take_along_axis(masked, pair_to[:, None], axis=1)[:, 0]
            - jax.nn.logsumexp(masked, axis=1)
        )
        return loss, stats

    @jax.jit
    def train_step(params, opt, run_stats, idx, theta_b, pair_to):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, idx, theta_b, pair_to
        )
        upd, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, upd)
        m = args.bn_momentum
        run_stats = {
            k: (1.0 - m) * run_stats[k].astype(jnp.float32) + m * stats[k]
            for k in run_stats
        }
        return params, opt, run_stats, loss

    def eval_recall(params, run_stats):
        """recall@1 on the held-out world: each query view must retrieve its
        own place's gallery view (angular tie: within theta-margin counts —
        that IS the same place for the loop closer)."""
        p = dict(params)
        p.update(run_stats)
        g = eigenplaces_descriptor(p, np.asarray(  # gallery: view 0
            _prep(eval_views[:, 0])))
        q = eigenplaces_descriptor(p, np.asarray(_prep(eval_views[:, 1])))
        sim = np.asarray(q @ g.T)
        top = np.argmax(sim, 1)
        dth = np.abs(eval_thetas[top] - eval_thetas)
        dth = np.minimum(dth, 2 * np.pi - dth)
        r1 = float(np.mean((top == np.arange(len(top))) | (dth < args.theta_margin)))
        same = float(np.mean(np.diag(sim)))
        far = np.abs(eval_thetas[:, None] - eval_thetas[None, :])
        far = np.minimum(far, 2 * np.pi - far) > args.theta_margin
        diff = float(np.mean(sim[far])) if far.any() else float("nan")
        return r1, same, diff

    def _prep(u8):
        x = u8.astype(np.float32) / 255.0
        x = np.repeat(x[..., None], 3, axis=-1)
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    run_stats = {k: jnp.asarray(v, jnp.float32) for k, v in stats0.items()}
    r1_0, same0, diff0 = eval_recall(trainable, run_stats)
    print(f"init: recall@1 {r1_0:.3f} same {same0:.3f} vs diff {diff0:.3f}",
          flush=True)

    P, V, B = args.places, args.views, args.batch_places
    losses = []
    t0 = time.time()
    for step in range(1, args.steps + 1):
        pl = rng.choice(P, size=B, replace=False)
        v2 = np.array([rng.choice(V, size=2, replace=False) for _ in pl])
        idx = np.concatenate([pl * V + v2[:, 0], pl * V + v2[:, 1]])
        theta_b = np.concatenate([thetas[pl], thetas[pl]]).astype(np.float32)
        pair_to = np.concatenate(
            [np.arange(B) + B, np.arange(B)]
        ).astype(np.int32)
        trainable, opt, run_stats, loss = train_step(
            trainable, opt, run_stats,
            jnp.asarray(idx, jnp.int32), jnp.asarray(theta_b),
            jnp.asarray(pair_to),
        )
        losses.append(float(loss))
        if step % 50 == 0:
            print(f"step {step}: loss {np.mean(losses[-50:]):.4f} "
                  f"({(time.time() - t0) / step:.2f}s/step)", flush=True)

    r1_1, same1, diff1 = eval_recall(trainable, run_stats)
    print(f"trained: recall@1 {r1_1:.3f} same {same1:.3f} vs diff {diff1:.3f}",
          flush=True)

    final = dict(trainable)
    final.update(run_stats)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_torch_layout(final, args.out)
    meta = {
        "steps": args.steps,
        "places": P,
        "views": V,
        "batch_places": B,
        "lr": args.lr,
        "temperature": args.temperature,
        "theta_margin": args.theta_margin,
        "platform": jax.default_backend(),
        "recall_at_1_init": r1_0,
        "recall_at_1": r1_1,
        "same_place_score": same1,
        "diff_place_score": diff1,
        "final_loss": float(np.mean(losses[-50:])) if losses else None,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {args.out}")
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
