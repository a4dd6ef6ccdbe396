#!/usr/bin/env python
"""Pretrain SuperPoint on procedural synthetic shapes (MagicPoint recipe).

Zero-egress bootstrap for the accuracy axis: no published checkpoint can be
fetched here, so this trains the detector + descriptor from scratch on
procedurally generated corner data (superslam_tpu.train) and writes a
torch-layout safetensors checkpoint that the production loader
(models/weights.py) ingests exactly like a published state dict.

The hot loop is one jitted train step on the accelerator; the single host
core renders shape pairs on a producer thread into a reusable pool, and the
wire format ships uint8 images + the 3x3 homography only (descriptor
targets are reconstructed on device — the host->TPU relay in this
environment sustains ~90 MB/s, so bytes matter).

Usage:
  python scripts/train_superpoint.py --steps 4000 --batch 32 \
      --out weights/superpoint_synth.safetensors
  JAX_PLATFORMS=cpu python scripts/train_superpoint.py --steps 30 ...  # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--pool", type=int, default=1200)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--out", default="weights/superpoint_synth.safetensors")
    ap.add_argument("--resume", default=None, help="checkpoint to continue from")
    ap.add_argument(
        "--render-frac", type=float, default=0.0,
        help="fraction of steps trained on sprite-world renders (domain "
        "adaptation for the synthetic accuracy sequences)",
    )
    ap.add_argument("--render-height", type=int, default=240)
    ap.add_argument("--render-width", type=int, default=320)
    ap.add_argument(
        "--render-fx", type=float, default=320.0,
        help="render focal length — match the evaluation sequence's fx so "
        "apparent feature scale (fx/z) matches at test time",
    )
    ap.add_argument("--render-batch", type=int, default=8)
    ap.add_argument("--render-pool", type=int, default=300)
    args = ap.parse_args()

    import jax.numpy as jnp

    from superslam_tpu.models.superpoint import init_superpoint_params
    from superslam_tpu.models.weights import load_params, save_params_torch_layout
    from superslam_tpu.train import make_sp_optimizer, sp_train_step
    from superslam_tpu.train.superpoint_train import evaluate_detector
    from superslam_tpu.slam import _enable_compilation_cache
    from superslam_tpu.train.synthetic_shapes import compact_pair

    _enable_compilation_cache()
    rng = np.random.default_rng(args.seed)
    h, w = args.height, args.width

    print(f"filling pool with {args.pool} pairs at {w}x{h} ...", flush=True)
    t0 = time.time()
    pool = [compact_pair(rng, h, w) for _ in range(args.pool)]
    print(f"pool ready in {time.time() - t0:.1f}s", flush=True)

    rsource = rpool = None
    if args.render_frac > 0:
        from superslam_tpu.train.render_domain import RenderDomainSource

        rsource = RenderDomainSource(
            rng, args.render_height, args.render_width, fx=args.render_fx
        )
        print(f"filling render pool with {args.render_pool} pairs ...", flush=True)
        t0 = time.time()
        rpool = [rsource.two_view_compact(rng) for _ in range(args.render_pool)]
        print(f"render pool ready in {time.time() - t0:.1f}s", flush=True)

    stop = threading.Event()
    gen_count = [0]

    def producer() -> None:
        prng = np.random.default_rng(args.seed + 1)
        while not stop.is_set():
            if rpool is not None and prng.uniform() < args.render_frac:
                rpool[int(prng.integers(len(rpool)))] = rsource.two_view_compact(prng)
            else:
                pool[int(prng.integers(len(pool)))] = compact_pair(prng, h, w)
            gen_count[0] += 1

    th = threading.Thread(target=producer, daemon=True)
    th.start()

    params = load_params(args.resume, lambda: init_superpoint_params(args.seed))
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    tx = make_sp_optimizer(args.lr)
    opt = tx.init(params)

    def batch_of(src, indices):
        sel = [src[i] for i in indices]
        return {
            k: jnp.asarray(np.stack([s[k] for s in sel])) for k in sel[0]
        }

    eval_rng = np.random.default_rng(args.seed + 2)
    losses = []
    t0 = time.time()
    for step in range(1, args.steps + 1):
        if rpool is not None and rng.uniform() < args.render_frac:
            b = batch_of(rpool, rng.integers(len(rpool), size=args.render_batch))
        else:
            b = batch_of(pool, rng.integers(len(pool), size=args.batch))
        params, opt, loss, aux = sp_train_step(params, opt, b, tx)
        losses.append(float(loss))
        if step % 100 == 0:
            rate = step / (time.time() - t0)
            print(
                f"step {step}: loss {np.mean(losses[-100:]):.4f} "
                f"(ce {float(aux['ce0']):.3f}/{float(aux['ce1']):.3f} "
                f"desc {float(aux['desc']):.3f} "
                f"hard {float(aux['hard']):.3f}) {rate:.1f} steps/s "
                f"fresh={gen_count[0]}",
                flush=True,
            )
        if args.eval_every and step % args.eval_every == 0:
            m = evaluate_detector(params, eval_rng, h=h, w=w)
            print(f"  eval @{step}: {json.dumps(m)}", flush=True)
            if rsource is not None:
                mr = evaluate_detector(
                    params, eval_rng, image_fn=rsource.labeled_image
                )
                mm = rsource.matching_eval(params, eval_rng)
                print(
                    f"  render eval @{step}: {json.dumps(mr)} "
                    f"match: {json.dumps(mm)}",
                    flush=True,
                )
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            save_params_torch_layout(params, args.out)

    stop.set()
    metrics = evaluate_detector(params, eval_rng, n_images=16, h=h, w=w)
    render_metrics = None
    if rsource is not None:
        render_metrics = evaluate_detector(
            params, eval_rng, n_images=16, image_fn=rsource.labeled_image
        )
        render_metrics.update(rsource.matching_eval(params, eval_rng, n_pairs=8))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_torch_layout(params, args.out)
    meta = {
        "steps": args.steps,
        "batch": args.batch,
        "image": [h, w],
        "final_loss": float(np.mean(losses[-100:])),
        "eval": metrics,
        "render_frac": args.render_frac,
        "render_eval": render_metrics,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {args.out}")
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
