#!/usr/bin/env python
"""Multi-task evidence run: detection + segmentation + depth heads trained
jointly on the dense shapes benchmark (VERDICT r2 item 6 — the seg/depth
heads existed but had zero training evidence).

Generates a small dense dataset (masks + depth from data/shapes.py
with_dense), keeps it HBM-resident, and trains the flagship with
``task='multi_task'`` through :func:`hvs_tpu.training.multi_task_loss`
(reference: MultiTaskLoss, src/training/loss_functions.py:309-489; heads:
src/models/hybrid_vision.py:131-156).

Reports before/after: detection loss, seg pixel-accuracy + mIoU, depth
abs-rel — written to MULTITASK_r03.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="data/shapes_mt")
    p.add_argument("--num-train", type=int, default=800)
    p.add_argument("--num-val", type=int, default=100)
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--chunk-steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--max-boxes", type=int, default=16)
    p.add_argument("--output", default="MULTITASK_r04.json")
    p.add_argument("--tiny", action="store_true",
                   help="flow-validation mode: tiny model/data (CPU-sized)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.tiny:
        # Flow-validation runs on CPU; never touch (or hang on) the real chip.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hvs_tpu.config import ModelConfig
    from hvs_tpu.data import load_coco_arrays
    from hvs_tpu.data.shapes import generate_dataset
    from hvs_tpu.training import TrainerConfig, make_optimizer
    from hvs_tpu.training.losses import (
        build_targets,
        manifold_regularization_loss,
        multi_task_loss,
    )
    from hvs_tpu.training.schedule import cosine_annealing_with_warmup
    from hvs_tpu.utils import enable_compile_cache

    enable_compile_cache()

    if not os.path.exists(
        os.path.join(args.data_root, "annotations", "instances_train.json")
    ):
        print("generating dense dataset...", flush=True)
        generate_dataset(
            args.data_root, num_train=args.num_train, num_val=args.num_val,
            size=args.size, seed=args.seed, with_dense=True,
        )
    t0 = time.time()
    tr = load_coco_arrays(args.data_root, "train", args.max_boxes, dense=True)
    va = load_coco_arrays(args.data_root, "val", args.max_boxes, dense=True)
    print(f"loaded {tr[0].shape[0]}+{va[0].shape[0]} dense images "
          f"in {time.time()-t0:.1f}s", flush=True)

    dev = {
        "train": [jax.device_put(x) for x in tr],
        "val": [jax.device_put(x) for x in va],
    }
    jax.block_until_ready(dev["train"][0])

    mcfg = ModelConfig()
    mcfg.detection.num_classes = 8
    mcfg.use_segmentation = True
    mcfg.use_depth = True
    if args.tiny:
        mcfg.backbone.base_channels = 8
        mcfg.backbone.stage_channels = (16, 24, 32, 40)
        mcfg.backbone.stage_blocks = (1, 1, 1, 1)
        mcfg.vit.dim = 16
        mcfg.vit.depth = 1
        mcfg.vit.num_heads = 2
        mcfg.fusion.fpn_channels = 16
        mcfg.fusion.out_channels = (16, 24, 32)
        mcfg.detection.head_channels = 16
        mcfg.mhc.sinkhorn_iterations = 3
    model = mcfg.build_model(monitor=False)

    cfg = TrainerConfig(num_classes=8, warmup_steps=200, total_steps=args.steps)
    schedule = cosine_annealing_with_warmup(
        args.learning_rate, cfg.warmup_steps, args.steps
    )
    tx = make_optimizer(schedule)

    from hvs_tpu.constants import IMAGENET_MEAN, IMAGENET_STD

    def prep(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        return (x - jnp.asarray(IMAGENET_MEAN, jnp.float32)) / jnp.asarray(
            IMAGENET_STD, jnp.float32
        )

    def batch_from(data, idx, size):
        images, boxes, labels, bmask, seg, depth = data
        grids = [(size // 8, size // 8), (size // 16, size // 16),
                 (size // 32, size // 32)]
        targets = build_targets(boxes[idx], labels[idx], bmask[idx], grids, 8)
        return {
            "images": prep(images[idx]),
            "targets": targets,
            "seg_labels": seg[idx].astype(jnp.int32),
            "depth": depth[idx],
        }

    def loss_fn(params, data, rng):
        idx = jax.random.randint(
            rng, (args.batch_size,), 0, data[0].shape[0]
        )
        batch = batch_from(data, idx, args.size)
        outputs = model.apply(
            {"params": params}, batch["images"], task="multi_task",
            deterministic=False, rngs={"dropout": rng},
        )
        total, metrics = multi_task_loss(outputs, batch, 8)
        reg, _ = manifold_regularization_loss(params, sk_iters=20)
        return total + 0.01 * reg, metrics

    @jax.jit
    def train_chunk(params, opt_state, data, rng):
        def body(carry, i):
            params, opt_state = carry
            step_rng = jax.random.fold_in(rng, i)
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, data, step_rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["loss"] = loss
            return (params, opt_state), metrics

        (params, opt_state), stacked = jax.lax.scan(
            body, (params, opt_state), jnp.arange(args.chunk_steps)
        )
        return params, opt_state, stacked

    @jax.jit
    def evaluate(params, data):
        images, boxes, labels, bmask, seg, depth = data
        n = (images.shape[0] // args.batch_size) * args.batch_size
        idx = jnp.arange(n).reshape(-1, args.batch_size)

        def body(acc, ids):
            batch = batch_from(data, ids, args.size)
            out = model.apply({"params": params}, batch["images"],
                              task="multi_task")
            loss, metrics = multi_task_loss(out, batch, 8)
            # Seg accuracy/mIoU at the head's output stride.
            logits = out["segmentation"].astype(jnp.float32)
            lab = batch["seg_labels"]
            fy = lab.shape[1] // logits.shape[1]
            lab = lab[:, ::fy, ::fy][:, : logits.shape[1], : logits.shape[2]]
            pred = jnp.argmax(logits, -1)
            acc_pix = jnp.mean((pred == lab).astype(jnp.float32))
            inter = []
            union = []
            for c in range(9):
                pi = pred == c
                li = lab == c
                inter.append(jnp.sum(pi & li))
                union.append(jnp.sum(pi | li))
            # Depth abs-rel at stride.
            dpred = out["depth"].astype(jnp.float32)[..., 0]
            dgt = batch["depth"]
            fy = dgt.shape[1] // dpred.shape[1]
            dgt = dgt[:, ::fy, ::fy][:, : dpred.shape[1], : dpred.shape[2]]
            absrel = jnp.mean(jnp.abs(dpred - dgt) / (dgt + 1e-3))
            return acc + jnp.stack(
                [metrics["detection_loss"], metrics["segmentation_loss"],
                 metrics["depth_loss"], acc_pix, absrel]
            ), (jnp.stack(inter), jnp.stack(union))

        totals, (inters, unions) = jax.lax.scan(
            lambda a, ids: body(a, ids), jnp.zeros(5), idx
        )
        iou = jnp.sum(inters, 0) / jnp.maximum(jnp.sum(unions, 0), 1)
        return totals / idx.shape[0], iou

    rng = jax.random.PRNGKey(args.seed)
    init_fn = jax.jit(lambda k, x: model.init(k, x, task="multi_task"))
    params = init_fn(
        rng, jnp.zeros((args.batch_size, args.size, args.size, 3), jnp.float32)
    )["params"]
    opt_state = jax.jit(tx.init)(params)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"multi-task model: {n_params:,} params", flush=True)

    before, iou_before = [np.asarray(x) for x in evaluate(params, dev["val"])]
    print("before:", before, flush=True)

    t_run = time.time()
    for ci in range(args.steps // args.chunk_steps):
        params, opt_state, stacked = train_chunk(
            params, opt_state, dev["train"], jax.random.fold_in(rng, ci)
        )
        if ci % 5 == 0:
            host = jax.device_get(stacked)
            print(f"chunk {ci}: loss={float(np.mean(host['loss'])):.3f} "
                  f"seg={float(np.mean(host.get('segmentation_loss', np.nan))):.3f} "
                  f"depth={float(np.mean(host.get('depth_loss', np.nan))):.3f} "
                  f"sps={(ci+1)*args.chunk_steps/(time.time()-t_run):.1f}",
                  flush=True)
    after, iou_after = [np.asarray(x) for x in evaluate(params, dev["val"])]
    print("after:", after, flush=True)

    report = {
        "steps": args.steps,
        "image_size": args.size,
        "train_images": int(tr[0].shape[0]),
        "params": int(n_params),
        "steps_per_sec": round(args.steps / (time.time() - t_run), 2),
        "before": {
            "detection_loss": float(before[0]),
            "segmentation_loss": float(before[1]),
            "depth_loss": float(before[2]),
            "seg_pixel_acc": float(before[3]),
            "depth_abs_rel": float(before[4]),
            "seg_miou": float(np.mean(iou_before)),
        },
        "after": {
            "detection_loss": float(after[0]),
            "segmentation_loss": float(after[1]),
            "depth_loss": float(after[2]),
            "seg_pixel_acc": float(after[3]),
            "depth_abs_rel": float(after[4]),
            "seg_miou": float(np.mean(iou_after)),
            "seg_iou_per_class": [float(x) for x in iou_after],
        },
        "note": "joint detection+segmentation+depth via multi_task_loss on the "
                "dense shapes benchmark (masks+depth from the generator); "
                "reference heads: src/models/hybrid_vision.py:131-156",
    }
    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["after"], indent=2), flush=True)


if __name__ == "__main__":
    main()
