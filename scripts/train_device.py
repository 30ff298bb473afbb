#!/usr/bin/env python
"""Long-horizon on-device training driver (the stability/accuracy evidence run).

Everything hot lives on the TPU: the dataset is HBM-resident, batches are
sampled+augmented inside a scanned chunk (hvs_tpu/data/device_pipeline.py),
and the host only sees a small stacked-metrics pull per chunk — this is what
makes a >=50k-step run (reference claim: >100k steps without divergence,
reference README.md:182) feasible on a thin-host single-chip deployment.

Multi-resolution: chunks cycle through --train-sizes (e.g. 416,640) so one
checkpoint serves the whole resolution sweep (reference table:
PROJECT.md:964-969).

Telemetry: per-step JSONL rows with loss/grad/ds_error/signal_ratio, plus
low-frequency eigenvalue spectra of every constrained residual matrix
(reference telemetry: src/models/manifold_layers.py:282-316).

Usage:
    python scripts/train_device.py --data-root data/shapes640 \
        --total-steps 50000 --train-sizes 416,640 --run-dir runs/r3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="On-device long training run")
    p.add_argument("--data-root", default="data/shapes640")
    p.add_argument("--total-steps", type=int, default=50_000)
    p.add_argument("--chunk-steps", type=int, default=100)
    p.add_argument("--train-sizes", default="416,640",
                   help="comma-separated resolutions cycled per chunk")
    p.add_argument("--batch-416", type=int, default=16)
    p.add_argument("--batch-640", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--warmup-steps", type=int, default=1000)
    p.add_argument("--ema-decay", type=float, default=0.999)
    p.add_argument("--max-boxes", type=int, default=16)
    p.add_argument("--run-dir", default="runs/device_run")
    p.add_argument("--checkpoint-every-steps", type=int, default=5000)
    p.add_argument("--val-every-chunks", type=int, default=20)
    p.add_argument("--eig-every-chunks", type=int, default=10)
    p.add_argument("--resume", default=None, help="checkpoint name/path to resume")
    p.add_argument("--cls-loss", default="bce",
                   choices=["bce", "softmax"],
                   help="class-loss mode (losses.mhc_yolo_loss): bce = the "
                        "reference's multi-label logistic loss; softmax = "
                        "smoothed CE for single-label taxonomies")
    p.add_argument("--cls-pos-weight", type=float, default=1.0,
                   help="bce mode: weight on the true-class term; "
                        "num_classes-1 balances the 1:(C-1) within-cell "
                        "imbalance that stalls 80-way convergence")
    p.add_argument("--num-classes", type=int, default=80,
                   help="detector taxonomy width; 80 = reference scale "
                        "(src/data/dataset.py:428-450), must match the "
                        "dataset under --data-root")
    p.add_argument("--use-rag", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.run_dir, exist_ok=True)

    import jax
    import numpy as np

    from hvs_tpu.config import ModelConfig
    from hvs_tpu.data import AugmentConfig, load_coco_arrays, put_device_data
    from hvs_tpu.training import ManifoldConstrainedTrainer, TrainerConfig
    from hvs_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print(f"devices: {jax.devices()}", flush=True)

    sizes = tuple(int(s) for s in args.train_sizes.split(","))
    batch_sizes = {416: args.batch_416, 640: args.batch_640}

    t0 = time.time()
    tr = load_coco_arrays(args.data_root, "train", max_boxes=args.max_boxes)
    va = load_coco_arrays(args.data_root, "val", max_boxes=args.max_boxes)
    print(f"decoded {tr[0].shape[0]} train / {va[0].shape[0]} val images "
          f"@{tr[0].shape[1]}^2 in {time.time()-t0:.1f}s", flush=True)
    # Upload while the process H2D link is still clean (no pulls yet).
    data = put_device_data(*tr)
    val_data = put_device_data(*va)
    jax.block_until_ready(data.images)
    print(f"dataset resident in HBM ({tr[0].nbytes/1e9:.2f} GB) "
          f"at {time.time()-t0:.1f}s", flush=True)

    mcfg = ModelConfig()
    mcfg.detection.num_classes = args.num_classes
    mcfg.rag.enabled = args.use_rag
    if args.use_rag:
        # Seed the KB with the benchmark's own classes (VERDICT r2 item 6).
        from hvs_tpu.data.shapes import class_names_for

        mcfg.rag.class_names = class_names_for(args.num_classes)
    model = mcfg.build_model(monitor=True)

    cfg = TrainerConfig(
        num_classes=args.num_classes,
        learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps,
        total_steps=args.total_steps,
        ema_decay=args.ema_decay,
        max_boxes=args.max_boxes,
        cls_mode=args.cls_loss,
        cls_pos_weight=args.cls_pos_weight,
        checkpoint_dir=os.path.join(args.run_dir, "checkpoints"),
        checkpoint_every_steps=args.checkpoint_every_steps,
        metrics_log=os.path.join(args.run_dir, "steps.jsonl"),
    )
    trainer = ManifoldConstrainedTrainer(
        model, cfg, rng=jax.random.PRNGKey(args.seed)
    )
    # init with the largest resolution so params (pos-embeds etc.) are shared.
    s0 = max(sizes)
    trainer.init_state({
        "images": np.zeros((batch_sizes.get(s0, 8), s0, s0, 3), np.float32),
        "boxes": np.zeros((batch_sizes.get(s0, 8), args.max_boxes, 4), np.float32),
        "labels": np.zeros((batch_sizes.get(s0, 8), args.max_boxes), np.int32),
        "box_mask": np.zeros((batch_sizes.get(s0, 8), args.max_boxes), np.float32),
    })
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(trainer.state.params))
    print(f"model: {n_params:,} params (rag={args.use_rag})", flush=True)
    if args.resume:
        trainer.load_checkpoint(args.resume)
        print(f"resumed from {args.resume} at step {int(trainer.state.step)}",
              flush=True)

    progress_path = os.path.join(args.run_dir, "chunks.jsonl")
    fh = open(progress_path, "a", buffering=1)
    t_run = time.time()

    def progress(row):
        row["wall_s"] = time.time() - t_run
        fh.write(json.dumps(row) + "\n")
        if row["chunk"] % 10 == 0:
            print(
                f"step {row['step']} @{row['out_size']} loss={row['loss']:.3f} "
                f"ds={row.get('ds_error_max')} sps={row['steps_per_sec']:.2f} "
                f"val={row.get('val_loss')}", flush=True)

    remaining = args.total_steps - int(trainer.state.step)
    result = trainer.train_chunked(
        data,
        total_steps=remaining,
        out_sizes=sizes,
        batch_sizes=batch_sizes,
        chunk_steps=args.chunk_steps,
        aug=AugmentConfig(),
        val_data=val_data,
        val_out_size=max(sizes),
        val_batch_size=4,
        val_every_chunks=args.val_every_chunks,
        eig_every_chunks=args.eig_every_chunks,
        progress_fn=progress,
    )
    trainer.save_checkpoint("final")
    trainer.monitor.save_report(os.path.join(args.run_dir, "stability_report.json"))
    print(json.dumps({
        "steps": int(trainer.state.step),
        "steps_per_sec": result["steps_per_sec"],
        "best_val_loss": result["best_val_loss"],
        "wall_hours": (time.time() - t_run) / 3600,
    }), flush=True)


if __name__ == "__main__":
    main()
