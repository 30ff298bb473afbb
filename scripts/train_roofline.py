#!/usr/bin/env python
"""Roofline + stage attribution for the TRAINING step (VERDICT r4 task 5).

The roofline/bytes-attribution discipline that drove four rounds of serve
wins (scripts/roofline.py, scripts/bytes_attribution.py) has never been
applied to training: the 50k-step recipe runs at ~12.7 steps/s with no
artifact saying whether that is HBM-bound, MXU-bound, or host-bound.
(The reference has no training-perf evidence at all — its trainer is an
unprofiled torch loop, src/training/mhc_trainer.py:223-297.)

Method, all measured on the real chip:
  - XLA cost analysis (flops, bytes accessed) + pipelined wall time for four
    nested programs at each resolution: device-side augment (sample_batch),
    forward+loss, forward+backward, and the full train step (fwd+bwd+optax
    update+EMA). Stage costs are the deltas.
  - achieved TFLOP/s vs bf16 peak and GB/s vs HBM peak per program -> bound.
  - chunk-level steps/s (the lax.scan the real run uses) to expose any
    per-step host dispatch tax the single-step numbers hide.

Usage:
    python scripts/train_roofline.py --data-root data/shapes80_640 \
        --output TRAIN_ROOFLINE_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", default="data/shapes80_640")
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--resolutions", default="416,640")
    p.add_argument("--batch-416", type=int, default=16)
    p.add_argument("--batch-640", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--peak-tflops-bf16", type=float, default=197.0)
    p.add_argument("--peak-hbm-gbps", type=float, default=819.0)
    p.add_argument("--max-boxes", type=int, default=16)
    p.add_argument("--output", default="TRAIN_ROOFLINE_r05.json")
    args = p.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from hvs_tpu.config import ModelConfig
    from hvs_tpu.data import AugmentConfig, load_coco_arrays, put_device_data
    from hvs_tpu.data.device_pipeline import sample_batch
    from hvs_tpu.training import ManifoldConstrainedTrainer, TrainerConfig
    from hvs_tpu.training.trainer import (
        build_targets, make_train_step, manifold_regularization_loss,
        mhc_yolo_loss, _prepare_images,
    )

    tr = load_coco_arrays(args.data_root, "train", max_boxes=args.max_boxes,
                          limit=512)
    data = put_device_data(*tr)
    jax.block_until_ready(data.images)

    mcfg = ModelConfig()
    mcfg.detection.num_classes = args.num_classes
    model = mcfg.build_model(monitor=True)
    cfg = TrainerConfig(num_classes=args.num_classes,
                        max_boxes=args.max_boxes)
    trainer = ManifoldConstrainedTrainer(model, cfg, rng=jax.random.PRNGKey(0))

    sizes = tuple(int(s) for s in args.resolutions.split(","))
    batch_for = {416: args.batch_416, 640: args.batch_640}
    ridge = args.peak_tflops_bf16 * 1e12 / (args.peak_hbm_gbps * 1e9)
    report = {
        "peaks": {
            "bf16_tflops": args.peak_tflops_bf16,
            "hbm_GBps": args.peak_hbm_gbps,
            "ridge_intensity_flops_per_byte": round(ridge, 1),
            "note": "TPU v5e public spec; utilization = achieved/peak",
        },
        "model": f"flagship HybridVisionSystem num_classes={args.num_classes}",
        "resolutions": {},
    }

    def analyzed(jitted, ex_args, iters, chained_state=False):
        """(flops, bytes, wall_s) for a compiled program, pipelined timing."""
        lowered = jitted.lower(*ex_args)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        out = jitted(*ex_args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        if chained_state:
            state = ex_args[0]
            for _ in range(iters):
                state, _m = jitted(state, *ex_args[1:])
            jax.block_until_ready(state.params)
        else:
            for _ in range(iters):
                out = jitted(*ex_args)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / iters
        return float(ca.get("flops", float("nan"))), float(
            ca.get("bytes accessed", float("nan"))), wall

    for s0 in sizes:
        b = batch_for.get(s0, 8)
        rng = jax.random.PRNGKey(1)
        aug_fn = jax.jit(functools.partial(
            sample_batch, batch_size=b, out_size=s0, aug=AugmentConfig()))
        if trainer.state is None:
            trainer.init_state(jax.device_get(aug_fn(data, rng)))
        # Keep the timed batch DEVICE-resident: handing host numpy to a jitted
        # fn re-transfers it every iteration over the tunnel (~35 MB/s once
        # any result pull has happened in the process), which bloated the
        # "forward" number to ~580 ms of pure H2D in the first r5 capture.
        batch = jax.device_put(jax.device_get(aug_fn(data, rng)))
        jax.block_until_ready(batch["images"])

        # Stage programs (each includes its predecessors; deltas attribute).
        def fwd_loss(params, batch, rng):
            images = _prepare_images(jnp.asarray(batch["images"]))
            h, w = images.shape[1], images.shape[2]
            grids = [(h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32)]
            targets = build_targets(batch["boxes"], batch["labels"],
                                    batch["box_mask"], grids,
                                    cfg.num_classes)
            outputs, _ = model.apply(
                {"params": params}, images, task="detection",
                deterministic=False, rngs={"dropout": rng},
                mutable=["stability"],
            )
            det_loss, _m = mhc_yolo_loss(outputs["detection"]["raw"], targets,
                                         cfg.num_classes)
            reg_loss, _r = manifold_regularization_loss(
                params, sk_iters=cfg.sk_iters)
            return det_loss + cfg.manifold_reg_alpha * reg_loss

        fwd = jax.jit(fwd_loss)
        fwd_bwd = jax.jit(
            lambda p, bt, r: jax.value_and_grad(fwd_loss)(p, bt, r))
        full = jax.jit(make_train_step(model, cfg))

        row = {}
        flops_a, bytes_a, wall_a = analyzed(
            aug_fn, (data, rng), args.iters * 2)
        row["augment"] = {"ms": round(wall_a * 1e3, 2),
                          "gflops": round(flops_a / 1e9, 1),
                          "gbytes": round(bytes_a / 1e9, 3)}
        flops_f, bytes_f, wall_f = analyzed(
            fwd, (trainer.state.params, batch, rng), args.iters)
        flops_g, bytes_g, wall_g = analyzed(
            fwd_bwd, (trainer.state.params, batch, rng), args.iters)
        flops_s, bytes_s, wall_s = analyzed(
            full, (trainer.state, batch, rng), args.iters, chained_state=True)

        def prog(flops, nbytes, wall):
            tflops = flops / wall / 1e12
            gbps = nbytes / wall / 1e9
            return {
                "ms": round(wall * 1e3, 2),
                "tflops_achieved": round(tflops, 2),
                "mxu_utilization": round(tflops / args.peak_tflops_bf16, 4),
                "gbps_achieved": round(gbps, 1),
                "hbm_utilization": round(gbps / args.peak_hbm_gbps, 4),
                "intensity_flops_per_byte": round(flops / max(nbytes, 1), 1),
                "bound": ("HBM" if flops / max(nbytes, 1) < ridge else "MXU"),
            }

        row["forward_loss"] = prog(flops_f, bytes_f, wall_f)
        row["forward_backward"] = prog(flops_g, bytes_g, wall_g)
        row["full_step"] = prog(flops_s, bytes_s, wall_s)
        row["stage_deltas_ms"] = {
            "forward": round(wall_f * 1e3, 2),
            "backward": round((wall_g - wall_f) * 1e3, 2),
            "optimizer_ema": round((wall_s - wall_g) * 1e3, 2),
            "augment": round(wall_a * 1e3, 2),
        }
        row["batch"] = b
        row["steps_per_sec_single_step"] = round(1.0 / wall_s, 2)
        report["resolutions"][str(s0)] = row
        print(s0, json.dumps(row), flush=True)

    # Chunk-level steps/s: the scan the real run uses. One warm chunk first
    # (compile + first dispatch), then timed chunks — this is the number the
    # 50k-step evidence runs actually see.
    report["chunked_steps_per_sec"] = {}
    for s0 in sizes:
        b = batch_for.get(s0, 8)
        trainer.train_chunked(
            data, total_steps=50, out_sizes=(s0,), batch_sizes={s0: b},
            chunk_steps=50, aug=AugmentConfig(),
        )
        t0 = time.time()
        trainer.train_chunked(
            data, total_steps=200, out_sizes=(s0,), batch_sizes={s0: b},
            chunk_steps=50, aug=AugmentConfig(),
        )
        report["chunked_steps_per_sec"][str(s0)] = round(
            200 / (time.time() - t0), 2)

    with open(args.output, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"output": args.output, **{
        k: v["full_step"]["bound"] for k, v in report["resolutions"].items()
    }}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
