#!/usr/bin/env python
"""Int8 PTQ: calibrate, evaluate float-vs-int8 accuracy, measure speedup.

Produces the quantization evidence artifact (QUANT_r04.json) and the sidecar
scales file consumed by the engine (ModelConfig.quantization.scales_path).
Rationale: the serve program is HBM-bandwidth-bound at ~the v5e 819 GB/s peak
(artifacts/ROOFLINE_r03.json) with backbone+head = 76% of bytes
(artifacts/BYTES_r03.json); int8 halves those tensors' traffic. Scheme in
hvs_tpu/ops/quant.py. (Reference parity: its INT8 config flags delegate to
TensorRT and were never implemented — src/inference/engine.py:162-193.)

Usage:
    python scripts/quantize.py --checkpoint runs/r3/checkpoints/best \
        --data-root data/shapes640 --output QUANT_r04.json \
        --scales-out runs/r3/checkpoints/quant_scales.msgpack
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_engine(args, resolution: int, quantized: bool, fpn: bool = False,
                mhc: bool = False, vit: bool = False):
    from hvs_tpu.config import InferenceConfig, ModelConfig
    from hvs_tpu.inference import InferenceEngine

    mcfg = ModelConfig()
    mcfg.detection.num_classes = args.num_classes
    if args.tiny:
        # Flow-validation mode (CPU-sized): exercises calibrate -> scales
        # sidecar -> quantized engine -> eval -> fps without flagship traces.
        mcfg.backbone.base_channels = 8
        mcfg.backbone.stage_channels = (16, 24, 32, 40)
        mcfg.backbone.stage_blocks = (1, 1, 1, 1)
        mcfg.vit.dim = 16
        mcfg.vit.depth = 1
        mcfg.vit.num_heads = 2
        mcfg.fusion.fpn_channels = 16
        mcfg.fusion.out_channels = (16, 24, 32)
        mcfg.detection.head_channels = 16
        mcfg.mhc.sinkhorn_iterations = 5
    if quantized:
        mcfg.quantization.enabled = True
        mcfg.quantization.scales_path = args.scales_out
        mcfg.quantization.quantize_fpn = fpn
        mcfg.quantization.quantize_mhc = mhc
        mcfg.quantization.quantize_vit = vit
    icfg = InferenceConfig()
    icfg.preprocessing.image_size = resolution
    icfg.postprocessing.score_threshold = 0.05
    icfg.checkpoint_path = None if args.random_init else args.checkpoint
    icfg.use_ema = not args.no_ema
    return InferenceEngine(mcfg, icfg)


def load_val_images(args, resolution: int, limit=None):
    from hvs_tpu.data import COCODataset
    from hvs_tpu.data.dataset import load_image

    dataset = COCODataset(
        root=os.path.join(args.data_root, "val"),
        annotation_file=os.path.join(
            args.data_root, "annotations", "instances_val.json"
        ),
        image_size=resolution,
        max_samples=limit,
        normalize=False,
    )
    images, gts = [], []
    for i in range(len(dataset)):
        info = dataset.images[i]
        img = load_image(dataset._resolve_path(info["file_name"]))
        anns = dataset.annotations.get(info["id"], [])
        gt_boxes = np.asarray(
            [[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2],
              a["bbox"][1] + a["bbox"][3]] for a in anns], np.float32,
        ).reshape(-1, 4)
        gt_cls = np.asarray([a["category_id"] for a in anns], np.int64)
        images.append(img)
        gts.append((gt_boxes, gt_cls))
    return dataset.class_names, images, gts


def calibrate(args, engine, images, resolution: int):
    """Calibration batches use the serve path's exact normalization."""
    import jax.numpy as jnp

    from hvs_tpu.constants import IMAGENET_MEAN, IMAGENET_STD
    from hvs_tpu.data.dataset import letterbox
    from hvs_tpu.models import calibrate_quant_scales

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    batches = []
    bs = args.calib_batch
    sel = images[: args.calib_images]
    for i in range(0, len(sel), bs):
        chunk = sel[i : i + bs]
        if len(chunk) < bs:
            break
        lb = np.stack([letterbox(im, resolution)[0] for im in chunk])
        x = lb.astype(np.float32) / 255.0
        if engine.config.preprocessing.normalize:
            x = (x - mean) / std
        batches.append(jnp.asarray(x))
    t0 = time.time()
    scales = calibrate_quant_scales(
        engine.model.clone(act_quant=False),  # float twin of the serve model
        engine.variables,
        batches,
        margin=args.margin,
        percentile=args.calib_percentile,
    )
    return scales, round(time.time() - t0, 1), len(batches)


def evaluate(engine, class_names, images, gts):
    from hvs_tpu.utils import DetectionEvaluator

    evaluator = DetectionEvaluator(num_classes=len(class_names))
    t0 = time.time()
    for img, (gt_boxes, gt_cls) in zip(images, gts):
        det = engine.infer(img[..., ::-1])  # engine expects BGR
        evaluator.add_image(det.boxes, det.scores, det.classes, gt_boxes, gt_cls)
    acc = evaluator.evaluate()
    out = {k: round(v, 4) for k, v in acc.items() if not isinstance(v, dict)}
    out["eval_seconds"] = round(time.time() - t0, 1)
    return out


def measure_fps(engine, resolution: int, batch: int, iters: int = 30):
    """Device-resident throughput (same methodology as bench.py: pipelined)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, (batch, resolution, resolution, 3), np.uint8)
    )
    fn = engine._serve_fn(batch)
    out = fn(engine.variables, imgs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(engine.variables, imgs) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    return {"batch_ms": round(dt * 1e3, 3), "fps": round(batch / dt, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="flow-validation mode: tiny model (CPU-sized)")
    p.add_argument("--random-init", action="store_true",
                   help="skip checkpoint loading (flow validation only)")
    p.add_argument("--data-root", default="data/shapes640")
    p.add_argument("--num-classes", type=int, default=8)
    p.add_argument("--resolutions", default="416,640")
    p.add_argument("--calib-images", type=int, default=64)
    p.add_argument("--calib-batch", type=int, default=8)
    p.add_argument("--margin", type=float, default=1.0)
    p.add_argument("--calib-percentile", type=float, default=100.0,
                   help="percentile of per-batch max-abs (100 = exact max)")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--bench-batch", type=int, default=16)
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--eval-fpn", action="store_true",
                   help="also evaluate the int8+FPN variant (quantize_fpn)")
    p.add_argument("--eval-mhc", action="store_true",
                   help="also evaluate the int8+mHC-chain variant (quantize_mhc)")
    p.add_argument("--eval-vit", action="store_true",
                   help="also evaluate the int8+ViT variant (quantize_vit)")
    p.add_argument("--scales-out", default="runs/r3/checkpoints/quant_scales.msgpack")
    p.add_argument("--output", default="QUANT_r04.json")
    args = p.parse_args()

    if not args.checkpoint and not args.random_init:
        p.error("--checkpoint is required (or pass --random-init for flow validation)")

    from flax import serialization

    if args.tiny:
        # Flow-validation runs on CPU; never touch (or hang on) the real chip.
        __import__("jax").config.update("jax_platforms", "cpu")
    from hvs_tpu.utils import enable_compile_cache

    enable_compile_cache()
    resolutions = [int(r) for r in args.resolutions.split(",")]

    report = {"checkpoint": args.checkpoint, "scheme": (
        "symmetric W8A8 PTQ: per-tensor act scales (max-abs calibrated), "
        "per-out-channel weight scales, int32 MXU accumulation; backbone "
        "residual stream + head towers int8, norms/mHC/ViT/FPN bf16 "
        "(hvs_tpu/ops/quant.py)"), "resolutions": {}}

    # --- calibrate once at the largest resolution (scales are per-tensor
    # ranges; SiLU/GN statistics are resolution-stable).
    calib_res = max(resolutions)
    float_engine = make_engine(args, calib_res, quantized=False)
    class_names, images, gts = load_val_images(args, calib_res, args.max_images)
    scales, calib_s, n_batches = calibrate(args, float_engine, images, calib_res)
    os.makedirs(os.path.dirname(args.scales_out) or ".", exist_ok=True)
    with open(args.scales_out, "wb") as f:
        f.write(serialization.msgpack_serialize(
            __import__("jax").device_get(scales)))
    report["calibration"] = {
        "images": n_batches * args.calib_batch, "seconds": calib_s,
        "resolution": calib_res, "scales_file": args.scales_out,
        "margin": args.margin,
    }
    print(f"calibrated {n_batches * args.calib_batch} imgs in {calib_s}s "
          f"-> {args.scales_out}", flush=True)

    for res in resolutions:
        if res == calib_res:
            fe, ims, g = float_engine, images, gts
        else:
            fe = make_engine(args, res, quantized=False)
            _, ims, g = load_val_images(args, res, args.max_images)
        acc_f = evaluate(fe, class_names, ims, g)
        fps_f = measure_fps(fe, res, args.bench_batch)
        entry = {"float": {**acc_f, **fps_f}}
        variants = [("int8", False, False, False)]
        if args.eval_fpn:
            variants.append(("int8_fpn", True, False, False))
        if args.eval_mhc:
            variants.append(("int8_mhc", False, True, False))
        if args.eval_vit:
            variants.append(("int8_vit", False, False, True))
        if args.eval_fpn and args.eval_mhc and args.eval_vit:
            variants.append(("int8_all", True, True, True))
        elif args.eval_fpn and args.eval_mhc:
            variants.append(("int8_fpn_mhc", True, True, False))
        for label, fpn, mhc, vit in variants:
            qe = make_engine(args, res, quantized=True, fpn=fpn, mhc=mhc,
                             vit=vit)
            acc_q = evaluate(qe, class_names, ims, g)
            fps_q = measure_fps(qe, res, args.bench_batch)
            entry[label] = {
                **acc_q, **fps_q,
                "mAP@0.5_delta": round(
                    (acc_q.get("mAP@0.5") or 0) - (acc_f.get("mAP@0.5") or 0), 4
                ),
                "speedup": round(fps_q["fps"] / max(fps_f["fps"], 1e-6), 3),
            }
            print(f"@{res} {label}: mAP={acc_q.get('mAP@0.5')} "
                  f"(float {acc_f.get('mAP@0.5')}) {fps_q['fps']} FPS "
                  f"({entry[label]['speedup']}x vs {fps_f['fps']})", flush=True)
        report["resolutions"][str(res)] = entry

    with open(args.output, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
