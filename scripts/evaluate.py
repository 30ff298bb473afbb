#!/usr/bin/env python
"""COCO-style evaluation: mAP@0.5 / mAP@[.5:.95] + latency percentiles.

TPU-native rebuild of the reference evaluator (reference: scripts/evaluate.py:33-378).
pycocotools is absent; the from-scratch vectorized evaluator
(hvs_tpu.utils.metrics.DetectionEvaluator — parity with the reference's own
from-scratch one, src/utils/metrics.py:53-465) computes the numbers.

Usage:
    python scripts/evaluate.py --data-root data/coco --split val2017
    python scripts/evaluate.py --synthetic --images 8 --tiny    # self-check mode
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate detection accuracy")
    p.add_argument("--data-root", default="data/coco")
    p.add_argument("--split", default="val2017")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--image-size", type=int, default=416)
    p.add_argument("--output", default="evaluation_results.json")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--num-classes", type=int, default=None,
                   help="model class count (default: from dataset categories)")
    p.add_argument("--no-ema", action="store_true",
                   help="evaluate raw params even if the checkpoint has EMA")
    p.add_argument("--score-threshold", type=float, default=0.05)
    p.add_argument("--synthetic", action="store_true",
                   help="self-check on synthetic data: feeds ground truth as "
                        "predictions, must yield mAP=1.0")
    p.add_argument("--images", type=int, default=8, help="synthetic image count")
    return p.parse_args()


def synthetic_self_check(args):
    """Evaluator sanity: GT fed as predictions -> mAP 1.0."""
    from hvs_tpu.utils import DetectionEvaluator

    rng = np.random.default_rng(0)
    ev = DetectionEvaluator(num_classes=8)
    for _ in range(args.images):
        n = rng.integers(1, 6)
        x1 = rng.uniform(0, 300, n)
        y1 = rng.uniform(0, 300, n)
        w = rng.uniform(20, 100, n)
        h = rng.uniform(20, 100, n)
        boxes = np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)
        cls = rng.integers(0, 8, n)
        ev.add_image(boxes, np.ones(n, np.float32), cls, boxes, cls)
    res = ev.evaluate()
    print(json.dumps({k: v for k, v in res.items() if not isinstance(v, dict)},
                     indent=2))
    assert res["mAP@0.5"] == 1.0, "evaluator self-check failed"
    return res


def main():
    args = parse_args()
    if args.synthetic:
        synthetic_self_check(args)
        return

    from hvs_tpu.config import InferenceConfig, ModelConfig
    from hvs_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from hvs_tpu.data import COCODataset
    from hvs_tpu.inference import InferenceEngine
    from hvs_tpu.utils import DetectionEvaluator

    mcfg = ModelConfig()
    icfg = InferenceConfig()
    icfg.preprocessing.image_size = args.image_size
    icfg.postprocessing.score_threshold = args.score_threshold  # low for AP sweep
    icfg.use_ema = not args.no_ema
    if args.checkpoint:
        icfg.checkpoint_path = args.checkpoint
    if args.tiny:
        mcfg.backbone.stage_channels = (16, 24, 32, 40)
        mcfg.backbone.stage_blocks = (1, 1, 1, 1)
        mcfg.vit.dim = 16
        mcfg.vit.depth = 1
        mcfg.vit.num_heads = 2
        mcfg.fusion.fpn_channels = 16
        mcfg.detection.head_channels = 16
        mcfg.mhc.sinkhorn_iterations = 5
        icfg.preprocessing.image_size = 64

    dataset = COCODataset(
        root=os.path.join(args.data_root, args.split),
        annotation_file=os.path.join(
            args.data_root, "annotations", f"instances_{args.split}.json"
        ),
        image_size=args.image_size,
        max_samples=args.max_images,
        normalize=False,
    )
    mcfg.detection.num_classes = (
        args.num_classes if args.num_classes is not None
        else len(dataset.class_names)
    )
    engine = InferenceEngine(mcfg, icfg)
    evaluator = DetectionEvaluator(num_classes=len(dataset.class_names))

    from hvs_tpu.data.dataset import load_image

    for i in range(len(dataset)):
        info = dataset.images[i]
        image = load_image(dataset._resolve_path(info["file_name"]))
        det = engine.infer(image[..., ::-1])  # engine expects BGR
        anns = dataset.annotations.get(info["id"], [])
        gt_boxes = np.asarray(
            [[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2],
              a["bbox"][1] + a["bbox"][3]] for a in anns], np.float32,
        ).reshape(-1, 4)
        gt_cls = np.asarray([a["category_id"] for a in anns], np.int64)
        evaluator.add_image(det.boxes, det.scores, det.classes, gt_boxes, gt_cls)

    accuracy = evaluator.evaluate()
    perf = engine.get_performance_stats()
    per_class = accuracy.get("per_class_AP@0.5", {})
    report = {
        "accuracy": {k: v for k, v in accuracy.items() if not isinstance(v, dict)},
        "per_class_AP@0.5": {
            dataset.class_names[c] if c < len(dataset.class_names) else str(c): v
            for c, v in sorted(per_class.items())
        },
        "performance": perf,
        "stability": engine.get_stability_report(),
    }
    with open(args.output, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps(report["accuracy"], indent=2))
    print(f"p95 latency: {perf.get('p95_latency_ms', 0):.1f} ms, "
          f"fps: {perf.get('fps', 0):.1f}")


if __name__ == "__main__":
    main()
