#!/usr/bin/env python
"""Resolution-sweep accuracy evaluation -> ACCURACY_r{N}.json.

Evaluates one checkpoint across 320/416/512/640 serving resolutions against
the (640-native) hardened shapes benchmark — mirroring the reference's
accuracy-vs-resolution table (reference: PROJECT.md:964-969, rising
monotonically with input size) with per-size AP so AP_small is a real number
(reference: scripts/evaluate.py:129-164).

Usage:
    python scripts/accuracy_sweep.py --checkpoint runs/r3/checkpoints/best \
        --data-root data/shapes640 --output ACCURACY_r03.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate_at(resolution: int, args) -> dict:
    from hvs_tpu.config import InferenceConfig, ModelConfig
    from hvs_tpu.data import COCODataset
    from hvs_tpu.data.dataset import load_image
    from hvs_tpu.inference import InferenceEngine
    from hvs_tpu.utils import DetectionEvaluator

    mcfg = ModelConfig()
    icfg = InferenceConfig()
    icfg.preprocessing.image_size = resolution
    icfg.postprocessing.score_threshold = 0.05
    icfg.checkpoint_path = args.checkpoint
    icfg.use_ema = not args.no_ema

    dataset = COCODataset(
        root=os.path.join(args.data_root, args.split),
        annotation_file=os.path.join(
            args.data_root, "annotations", f"instances_{args.split}.json"
        ),
        image_size=resolution,
        max_samples=args.max_images,
        normalize=False,
    )
    mcfg.detection.num_classes = len(dataset.class_names)
    if args.use_rag:
        # Evaluating a RAG-trained checkpoint: the model must be built with
        # the retrieval path (and the KB seeded with the benchmark classes)
        # or the checkpoint's extra params won't load.
        mcfg.rag.enabled = True
        mcfg.rag.class_names = tuple(dataset.class_names)
    engine = InferenceEngine(mcfg, icfg)
    evaluator = DetectionEvaluator(num_classes=len(dataset.class_names))

    t0 = time.time()
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
    acc = evaluator.evaluate()
    result = {k: round(v, 4) for k, v in acc.items() if not isinstance(v, dict)}
    result["per_class_AP@0.5"] = {
        dataset.class_names[c] if c < len(dataset.class_names) else str(c):
            round(v, 4)
        for c, v in sorted(acc.get("per_class_AP@0.5", {}).items())
    }
    result["eval_seconds"] = round(time.time() - t0, 1)
    # Device throughput at this resolution (same pipelined methodology as
    # bench.py) so accuracy and FPS come from the same weights in ONE artifact
    # (reference analog: the accuracy-vs-resolution table, PROJECT.md:964-969,
    # pairs mAP with FPS per input size).
    import jax
    import jax.numpy as jnp

    batch = 16
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (batch, resolution, resolution, 3), np.uint8))
    fn = engine._serve_fn(batch)
    jax.block_until_ready(fn(engine.variables, imgs))
    t0 = time.perf_counter()
    iters = 20
    outs = [fn(engine.variables, imgs) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    result["fps_per_chip_batch16"] = round(batch / dt, 1)
    result["batch16_ms"] = round(dt * 1e3, 3)
    print(f"  {resolution}: mAP@0.5={result.get('mAP@0.5')} "
          f"small={result.get('AP@0.5_small')} ({result['eval_seconds']}s)",
          flush=True)
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data-root", default="data/shapes640")
    p.add_argument("--split", default="val")
    p.add_argument("--resolutions", default="320,416,512,640")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--use-rag", action="store_true",
                   help="build the model with the RAG path (for RAG-trained "
                        "checkpoints)")
    p.add_argument("--trained-steps", type=int, default=None)
    p.add_argument("--output", default="ACCURACY_r03.json")
    args = p.parse_args()

    from hvs_tpu.utils import enable_compile_cache

    enable_compile_cache()

    resolutions = [int(r) for r in args.resolutions.split(",")]
    sweep = {}
    for r in resolutions:
        print(f"evaluating @{r} ...", flush=True)
        sweep[str(r)] = evaluate_at(r, args)

    headline = sweep.get("640") or sweep[str(resolutions[-1])]
    with open(os.path.join(args.data_root, "annotations",
                           f"instances_{args.split}.json")) as f:
        n_classes = len(json.load(f).get("categories", []))
    trained_steps = args.trained_steps
    if trained_steps is None:
        # checkpoint lives at <run_dir>/checkpoints/<name>; the run's
        # chunks.jsonl last row records the true step count.
        chunks = os.path.join(
            os.path.dirname(os.path.dirname(args.checkpoint.rstrip("/"))),
            "chunks.jsonl")
        if os.path.exists(chunks):
            with open(chunks) as f:
                rows = f.readlines()
            if rows:
                trained_steps = json.loads(rows[-1]).get("step")
    report = {
        "benchmark": f"hardened synthetic shapes detection (COCO-format, "
                     f"{n_classes} classes, 640-native, 30% small objects "
                     f"10-32px, 2-12 instances/img, overlap<=0.4 IoU; "
                     f"scripts/make_shapes_dataset.py --size 640 seed=0)",
        "checkpoint": args.checkpoint,
        "trained_steps": trained_steps,
        "headline": {
            "resolution": 640,
            "mAP@0.5": headline.get("mAP@0.5"),
            "mAP@[.5:.95]": headline.get("mAP@[.5:.95]"),
            "AP@0.5_small": headline.get("AP@0.5_small"),
            "AP@0.5_medium": headline.get("AP@0.5_medium"),
            "AP@0.5_large": headline.get("AP@0.5_large"),
        },
        "resolution_sweep": sweep,
        "criteria": {
            "mAP@0.5 >= 0.90": (headline.get("mAP@0.5") or 0) >= 0.90,
            "AP_small measured (> 0)": (headline.get("AP@0.5_small") or -1) > 0,
            "640 >= 416 (rises with resolution like the reference table)": (
                (sweep.get("640", {}).get("mAP@0.5") or 0)
                >= (sweep.get("416", {}).get("mAP@0.5") or 1)
            ),
        },
        "reference": "reference COCO mAP@0.5=0.78 (README.md:183); "
                     "resolution table PROJECT.md:964-969",
    }
    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["criteria"], indent=2))


if __name__ == "__main__":
    main()
