#!/usr/bin/env python
"""Runnable end-to-end tour of the framework (the reference ships Jupyter
notebooks; this is the executable equivalent — works with no dataset and no
camera hardware).

    python examples/quickstart.py           # full tour on the default device
    python examples/quickstart.py --tiny    # fast smoke (CI/CPU friendly)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args()

    import jax

    from hvs_tpu.config import InferenceConfig, ModelConfig, TrainingConfig
    from hvs_tpu.inference import DetectionVisualizer, InferenceEngine
    from hvs_tpu.models import HybridVisionSystem
    from hvs_tpu.training import ManifoldConstrainedTrainer

    print(f"devices: {jax.devices()}\n")

    # ------------------------------------------------------------------
    print("== 1. configs ==")
    mcfg = ModelConfig()
    icfg = InferenceConfig()
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
        icfg.performance.batch_buckets = (1, 2)
        icfg.postprocessing.score_threshold = 0.01
    print(f"estimated params: {mcfg.estimate_parameters() / 1e6:.1f}M")
    print(f"output shapes: {mcfg.output_shapes()}\n")

    # ------------------------------------------------------------------
    print("== 2. inference engine (model init + warmup) ==")
    engine = InferenceEngine(mcfg, icfg)
    engine.warmup()
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (480, 640, 3), np.uint8)
    det = engine.infer(image)
    print(f"detections: {len(det)}  latency: {det.latency_ms:.1f} ms")
    print(f"stability report: {engine.get_stability_report()}\n")

    # ------------------------------------------------------------------
    print("== 3. visualize ==")
    vis = DetectionVisualizer(class_names=engine.class_names)
    annotated = vis.draw_detections(image, det.boxes, det.scores, det.classes)
    out_path = "/tmp/hvs_quickstart_annotated.jpg"
    try:
        import cv2

        cv2.imwrite(out_path, annotated)
        print(f"annotated image: {out_path}\n")
    except Exception:
        pass

    # ------------------------------------------------------------------
    print("== 4. three training steps (synthetic data) ==")
    tiny_model = HybridVisionSystem(
        num_classes=4, base_channels=8, stage_channels=(16, 24, 32, 40),
        stage_blocks=(1, 1, 1, 1), vit_dim=16, vit_depth=1, vit_heads=2,
        fpn_channels=16, head_channels=16, feature_dim=32, sk_iters=5,
    )
    tcfg = TrainingConfig()
    trainer = ManifoldConstrainedTrainer(tiny_model, tcfg.trainer_config(4))

    def batch(seed):
        r = np.random.default_rng(seed)
        return {
            "images": r.standard_normal((1, 64, 64, 3)).astype(np.float32),
            "boxes": np.clip(r.uniform(0.2, 0.8, (1, 8, 4)), 0.05, 0.95).astype(np.float32),
            "labels": r.integers(0, 4, (1, 8)).astype(np.int32),
            "box_mask": np.ones((1, 8), np.float32),
        }

    trainer.init_state(batch(0))
    for i in range(3):
        metrics = trainer.train_step(batch(i))
        print(f"  step {i}: loss={float(metrics['loss']):.3f} "
              f"grad_norm={float(metrics['grad_norm']):.2f}")
    print("\n== done ==")


if __name__ == "__main__":
    main()
