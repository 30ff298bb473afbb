#!/usr/bin/env python
"""Inference CLI: image / directory / video / webcam / synthetic dispatch.

TPU-native rebuild of the reference inference script
(reference: scripts/inference.py:33-529) with per-stage timing and JSON result
export.

Usage:
    python scripts/inference.py --image path.jpg --output out/
    python scripts/inference.py --source synthetic --frames 30   # no hardware
    python scripts/inference.py --video clip.mp4 --annotated out.mp4
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Run detection inference")
    p.add_argument("--image", default=None)
    p.add_argument("--dir", default=None, help="directory of images")
    p.add_argument("--video", default=None)
    p.add_argument("--source", default=None, help="webcam index or 'synthetic'")
    p.add_argument("--frames", type=int, default=30, help="max frames for streams")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--config", default=None, help="inference YAML")
    p.add_argument("--output", default="inference_results")
    p.add_argument("--annotated", default=None, help="annotated output path")
    p.add_argument("--score-threshold", type=float, default=None)
    p.add_argument("--tiny", action="store_true", help="tiny model (smoke/CI)")
    return p.parse_args()


def build_engine(args):
    from hvs_tpu.config import InferenceConfig, ModelConfig, load_config

    icfg = load_config(args.config, "inference") if args.config else InferenceConfig()
    if args.checkpoint:
        icfg.checkpoint_path = args.checkpoint
    if args.score_threshold is not None:
        icfg.postprocessing.score_threshold = args.score_threshold
    mcfg = ModelConfig()
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
        icfg.postprocessing.score_threshold = (
            args.score_threshold if args.score_threshold is not None else 0.01
        )
    from hvs_tpu.inference import InferenceEngine

    return InferenceEngine(mcfg, icfg)


def process_image(engine, path, args, visualizer):
    """(reference: scripts/inference.py:97-200 — per-stage timing)"""
    import cv2

    t0 = time.perf_counter()
    image = cv2.imread(path)
    t_load = time.perf_counter() - t0
    det = engine.infer(image)
    result = {
        "file": path,
        "num_detections": len(det),
        "detections": det.to_dict(),
        "timing_ms": {"load": t_load * 1e3, "infer_e2e": det.latency_ms},
    }
    if args.annotated:
        drawn = visualizer.draw_detections(image, det.boxes, det.scores, det.classes)
        out_path = (
            args.annotated if args.image
            else os.path.join(args.annotated, os.path.basename(path))
        )
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        cv2.imwrite(out_path, drawn)
        result["annotated"] = out_path
    return result


def _make_pipeline(engine, source):
    """Build the pipeline around an existing engine (no second model build)."""
    from hvs_tpu.inference import CompleteInferencePipeline

    pipe = CompleteInferencePipeline.__new__(CompleteInferencePipeline)
    from hvs_tpu.data.streaming import RoboticCameraStream, StreamConfig, StreamType
    from hvs_tpu.inference import DetectionTracker, DetectionVisualizer, PerformanceMonitor

    pipe.engine = engine
    pipe.visualizer = DetectionVisualizer(class_names=engine.class_names)
    pipe.perf = PerformanceMonitor()
    pipe.tracker = DetectionTracker()
    stype = StreamType.SYNTHETIC if source == "synthetic" else (
        StreamType.USB if isinstance(source, int) else StreamType.FILE
    )
    pipe.camera = RoboticCameraStream(
        StreamConfig(source=source, stream_type=stype, target_fps=30.0)
    )
    pipe.robot = None
    pipe.command_handler = None
    return pipe


def main():
    from hvs_tpu.utils import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    engine = build_engine(args)
    engine.warmup()  # compile buckets before any timed frame
    from hvs_tpu.inference import DetectionVisualizer

    visualizer = DetectionVisualizer(class_names=engine.class_names)
    os.makedirs(args.output, exist_ok=True)
    results = []

    if args.image:
        results.append(process_image(engine, args.image, args, visualizer))
    elif args.dir:
        paths = sorted(
            sum((glob.glob(os.path.join(args.dir, e)) for e in
                 ("*.jpg", "*.jpeg", "*.png")), [])
        )
        for path in paths:
            results.append(process_image(engine, path, args, visualizer))
    elif args.video:
        pipe = _make_pipeline(engine, "synthetic")
        summary = pipe.process_video(args.video, args.annotated, args.frames)
        results.append({"video": args.video, **summary})
    elif args.source is not None:
        source = args.source if args.source == "synthetic" else int(args.source)
        pipe = _make_pipeline(engine, source)
        summary = pipe.run_realtime(max_frames=args.frames)
        pipe.shutdown()
        results.append({"source": args.source, **summary})
    else:
        print("nothing to do: pass --image/--dir/--video/--source", file=sys.stderr)
        sys.exit(2)

    out_path = os.path.join(args.output, "results.json")
    with open(out_path, "w") as f:
        json.dump(
            {"results": results, "performance": engine.get_performance_stats()},
            f, indent=2, default=float,
        )
    total_dets = sum(r.get("num_detections", 0) for r in results)
    stats = engine.get_performance_stats()
    print(json.dumps({
        "processed": len(results),
        "total_detections": total_dets,
        "mean_latency_ms": stats.get("mean_latency_ms"),
        "results_file": out_path,
    }, default=float))


if __name__ == "__main__":
    main()
