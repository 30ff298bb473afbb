#!/usr/bin/env python
"""Model export CLI: StableHLO / TF SavedModel / msgpack weights.

TPU-native rebuild of the reference exporter
(reference: scripts/export_model.py:25-549 — TorchScript/ONNX/TensorRT/CoreML/
OpenVINO become the XLA-native formats), keeping the original-vs-exported
consistency check at rtol 1e-3 (reference :341-360).

Usage:
    python scripts/export_model.py --format stablehlo --output exports/model.hlo
    python scripts/export_model.py --format all --tiny --image-size 64
    # Pre-build AOT serve programs (engine cold start: blobs, not retraces):
    python scripts/export_model.py --format aot --checkpoint ckpt \
        --aot-buckets 1,4,16 --aot-source-shapes 480x640,416x416
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Export the detection model")
    p.add_argument("--format",
                   choices=["stablehlo", "savedmodel", "weights", "aot", "all"],
                   default="all")
    p.add_argument("--output", default="exports")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--image-size", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--skip-check", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--aot-buckets", default="1,4,16",
                   help="batch buckets to pre-build AOT serve programs for")
    p.add_argument("--aot-source-shapes", default="",
                   help="comma-separated HxW camera source shapes for the "
                        "raw-frame (on-device letterbox) path, e.g. "
                        "480x640,416x416; empty = letterboxed path only")
    return p.parse_args()


def main():
    from hvs_tpu.utils import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    from hvs_tpu.config import InferenceConfig, ModelConfig
    from hvs_tpu.deployment import ModelExporter
    from hvs_tpu.inference import InferenceEngine

    mcfg = ModelConfig()
    icfg = InferenceConfig()
    icfg.preprocessing.image_size = args.image_size
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
        icfg.preprocessing.image_size = min(args.image_size, 64)

    engine = InferenceEngine(mcfg, icfg)
    exporter = ModelExporter(
        engine.model, engine.variables, image_size=icfg.preprocessing.image_size
    )
    os.makedirs(args.output, exist_ok=True)
    report = {}

    if args.format in ("weights", "all"):
        path = exporter.export_weights(os.path.join(args.output, "weights.msgpack"))
        report["weights"] = {"path": path, "bytes": os.path.getsize(path)}

    if args.format in ("stablehlo", "all"):
        path = exporter.export_stablehlo(
            os.path.join(args.output, "model.stablehlo"), batch=args.batch
        )
        entry = {"path": path, "bytes": os.path.getsize(path)}
        if not args.skip_check:
            entry["consistency"] = exporter.consistency_check(path, batch=args.batch)
        report["stablehlo"] = entry

    if args.format in ("aot", "all"):
        # Pre-build the engine's AOT serve programs so production engines
        # cold-start from blobs (tracing costs ~400 s/program on a 1-core
        # host; deserialization is ~0.1 s). Blobs land in $HVS_AOT_CACHE.
        buckets = [int(b) for b in args.aot_buckets.split(",") if b]
        built = []
        for b in buckets:
            engine._serve_fn(b)
            built.append({"bucket": b, "path": "letterboxed"})
        for spec in filter(None, args.aot_source_shapes.split(",")):
            h, w = (int(v) for v in spec.lower().split("x"))
            for b in buckets:
                engine._serve_fn_raw(b, (h, w))
                built.append({"bucket": b, "source": [h, w], "path": "raw"})
        report["aot"] = {
            "programs": built,
            "cache_dir": os.environ.get(
                "HVS_AOT_CACHE",
                os.path.expanduser("~/.cache/hvs_tpu_aot"),
            ),
        }

    if args.format in ("savedmodel", "all"):
        path = exporter.export_savedmodel(
            os.path.join(args.output, "savedmodel"), batch=args.batch
        )
        report["savedmodel"] = (
            {"path": path} if path else {"skipped": "tensorflow unavailable"}
        )

    with open(os.path.join(args.output, "export_report.json"), "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
