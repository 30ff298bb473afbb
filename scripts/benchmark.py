#!/usr/bin/env python
"""Benchmark suite: throughput vs batch size, memory, sustained load, e2e.

TPU-native rebuild of the reference benchmark runner
(reference: scripts/benchmark.py:109-589): warmup, per-batch-size throughput
sweep, device-memory-vs-batch, a sustained run sampling host/device resources,
and CSV/Markdown output. CUDA sync timing becomes ``block_until_ready``;
GPU memory becomes ``device.memory_stats()``.

Usage:
    python scripts/benchmark.py --image-size 640 --batches 1 2 4 8
    python scripts/benchmark.py --tiny --batches 1 2 --sustained-s 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Benchmark the detection stack")
    p.add_argument("--image-size", type=int, default=640)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--sustained-s", type=float, default=10.0)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default="benchmark_results")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args()


class BenchmarkRunner:
    """(reference: BenchmarkRunner, scripts/benchmark.py:60-589)"""

    def __init__(self, args):
        from hvs_tpu.config import InferenceConfig, ModelConfig

        mcfg = ModelConfig()
        icfg = InferenceConfig()
        icfg.preprocessing.image_size = args.image_size
        icfg.performance.batch_buckets = tuple(sorted(args.batches))
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
        from hvs_tpu.inference import InferenceEngine

        self.engine = InferenceEngine(mcfg, icfg)
        self.args = args
        self.image_size = icfg.preprocessing.image_size
        self.results: dict = {}

    def _device_mem_mb(self) -> float:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        return stats.get("bytes_in_use", 0) / 2**20

    # ------------------------------------------------------------------
    def throughput_sweep(self):
        """(reference :124-176) — pipelined device-time throughput per batch."""
        import jax

        sweep = {}
        for b in self.args.batches:
            fn = self.engine._serve_fn(b)
            v = self.engine.variables
            x = np.random.default_rng(0).integers(
                0, 255, (b, self.image_size, self.image_size, 3), np.uint8
            )
            r = fn(v, x)
            jax.block_until_ready(r)
            mem_before = self._device_mem_mb()
            t0 = time.perf_counter()
            for _ in range(self.args.iters):
                r = fn(v, x)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / self.args.iters
            sweep[b] = {
                "latency_ms": dt * 1e3,
                "throughput_fps": b / dt,
                "device_mem_mb": self._device_mem_mb(),
                "mem_delta_mb": self._device_mem_mb() - mem_before,
            }
        self.results["throughput"] = sweep
        return sweep

    def sustained_run(self):
        """(reference :231-313) — sustained load with resource sampling."""
        import jax

        from hvs_tpu.utils import ResourceMonitor

        b = max(self.args.batches)
        fn = self.engine._serve_fn(b)
        v = self.engine.variables
        x = np.random.default_rng(1).integers(
            0, 255, (b, self.image_size, self.image_size, 3), np.uint8
        )
        jax.block_until_ready(fn(v, x))
        monitor = ResourceMonitor(interval_s=0.25)
        monitor.start()
        frames = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < self.args.sustained_s:
            r = fn(v, x)
            frames += b
        jax.block_until_ready(r)
        elapsed = time.perf_counter() - t0
        resources = monitor.stop()
        self.results["sustained"] = {
            "duration_s": elapsed,
            "frames": frames,
            "fps": frames / elapsed,
            **resources,
        }
        return self.results["sustained"]

    def end_to_end(self):
        """(reference :315-391) — full host path incl. decode+letterbox."""
        import cv2

        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (480, 640, 3), np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        jpeg = buf.tobytes()
        # warm
        self.engine.infer(cv2.imdecode(np.frombuffer(jpeg, np.uint8), 1))
        lats = []
        for _ in range(self.args.iters):
            t0 = time.perf_counter()
            frame = cv2.imdecode(np.frombuffer(jpeg, np.uint8), 1)
            self.engine.infer(frame)
            lats.append(time.perf_counter() - t0)
        lats_ms = np.asarray(lats) * 1e3
        self.results["end_to_end"] = {
            "mean_ms": float(lats_ms.mean()),
            "p50_ms": float(np.percentile(lats_ms, 50)),
            "p95_ms": float(np.percentile(lats_ms, 95)),
            "p99_ms": float(np.percentile(lats_ms, 99)),
        }
        return self.results["end_to_end"]

    # ------------------------------------------------------------------
    def save(self, out_dir: str):
        """(reference :449-589) — JSON + CSV + Markdown artifacts."""
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "benchmark.json"), "w") as f:
            json.dump(self.results, f, indent=2, default=float)
        # CSV
        lines = ["batch,latency_ms,throughput_fps,device_mem_mb"]
        for b, r in self.results.get("throughput", {}).items():
            lines.append(
                f"{b},{r['latency_ms']:.3f},{r['throughput_fps']:.1f},"
                f"{r['device_mem_mb']:.0f}"
            )
        with open(os.path.join(out_dir, "throughput.csv"), "w") as f:
            f.write("\n".join(lines))
        # Markdown
        md = ["# Benchmark results", "", "| batch | latency (ms) | fps | HBM (MB) |",
              "|---|---|---|---|"]
        for b, r in self.results.get("throughput", {}).items():
            md.append(f"| {b} | {r['latency_ms']:.2f} | {r['throughput_fps']:.1f} | "
                      f"{r['device_mem_mb']:.0f} |")
        if "end_to_end" in self.results:
            e = self.results["end_to_end"]
            md += ["", f"End-to-end (JPEG decode + letterbox + infer): "
                       f"p50 {e['p50_ms']:.1f} ms, p95 {e['p95_ms']:.1f} ms"]
        if "sustained" in self.results:
            s = self.results["sustained"]
            md += ["", f"Sustained {s['duration_s']:.0f}s: {s['fps']:.1f} fps"]
        with open(os.path.join(out_dir, "benchmark.md"), "w") as f:
            f.write("\n".join(md))


def main():
    from hvs_tpu.utils import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    runner = BenchmarkRunner(args)
    sweep = runner.throughput_sweep()
    e2e = runner.end_to_end()
    if args.sustained_s > 0:
        runner.sustained_run()
    runner.save(args.output)
    best = max(sweep.values(), key=lambda r: r["throughput_fps"])
    print(json.dumps({
        "best_throughput_fps": round(best["throughput_fps"], 1),
        "e2e_p50_ms": round(e2e["p50_ms"], 2),
        "output_dir": args.output,
    }))


if __name__ == "__main__":
    main()
