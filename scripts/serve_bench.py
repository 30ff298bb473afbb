#!/usr/bin/env python
"""Sustained host-inclusive serving benchmark: JPEG bytes -> boxes.

The headline bench (bench.py) measures the device path from HBM-resident
tensors; the reference's 32 ms budget includes host preprocessing
(reference: PROJECT.md:856-860 — preprocess 2 ms + model 25 ms + postprocess
5 ms). This benchmark closes that gap: it drives the FULL production path —

    JPEG bytes -> cv2 decode -> native letterbox -> micro-batcher ->
    jitted serve (normalize+forward+decode+NMS on device) -> boxes on host

— under sustained load for a configurable duration, reporting completed FPS
and p50/p95/p99 per-request latency. Run on the idle chip (never concurrently
with training: one host core).

Usage:
    python scripts/serve_bench.py --seconds 30 --image-size 640 \
        --jpeg-dir data/shapes/val --output SERVE_SUSTAINED.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Sustained JPEG->boxes benchmark")
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--image-size", type=int, default=640)
    p.add_argument("--jpeg-dir", default="data/shapes/val",
                   help="directory of .jpg frames (synthetic fallback)")
    p.add_argument("--frames", type=int, default=64, help="distinct frames cycled")
    p.add_argument("--inflight", type=int, default=64,
                   help="max in-flight requests (backpressure)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num-classes", type=int, default=None,
                   help="default: inferred from the checkpoint's detection "
                        "head shape (80 without a checkpoint)")
    p.add_argument("--output", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--bucket", type=int, default=16,
                   help="max batch bucket (large buckets amortize the "
                        "tunneled device's fixed per-batch transfer cost)")
    p.add_argument("--mode", choices=["closed", "rated", "overload"],
                   default="closed",
                   help="closed: max-throughput closed loop; rated: open-loop "
                        "arrivals at --rate FPS with SLA accounting; overload: "
                        "arrivals far above capacity, asserting the bounded "
                        "queue sheds instead of queueing into SLA violation")
    p.add_argument("--rate", type=float, default=30.0,
                   help="open-loop arrival rate (rated/overload modes)")
    p.add_argument("--policy", choices=["reject", "shed_oldest"],
                   default="reject")
    p.add_argument("--queue-depth", type=int, default=0,
                   help="admission-control queue depth (0 = 2x max bucket)")
    p.add_argument("--deadline-ms", type=float, default=8.0,
                   help="micro-batch flush deadline")
    p.add_argument("--host-letterbox", action="store_true",
                   help="letterbox on the host before submit: the link then "
                        "carries 416^2 uint8 (0.52 MB/frame) instead of the "
                        "raw 480x640 frame (0.92 MB) — 44%% less traffic on "
                        "a bandwidth-bound deployment link. Geometry is "
                        "identical (letterbox of a letterboxed frame at the "
                        "same target size is the identity).")
    return p.parse_args()


def load_jpegs(args) -> list:
    """Distinct JPEG byte strings; generated if no directory is available."""
    import cv2

    paths = sorted(glob.glob(os.path.join(args.jpeg_dir, "*.jpg")))[: args.frames]
    if paths:
        return [open(p, "rb").read() for p in paths]
    rng = np.random.default_rng(0)
    blobs = []
    for _ in range(args.frames):
        img = rng.integers(0, 255, (480, 640, 3), np.uint8)
        ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        assert ok
        blobs.append(enc.tobytes())
    return blobs


def infer_num_classes(checkpoint: str) -> int:
    """Read num_classes from the checkpoint's detection-head predict kernel.

    Uses orbax metadata only (shapes, no array data), so it is cheap. The
    prediction conv's last dim is anchors_per_cell * (5 + num_classes) with 3
    anchors per cell (hvs_tpu/models/yolo_head.py).
    """
    import jax
    import orbax.checkpoint as ocp

    md = ocp.StandardCheckpointer().metadata(os.path.abspath(checkpoint))
    md = getattr(md, "item_metadata", md)
    for path, leaf in jax.tree_util.tree_flatten_with_path(md)[0]:
        keys = jax.tree_util.keystr(path)
        if "detection_head" in keys and "predict" in keys and "kernel" in keys:
            out_ch = leaf.shape[-1]
            assert out_ch % 3 == 0 and out_ch // 3 > 5, out_ch
            return out_ch // 3 - 5
    raise ValueError(f"no detection-head predict kernel in {checkpoint}")


def main():
    args = parse_args()
    if args.tiny:
        # Flow-validation runs on CPU; never touch (or hang on) the real chip.
        __import__("jax").config.update("jax_platforms", "cpu")
    # Keep enough requests in flight to form full batches at the big bucket.
    args.inflight = max(args.inflight, args.bucket * 3)

    from hvs_tpu.config import InferenceConfig, ModelConfig
    from hvs_tpu.inference import InferenceEngine
    from hvs_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import cv2

    if args.num_classes is None:
        args.num_classes = (infer_num_classes(args.checkpoint)
                            if args.checkpoint else 80)
        print(f"num_classes={args.num_classes} (from checkpoint)"
              if args.checkpoint else "num_classes=80 (default)",
              file=sys.stderr, flush=True)
    mcfg = ModelConfig()
    mcfg.detection.num_classes = args.num_classes
    icfg = InferenceConfig()
    icfg.preprocessing.image_size = args.image_size
    # Two buckets: under sustained closed-loop load the batcher forms full
    # batches; the small one covers the ramp/tail. (Each bucket is one
    # AOT-cached program.)
    icfg.performance.batch_buckets = (max(args.bucket // 4, 1), args.bucket)
    icfg.performance.max_queue_delay_ms = args.deadline_ms
    # Closed-loop mode uses semaphore backpressure, not admission control —
    # size the queue above the in-flight cap so it never rejects.
    icfg.performance.max_queue_depth = (
        args.queue_depth or (args.inflight + args.bucket
                             if args.mode == "closed" else 0)
    )
    icfg.performance.overload_policy = args.policy
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

    engine = InferenceEngine(mcfg, icfg)

    blobs = load_jpegs(args)
    # Warm the raw-frame (on-device letterbox) program for this source shape
    # at every bucket, so no compile/trace lands inside the measured window.
    # (engine.warmup() would build the host-letterboxed programs — unused
    # here since uniform-shape frames take the raw path.)
    from hvs_tpu.data.dataset import letterbox

    warm = cv2.imdecode(np.frombuffer(blobs[0], np.uint8), cv2.IMREAD_COLOR)
    if args.host_letterbox:
        warm = letterbox(warm, args.image_size)[0]
    # Admit the benchmark's frame shape to the raw on-device-letterbox path
    # (compiles its programs for every bucket); unregistered shapes would
    # fall back to host letterbox.
    engine.register_raw_shape(warm.shape[:2])
    for b in icfg.performance.batch_buckets:
        print(f"warming bucket {b}...", file=sys.stderr, flush=True)
        engine.infer_batch([warm] * b)  # raw-path execute (already compiled)
        # Steady-state service time per bucket feeds the micro-batcher's
        # latency-budget queue sizing (depth = budget / per-item service).
        # Includes one blocking tunnel RTT — conservative (smaller queue).
        t0 = time.perf_counter()
        engine.infer_batch([warm] * b)
        engine._service_time_s[b] = time.perf_counter() - t0
    print(f"service times: { {k: round(v*1e3,1) for k, v in engine._service_time_s.items()} } ms",
          file=sys.stderr, flush=True)
    engine.start_batcher()
    # Warm THROUGH the micro-batcher too: the tunneled device pays a large
    # one-time stall on the first result pull per process (measured: up to
    # ~90 s); absorb it — and any thread-local first-use costs — before the
    # measured window opens.
    print("warming through batcher...", file=sys.stderr, flush=True)
    from hvs_tpu.inference import EngineOverloaded
    # Respect admission control: with a small latency-sized queue (e.g.
    # bucket 2 -> depth 2) a burst of 4 submits is correctly rejected, so
    # warm with backpressure instead of a blind burst.
    warm_pending = []
    for _ in range(max(args.bucket, 4)):
        while True:
            try:
                warm_pending.append(engine.submit(warm))
                break
            except EngineOverloaded:
                if warm_pending:
                    warm_pending.pop(0).result(timeout=300)
                else:
                    time.sleep(0.05)
    for fut in warm_pending:
        fut.result(timeout=300)
    # Fresh metrics window: warm-phase latencies (compile/AOT-load, the
    # first-pull stall) must not leak into serving stats.
    engine.metrics.reset()
    print("measurement window open", file=sys.stderr, flush=True)
    n_blobs = len(blobs)
    latencies = []
    lat_lock = threading.Lock()
    sem = threading.Semaphore(args.inflight)
    done = 0
    errors = []

    def collect(fut, t_submit):
        nonlocal done
        try:
            fut.result(timeout=120)
            with lat_lock:
                latencies.append(time.perf_counter() - t_submit)
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            sem.release()

    from concurrent.futures import ThreadPoolExecutor

    from hvs_tpu.inference import EngineOverloaded

    collector = ThreadPoolExecutor(max_workers=2)
    shed_or_rejected = 0
    t0 = time.perf_counter()
    i = 0
    submitted = 0

    def collect_open(fut, t_submit):
        """Open-loop completion: shed requests count separately, not as errors."""
        nonlocal shed_or_rejected
        try:
            fut.result(timeout=120)
            with lat_lock:
                latencies.append(time.perf_counter() - t_submit)
        except EngineOverloaded:
            with lat_lock:
                shed_or_rejected += 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    if args.mode == "closed":
        # Max-throughput closed loop: decode on the submitting thread (host
        # cost measured), completion collected via callbacks, semaphore
        # backpressure.
        while time.perf_counter() - t0 < args.seconds:
            sem.acquire()
            blob = blobs[i % n_blobs]
            i += 1
            t_submit = time.perf_counter()
            img = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
            if args.host_letterbox:
                img = letterbox(img, args.image_size)[0]
            fut = engine.submit(img)
            submitted += 1
            collector.submit(collect, fut, t_submit)
        for _ in range(args.inflight):
            sem.acquire()
    else:
        # Open-loop arrivals at a fixed rate: submissions happen ON SCHEDULE
        # whether or not earlier requests completed — the honest way to
        # measure latency at a rated load and behavior under overload
        # (closed loops self-throttle and hide queue growth).
        interval = 1.0 / args.rate
        next_t = t0
        while time.perf_counter() - t0 < args.seconds:
            now = time.perf_counter()
            if now < next_t:
                time.sleep(min(next_t - now, 0.01))
                continue
            next_t += interval
            blob = blobs[i % n_blobs]
            i += 1
            # Fast-shed BEFORE decode: an overloaded 1-core host must not
            # spend 3.4 ms decoding a frame it is about to reject (the API
            # layer's fast-429 path uses the same predicate).
            if not engine.accepting():
                shed_or_rejected += 1
                submitted += 1
                continue
            t_submit = time.perf_counter()
            img = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
            if args.host_letterbox:
                img = letterbox(img, args.image_size)[0]
            try:
                fut = engine.submit(img)
            except EngineOverloaded:
                shed_or_rejected += 1
                continue
            finally:
                submitted += 1
            collector.submit(collect_open, fut, t_submit)
        time.sleep(2.0)  # drain tail
    elapsed = time.perf_counter() - t0
    engine.stop_batcher()
    collector.shutdown(wait=True)

    assert not errors, errors[:3]
    lat = np.asarray(sorted(latencies)) * 1e3
    completed = len(lat)
    latency_target = icfg.performance.latency_target_ms
    report = {
        "mode": args.mode,
        "sustained_fps_host_inclusive": round(completed / elapsed, 2),
        "offered_rate_fps": (None if args.mode == "closed" else args.rate),
        "seconds": round(elapsed, 2),
        "frames": completed,
        "submitted": submitted,
        "shed_or_rejected": shed_or_rejected,
        "image_size": args.image_size,
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p95_ms": round(float(np.percentile(lat, 95)), 2),
        "p99_ms": round(float(np.percentile(lat, 99)), 2),
        "mean_ms": round(float(np.mean(lat)), 2),
        # Reference CI SLA: mean <50 ms, p95 <100 ms
        # (reference src/tests/test_inference.py:127-154).
        "meets_latency_target": round(
            float(np.mean(lat <= 2 * latency_target)), 4
        ),
        "sla": {"mean_ms_lt": latency_target, "p95_ms_lt": 2 * latency_target,
                "mean_ok": bool(np.mean(lat) < latency_target),
                "p95_ok": bool(np.percentile(lat, 95) < 2 * latency_target)},
        "overload_policy": args.policy,
        "host_letterbox": args.host_letterbox,
        "path": "jpeg->decode->letterbox->microbatch->device(fwd+decode+nms)->boxes",
        "engine_stats": engine.get_performance_stats(),
    }
    print(json.dumps({k: v for k, v in report.items() if k != "engine_stats"},
                     indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2, default=float)


if __name__ == "__main__":
    main()
