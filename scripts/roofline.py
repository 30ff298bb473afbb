#!/usr/bin/env python
"""Roofline analysis of the serve path -> artifacts/ROOFLINE_r03.json.

VERDICT r2 item 8: "Write the roofline analysis, then try one lever".
This script produces the analysis from MEASURED quantities:

  - XLA cost analysis of the compiled serve program (flops, bytes accessed)
  - measured wall time per batch at several buckets (pipelined, tunnel-safe)
  - achieved TFLOP/s vs the chip's bf16 peak  -> MXU utilization
  - achieved GB/s vs the chip's HBM bandwidth -> bandwidth-bound check
  - a forward-only vs forward+decode+NMS split to attribute any serial tail

Peaks default to TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM; public spec —
jax-ml.github.io/scaling-book) and are recorded in the artifact so the
arithmetic is auditable.

Usage:
    python scripts/roofline.py --output artifacts/ROOFLINE_r03.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, args_, iters=30):
    """Pipelined seconds/call (tunnel-safe: one block at the end)."""
    import jax

    r = fn(*args_)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args_)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=640)
    p.add_argument("--buckets", default="8,16,32")
    p.add_argument("--peak-tflops-bf16", type=float, default=197.0)
    p.add_argument("--peak-hbm-gbps", type=float, default=819.0)
    p.add_argument("--output", default="artifacts/ROOFLINE_r03.json")
    args = p.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from hvs_tpu.models import ProductionHybridVision, compute_constraints
    from hvs_tpu.models.yolo_head import postprocess_detections

    # Serve default: fused packed Pallas mHC kernel on TPU (bench.py parity).
    model = ProductionHybridVision(
        sk_iters=20, use_pallas=jax.default_backend() == "tpu"
    )
    rng = jax.random.PRNGKey(0)
    s = args.image_size
    variables = jax.jit(functools.partial(model.init, task="detection"))(
        rng, jnp.zeros((1, s, s, 3), jnp.float32)
    )
    variables = {
        "params": variables["params"],
        "constraints": compute_constraints(variables["params"], sk_iters=20),
    }

    def forward_only(images):
        out = model.apply(variables, images, task="detection")
        # Reduce raw head outputs so nothing large is pulled; keeps decode+NMS
        # out of the program for the attribution split.
        return [jnp.sum(p) for p in jax.tree_util.tree_leaves(out["detection"])]

    def serve(images):
        out = model.apply(variables, images, task="detection")
        det = postprocess_detections(
            out["detection"], score_threshold=0.25, max_detections=100,
            pre_nms_top_k=512,
        )
        return det.boxes, det.scores, det.classes

    report = {
        "image_size": s,
        "peaks": {
            "bf16_tflops": args.peak_tflops_bf16,
            "hbm_GBps": args.peak_hbm_gbps,
            "note": "TPU v5e public spec; utilization = achieved/peak",
        },
        "buckets": {},
    }

    for b in (int(x) for x in args.buckets.split(",")):
        images = jax.random.uniform(rng, (b, s, s, 3), jnp.float32)
        lowered = jax.jit(serve).lower(images)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))

        t_serve = measure(jax.jit(serve), (images,))
        t_fwd = measure(jax.jit(forward_only), (images,))

        achieved_tflops = flops / t_serve / 1e12
        achieved_gbps = bytes_acc / t_serve / 1e9
        report["buckets"][b] = {
            "fps": round(b / t_serve, 1),
            "batch_ms": round(t_serve * 1e3, 3),
            "forward_only_ms": round(t_fwd * 1e3, 3),
            "decode_nms_tail_ms": round((t_serve - t_fwd) * 1e3, 3),
            "xla_flops_per_batch": flops,
            "xla_bytes_accessed_per_batch": bytes_acc,
            "achieved_tflops": round(achieved_tflops, 2),
            "mxu_utilization": round(achieved_tflops / args.peak_tflops_bf16, 4),
            "achieved_hbm_GBps": round(achieved_gbps, 1),
            "hbm_utilization": round(achieved_gbps / args.peak_hbm_gbps, 4),
            "arithmetic_intensity_flops_per_byte": round(
                flops / max(bytes_acc, 1.0), 2
            ),
            # flops/byte the chip needs to be compute-bound:
            "ridge_intensity": round(
                args.peak_tflops_bf16 * 1e12 / (args.peak_hbm_gbps * 1e9), 1
            ),
        }
        r = report["buckets"][b]
        bound = (
            "compute (MXU)" if r["mxu_utilization"] > r["hbm_utilization"]
            else "HBM bandwidth"
        )
        r["bound"] = bound
        print(f"bucket {b}: {r['fps']} FPS  mxu={r['mxu_utilization']:.1%} "
              f"hbm={r['hbm_utilization']:.1%}  tail={r['decode_nms_tail_ms']}ms "
              f"-> {bound}", flush=True)

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
