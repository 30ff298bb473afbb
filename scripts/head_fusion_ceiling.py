#!/usr/bin/env python
"""Ceiling probe for detection-head norm fusion (VERDICT r4 task 4).

BYTES_r04_fused.json: with the backbone tail fused, the detection head
carries 24.4% of serve bytes at only 552 GB/s. Its towers
(hvs_tpu/models/yolo_head.py: reduce conv -> GN -> SiLU -> conv3x3 -> GN ->
SiLU -> mHC -> predict) contain two GroupNorm+SiLU pairs per scale whose
normalize passes are candidate fusion wins, like the backbone tail was
(models/backbone.py fused serve tail, measured before building via
scripts/gn_fusion_ceiling.py).

Method (same discipline as the backbone probe): time the FULL shipped serve
program (ProductionHybridVision + decode + NMS, the bench.py program) against
a variant with ONLY the head's GroupNorms ablated to identity —
yolo_head.group_norm is monkeypatched; the backbone/FPN norms stay real. The
delta is the upper bound on what any head-norm fusion can reclaim. Run on the
idle chip; decide build-vs-negative from the number.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, x, iters=30):
    r = fn(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--image-size", type=int, default=640)
    p.add_argument("--output", default="artifacts/HEAD_FUSION_CEILING_r05.json")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from hvs_tpu.models import yolo_head as yh
    from hvs_tpu.models import ProductionHybridVision, compute_constraints
    from hvs_tpu.models.yolo_head import postprocess_detections

    x = jax.random.uniform(
        jax.random.PRNGKey(0),
        (args.batch, args.image_size, args.image_size, 3), jnp.float32,
    )

    results = {}
    orig_gn = yh.group_norm
    for variant in ("full", "head_gn_identity"):
        if variant == "head_gn_identity":
            # Head-only ablation: yolo_head binds group_norm into its module
            # namespace at import, so this leaves backbone/FPN norms real.
            yh.group_norm = lambda *a, **k: (lambda y: y)
        try:
            model = ProductionHybridVision(sk_iters=20, use_pallas=True)
            v = jax.jit(functools.partial(model.init, task="detection"))(
                jax.random.PRNGKey(0), x[:1]
            )
            varbs = {
                "params": v["params"],
                "constraints": compute_constraints(v["params"], sk_iters=20),
            }

            def serve(images):
                out = model.apply(varbs, images, task="detection")
                det = postprocess_detections(
                    out["detection"], score_threshold=0.25,
                    max_detections=100, pre_nms_top_k=512,
                )
                return det.boxes, det.scores, det.classes

            f = jax.jit(serve)
            ca = f.lower(x).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            ms = bench(f, x)
            results[variant] = {
                "ms_per_batch": round(ms, 3),
                "xla_bytes": ca.get("bytes accessed", float("nan")),
            }
            print(variant, results[variant], flush=True)
        finally:
            yh.group_norm = orig_gn

    full, abl = results["full"], results["head_gn_identity"]
    out = {
        "batch": args.batch,
        "image_size": args.image_size,
        "full": full,
        "head_gn_identity": abl,
        "delta_ms": round(full["ms_per_batch"] - abl["ms_per_batch"], 3),
        "delta_fps": round(
            args.batch * 1e3 / abl["ms_per_batch"]
            - args.batch * 1e3 / full["ms_per_batch"], 1,
        ),
        "delta_bytes_frac": round(1 - abl["xla_bytes"] / full["xla_bytes"], 4),
        "note": (
            "delta = upper bound on what head-norm fusion can reclaim from "
            "the 24.4%-of-bytes detection head (BYTES_r04_fused.json)"
        ),
    }
    print(json.dumps(out))
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    with open(args.output, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
