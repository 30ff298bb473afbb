#!/usr/bin/env python
"""Attribute the serve path's HBM traffic per stage -> artifacts/BYTES_r03.json.

ROOFLINE_r03.json shows the 640^2 serve path runs AT the HBM roofline
(~0.97-1.14 of nominal peak bandwidth, MXU ~20%, arithmetic intensity ~44
flops/byte vs ridge 240). The remaining question for the perf story is WHERE
the bytes go, so any future lever targets the right stage. This jits each
stage of the flagship forward in isolation at the throughput-optimal bucket
(batch 16 @640^2) and records XLA cost analysis (flops, bytes accessed) plus
measured wall time per stage.

Stages (module names in models/hybrid.py): backbone -> vit_encoder (+blend)
-> fpn -> detection_head -> decode+NMS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, args_, iters=20):
    import jax

    r = fn(*args_)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args_)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def cost(fn, *args_):
    """(flops, bytes, compiled-callable) — one trace, reused for timing."""
    import jax

    compiled = jax.jit(fn).lower(*args_).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return (
        float(ca.get("flops", 0.0)),
        float(ca.get("bytes accessed", 0.0)),
        compiled,
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--image-size", type=int, default=640)
    p.add_argument("--output", default="artifacts/BYTES_r03.json")
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
    b, s = args.batch, args.image_size
    variables = jax.jit(functools.partial(model.init, task="detection"))(
        rng, jnp.zeros((1, s, s, 3), jnp.float32)
    )
    variables = {
        "params": variables["params"],
        "constraints": compute_constraints(variables["params"], sk_iters=20),
    }
    images = jax.random.uniform(rng, (b, s, s, 3), jnp.float32)

    # Stage boundaries re-created with the model's own submodules applied on
    # sliced param/constraint subtrees, so the attributed programs are the
    # SAME computations the fused serve program contains (constructor args
    # mirror models/hybrid.py:101-179 exactly).
    from hvs_tpu.models.backbone import HybridVisionBackbone
    from hvs_tpu.models.fpn import FeaturePyramidNetwork
    from hvs_tpu.models.vit import HybridVisionEncoder
    from hvs_tpu.models.yolo_head import YOLODetectionHead

    report = {"batch": b, "image_size": s, "stages": {}}

    params = variables["params"]
    cons = variables["constraints"]

    def sub_vars(name):
        v = {"params": params[name]}
        if cons and name in cons:
            v["constraints"] = cons[name]
        return v

    bb = HybridVisionBackbone(
        base_channels=model.base_channels, stage_blocks=model.stage_blocks,
        stage_channels=model.stage_channels,
        sk_iters=model.sk_iters, dtype=model.dtype, monitor=False,
        precomputed_constraints=True, use_pallas=model.use_pallas,
    )
    f_bb = lambda x: bb.apply(sub_vars("backbone"), x, True)
    flops, bytes_, jf = cost(f_bb, images)
    t = measure(jf, (images,))
    scales = jf(images)
    report["stages"]["backbone"] = dict(
        ms=round(t * 1e3, 3), flops=flops, bytes=bytes_,
        GBps=round(bytes_ / t / 1e9, 1),
    )
    print("backbone", report["stages"]["backbone"], flush=True)

    vit = HybridVisionEncoder(
        dim=model.vit_dim, depth=model.vit_depth, num_heads=model.vit_heads,
        sk_iters=model.sk_iters, dropout_rate=0.0, dtype=model.dtype,
        monitor=False, precomputed_constraints=True, use_pallas=model.use_pallas,
    )
    f_vit = lambda x: vit.apply(sub_vars("vit_encoder"), x, True)
    flops, bytes_, jf = cost(f_vit, scales["scale_large"])
    t = measure(jf, (scales["scale_large"],))
    enhanced = jf(scales["scale_large"])
    report["stages"]["vit_encoder"] = dict(
        ms=round(t * 1e3, 3), flops=flops, bytes=bytes_,
        GBps=round(bytes_ / t / 1e9, 1),
    )
    print("vit", report["stages"]["vit_encoder"], flush=True)

    scales = dict(scales)
    scales["scale_large"] = 0.5 * scales["scale_large"] + 0.5 * enhanced

    fpn = FeaturePyramidNetwork(
        fpn_channels=model.fpn_channels, sk_iters=model.sk_iters,
        dtype=model.dtype, monitor=False, precomputed_constraints=True,
        use_pallas=model.use_pallas,
    )
    f_fpn = lambda sc: fpn.apply(sub_vars("fpn"), sc, True)
    flops, bytes_, jf = cost(f_fpn, scales)
    t = measure(jf, (scales,))
    fused = jf(scales)
    report["stages"]["fpn"] = dict(
        ms=round(t * 1e3, 3), flops=flops, bytes=bytes_,
        GBps=round(bytes_ / t / 1e9, 1),
    )
    print("fpn", report["stages"]["fpn"], flush=True)

    head = YOLODetectionHead(
        num_classes=model.num_classes, head_channels=model.head_channels,
        sk_iters=model.sk_iters, dtype=model.dtype, monitor=False,
        precomputed_constraints=True, use_pallas=model.use_pallas,
    )
    f_head = lambda sc: head.apply(sub_vars("detection_head"), sc, True)
    flops, bytes_, jf = cost(f_head, fused)
    t = measure(jf, (fused,))
    det_out = jf(fused)
    report["stages"]["detection_head"] = dict(
        ms=round(t * 1e3, 3), flops=flops, bytes=bytes_,
        GBps=round(bytes_ / t / 1e9, 1),
    )
    print("head", report["stages"]["detection_head"], flush=True)

    f_post = lambda d: postprocess_detections(
        d, score_threshold=0.25, max_detections=100, pre_nms_top_k=512
    )
    flops, bytes_, jf = cost(f_post, det_out)
    t = measure(jf, (det_out,))
    report["stages"]["decode_nms"] = dict(
        ms=round(t * 1e3, 3), flops=flops, bytes=bytes_,
        GBps=round(bytes_ / t / 1e9, 1),
    )
    print("decode_nms", report["stages"]["decode_nms"], flush=True)

    total_b = sum(v["bytes"] for v in report["stages"].values())
    for v in report["stages"].values():
        v["bytes_frac"] = round(v["bytes"] / total_b, 4)
    report["total_bytes"] = total_b
    report["note"] = (
        "stage-isolated programs lose cross-stage fusion, so the per-stage "
        "bytes slightly overcount vs the fused serve program; fractions are "
        "the attribution signal"
    )
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
