"""Headline benchmark: frames/sec/chip at 640x640 detection, end-to-end on device.

Measures the full serving path — normalized image in HBM -> flagship model
(ProductionHybridVision: bf16, constrained mHC matrices precomputed at load) ->
on-device decode + class-aware NMS -> fixed-size boxes/scores/classes — on the
real TPU chip, and prints ONE JSON line. Baseline: the reference's 35 FPS at
640x640 on an RTX 3090 (reference README.md:184, PROJECT.md:968; BASELINE.md).

Latency note: per-frame latency is measured pipelined (submit ahead, divide by
frames) because this harness reaches the TPU through a tunnel whose completion
polling adds ~25ms to any single blocking wait; pipelined timing reflects the
true device cost per frame, which is what production serving achieves with a
double-buffered request queue.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import functools

    import jax.numpy as jnp

    from hvs_tpu.models import ProductionHybridVision, compute_constraints
    from hvs_tpu.models.yolo_head import postprocess_detections

    import os

    # HVS_BENCH_QUANT=1 benchmarks the int8 serve path (hvs_tpu/ops/quant.py):
    # backbone residual stream + head towers W8A8 (+FPN with =2). Throughput
    # does not depend on the scale VALUES, so identity scales suffice here;
    # accuracy of the quantized path is evidenced separately by
    # scripts/quantize.py on the trained checkpoint (QUANT_r04.json: @640
    # float mAP 0.9249 @ 846.5 FPS vs int8 variants 0.88-0.92 mAP at
    # 0.78-0.93x float — int8 does not beat the folded float path here).
    quant_mode = int(os.environ.get("HVS_BENCH_QUANT", "0") or 0)
    model = ProductionHybridVision(
        sk_iters=20,
        # Float path: fused packed Pallas mHC kernel on throughput buckets
        # (measured 871.8-875.0 vs 796.1 FPS @640² batch 16); the batch-aware
        # gate (PALLAS_GATE_r04.json) keeps batch-1/2 on pure XLA, where the
        # kernel loses (batch-1 2.37-2.39 vs 2.72 ms/frame all-Pallas).
        # Quant modes keep their as-measured programs (QUANT_r04.json).
        use_pallas=quant_mode == 0,
        act_quant=quant_mode >= 1,
        act_quant_fpn=quant_mode >= 2,
        act_quant_mhc=quant_mode >= 3,  # backbone mHC matmul chains int8
        act_quant_vit=quant_mode >= 4,  # ViT projections + mHC chains int8
    )
    rng = jax.random.PRNGKey(0)
    init_images = jnp.zeros((1, 640, 640, 3), jnp.float32)
    # jit the init: eager flax init dispatches thousands of tiny ops (minutes on
    # this host); one compiled+persistently-cached graph takes seconds.
    variables = jax.jit(functools.partial(model.init, task="detection"))(
        rng, init_images
    )
    params = variables["params"]
    # HVS_BENCH_CHECKPOINT=<orbax dir>: bench the TRAINED weights (EMA when
    # present) instead of random init. Throughput is value-independent, but
    # the headline should be the literally-shipped serve program — trained
    # 80-class checkpoint included (VERDICT r4 task 1). Defaults to the r5
    # trained-80 checkpoint when it exists on this VM so the driver's plain
    # `python bench.py` measures the shipped weights; set it to "" to force
    # random init.
    ckpt = os.environ.get("HVS_BENCH_CHECKPOINT")
    if ckpt is None:
        for cand in ("runs/r5c/checkpoints/best", "runs/r5b/checkpoints/best",
                     "runs/r5/checkpoints/best"):
            if os.path.isdir(cand):
                ckpt = cand
                break
    ckpt = ckpt or ""
    if ckpt:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(ckpt))
        loaded = restored.get("ema_params") or restored["params"]
        params = jax.tree_util.tree_map(
            lambda live, res: jnp.asarray(res, live.dtype), params, loaded
        )
    # Serving fast path: constrained matrices computed once at load.
    prepared = {
        "params": params,
        "constraints": compute_constraints(params, sk_iters=20),
    }
    if quant_mode:
        prepared["quant"] = variables["quant"]  # identity scales from init
    variables = prepared

    @jax.jit
    def serve(images):
        out = model.apply(variables, images, task="detection")
        det = postprocess_detections(
            out["detection"], score_threshold=0.25, max_detections=100,
            pre_nms_top_k=512,
        )
        return det.boxes, det.scores, det.classes

    # Throughput-optimal bucket (measured: 16 > 8 > 32 on v5e in r2; the
    # r5 bucket sweep re-checks 32/64 under the fused program —
    # HVS_BENCH_BATCH overrides for that sweep).
    batch = int(os.environ.get("HVS_BENCH_BATCH", "16") or 16)
    images = jax.random.uniform(rng, (batch, 640, 640, 3), jnp.float32)

    # Warmup / compile.
    r = serve(images)
    jax.block_until_ready(r)

    # Throughput at the optimal bucket.
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        r = serve(images)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt

    # Pipelined per-frame latency at batch 1 (see module docstring).
    one = images[:1]
    r = serve(one)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(60):
        r = serve(one)
    jax.block_until_ready(r)
    frame_ms = (time.perf_counter() - t0) / 60 * 1e3

    baseline_fps = 35.0  # RTX 3090 @ 640x640 (BASELINE.md)
    row = {
        "metric": "fps_per_chip_640_detect_e2e",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline_fps, 2),
        "batch1_frame_ms": round(frame_ms, 2),
    }
    if ckpt:
        row["checkpoint"] = ckpt
    if batch != 16:
        row["batch"] = batch
    print(json.dumps(row))


def _preflight(timeout_s: float = 240.0, retry_wait_s: float = 300.0) -> None:
    """Fail fast (clear JSON diagnostic) instead of hanging forever.

    TPU client init through this deployment's tunnel blocks INDEFINITELY when
    the remote claim is wedged (e.g. a previous client died uncleanly) —
    jax.devices() never returns and no in-process timeout can interrupt it.
    Probe in a subprocess with a hard timeout (clean SIGTERM teardown, see
    scripts/tpu_recover.py) so a wedged tunnel produces a diagnosable one-line
    result rather than a silent multi-hour hang. On failure, attempt ONE
    recovery cycle (wait for possible remote-claim expiry, re-probe) and write
    a post-mortem artifact before emitting tpu_unavailable.
    """
    import os
    import sys
    import time

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
    from tpu_recover import probe_once, write_postmortem

    log_path = "/tmp/bench_preflight_probes.jsonl"
    for attempt in range(2):
        r = probe_once(timeout_s)
        with open(log_path, "a") as f:
            f.write(json.dumps(r) + "\n")
        if r["ok"]:
            return
        if attempt == 0:
            time.sleep(retry_wait_s)
    write_postmortem(log_path, "artifacts/TPU_WEDGE_POSTMORTEM.json")
    print(json.dumps({
        "metric": "fps_per_chip_640_detect_e2e",
        "value": 0,
        "unit": "frames/sec/chip",
        "vs_baseline": 0,
        "error": "tpu_unavailable",
        "detail": r["detail"],
    }))
    raise SystemExit(1)


if __name__ == "__main__":
    _preflight()
    main()
