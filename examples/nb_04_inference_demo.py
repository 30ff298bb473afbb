# %% [markdown]
# # 04 — Inference demo
#
# TPU-native counterpart of the reference's `notebooks/04_inference_demo.ipynb`:
# the production `InferenceEngine` end-to-end — uint8 frame → native letterbox
# → one XLA program (normalize + forward + decode + class-aware NMS on device)
# → boxes on host — plus the micro-batcher that turns concurrent requests into
# bucketed device batches.

# %%
import os
import sys
import time

# Works as a script (repo/examples/) AND inside a notebook kernel
# (cwd = repo root, no __file__).
sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "__file__" in globals() else os.getcwd(),
)

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin overrides env alone

import numpy as np

TINY = bool(int(os.environ.get("HVS_NB_TINY", "0")))
OUT = os.environ.get("HVS_NB_OUT", "outputs/nb04")
os.makedirs(OUT, exist_ok=True)

# %% [markdown]
# ## Build the engine
#
# The engine compiles one fixed-shape serve function per batch bucket — no
# dynamic shapes, no recompiles at request time. A checkpoint can be supplied
# via `InferenceConfig.checkpoint_path` (EMA weights preferred when present).

# %%
from hvs_tpu.config import InferenceConfig, ModelConfig
from hvs_tpu.inference import InferenceEngine

mcfg = ModelConfig()
icfg = InferenceConfig()
icfg.postprocessing.score_threshold = 0.01  # untrained demo weights
if TINY:
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
# Admission control: the micro-batcher rejects (EngineOverloaded) once this
# many requests are queued, so overload sheds instead of queueing into
# unbounded latency. Size it for the demo's burst below.
icfg.performance.max_queue_depth = 16

engine = InferenceEngine(mcfg, icfg)
engine.warmup()
print("warm. buckets:", icfg.performance.batch_buckets)

# %% [markdown]
# ## Single-frame inference

# %%
rng = np.random.default_rng(0)
frame = rng.integers(0, 255, (480, 640, 3), np.uint8)
det = engine.infer(frame)
print(f"{len(det)} detections, latency {det.latency_ms:.1f} ms")
if len(det):
    print("top:", det.boxes[0].round(1), f"score={det.scores[0]:.3f}",
          f"class={int(det.classes[0])}")

# %% [markdown]
# ## Visualize

# %%
from hvs_tpu.inference import DetectionVisualizer

vis = DetectionVisualizer(class_names=engine.class_names)
annotated = vis.draw_detections(frame, det.boxes, det.scores, det.classes)
try:
    import cv2

    path = os.path.join(OUT, "annotated.jpg")
    cv2.imwrite(path, annotated)
    print("wrote", path)
except Exception as e:
    print("cv2 unavailable:", e)

# %% [markdown]
# ## Batched inference (one program, many frames)

# %%
frames = [rng.integers(0, 255, (480, 640, 3), np.uint8) for _ in range(4)]
t0 = time.perf_counter()
dets = engine.infer_batch(frames)
dt = (time.perf_counter() - t0) * 1e3
print(f"batch of {len(frames)}: {dt:.1f} ms total, "
      f"{dt / len(frames):.1f} ms/frame")

# %% [markdown]
# ## Concurrent serving through the micro-batcher
#
# `submit()` returns a Future; a background thread coalesces queued requests
# into the largest fitting bucket (double-buffered: the next batch forms while
# the device runs the current one).

# %%
from hvs_tpu.inference import EngineOverloaded

engine.start_batcher()
futures = [engine.submit(f) for f in frames * 2]
results = [f.result(timeout=120) for f in futures]
print(f"{len(results)} concurrent requests served")

# Overload behavior: past max_queue_depth the engine REJECTS at submit time
# (the API layer maps this to HTTP 429) — latency stays bounded under
# overload because excess work is shed, never queued.
rejected = 0
burst = []
for f in frames * 8:
    try:
        burst.append(engine.submit(f))
    except EngineOverloaded:
        rejected += 1
served = sum(1 for b in burst if b.result(timeout=120) is not None)
engine.stop_batcher()
print(f"burst of {len(frames) * 8}: {served} served, {rejected} rejected")

# %% [markdown]
# ## Performance counters

# %%
for k, v in engine.get_performance_stats().items():
    print(f"{k}: {v:.2f}" if isinstance(v, float) else f"{k}: {v}")

# %% [markdown]
# ## Stability self-check
#
# The engine can verify its mHC constraint health on the serving weights —
# the same doubly-stochastic check training monitors.

# %%
print(engine.get_stability_report())
