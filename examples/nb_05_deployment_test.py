# %% [markdown]
# # 05 — Deployment test
#
# TPU-native counterpart of the reference's `notebooks/05_deployment_test.ipynb`:
# stand the REST API up in-process, drive `/detect` and `/health` over real
# HTTP, export the model (StableHLO + weights), build a versioned serving
# repository with admission gates, and run the health-check rollup.

# %%
import base64
import json
import os
import sys
import threading
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
OUT = os.environ.get("HVS_NB_OUT", "outputs/nb05")
os.makedirs(OUT, exist_ok=True)
PORT = int(os.environ.get("HVS_NB_PORT", "8123"))

# %% [markdown]
# ## Engine + API server (aiohttp) in a background thread

# %%
from hvs_tpu.config import InferenceConfig, ModelConfig
from hvs_tpu.deployment import VisionAPIServer
from hvs_tpu.inference import InferenceEngine

mcfg = ModelConfig()
icfg = InferenceConfig()
icfg.postprocessing.score_threshold = 0.01
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

engine = InferenceEngine(mcfg, icfg)
engine.warmup()

import asyncio

from aiohttp import web

server = VisionAPIServer(engine)
loop = asyncio.new_event_loop()


def _serve():
    asyncio.set_event_loop(loop)
    runner = web.AppRunner(server.app)
    loop.run_until_complete(runner.setup())
    site = web.TCPSite(runner, "127.0.0.1", PORT)
    loop.run_until_complete(site.start())
    loop.run_forever()


t = threading.Thread(target=_serve, daemon=True)
t.start()
time.sleep(1.0)
print(f"API serving on http://127.0.0.1:{PORT}")

# %% [markdown]
# ## Drive the endpoints over real HTTP

# %%
import urllib.request


def get(path):
    with urllib.request.urlopen(f"http://127.0.0.1:{PORT}{path}", timeout=60) as r:
        return json.loads(r.read())


def post(path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


import cv2

frame = np.random.default_rng(0).integers(0, 255, (120, 160, 3), np.uint8)
ok, enc = cv2.imencode(".jpg", frame)
b64 = base64.b64encode(enc.tobytes()).decode()

health = get("/health")
print("health:", health["status"])
det = post("/detect", {"image_base64": b64})
print(f"detections: {len(det['detections'])}, latency {det['latency_ms']:.1f} ms")

# %% [markdown]
# ## Export: StableHLO program + weights, with a consistency check

# %%
from hvs_tpu.deployment import ModelExporter

exporter = ModelExporter(engine.model, engine.variables,
                         image_size=icfg.preprocessing.image_size)
hlo_path = exporter.export_stablehlo(os.path.join(OUT, "model.stablehlo"))
print("exported:", hlo_path)
print("consistency:", exporter.consistency_check(hlo_path))

# %% [markdown]
# ## Versioned serving repository with admission gates
#
# `build_repository` lays out `<root>/<name>/<version>/` with a
# `config.pbtxt`-style descriptor; `RegistryGate` enforces the
# model-registry thresholds (min mAP / max latency / precision / recall)
# before a version can be admitted.

# %%
from hvs_tpu.deployment import ModelServerManager, RegistryGate, ServingModelConfig

gate = RegistryGate()
good = {"mAP@0.5": 0.92, "latency_ms": 9.0, "precision": 0.93, "recall": 0.88}
bad = {"mAP@0.5": 0.41, "latency_ms": 9.0, "precision": 0.93, "recall": 0.88}
print("good model admitted:", gate.admit(good))
print("bad model admitted: ", gate.admit(bad))

mgr = ModelServerManager(engine, ServingModelConfig(name="hvs_demo"))
repo_root = os.path.join(OUT, "model_repository")
result = mgr.build_repository(repo_root, metrics=good)
print("admitted:", result.get("admitted"))
for dirpath, _, files in os.walk(repo_root):
    for f in files:
        print("  ", os.path.relpath(os.path.join(dirpath, f), repo_root))

# %% [markdown]
# ## Health-check rollup (model / device / latency / API probes)

# %%
from hvs_tpu.deployment import HealthChecker

checker = HealthChecker(engine, api_url=f"http://127.0.0.1:{PORT}")
report = checker.run_checks()
for check in report["checks"]:
    print(f"{check['name']:>16}: {check['status']}  {check['message'][:60]}")
print("overall:", report["status"])

# %%
loop.call_soon_threadsafe(loop.stop)
print("done")
