"""Deployment tests: live REST server, live gRPC server, export round-trip,
health checks (behavioral spec: reference src/tests/test_deployment.py — but
against REAL running servers instead of mocks)."""

import base64
import json
import threading
import time

import numpy as np
import pytest

from hvs_tpu.deployment import (
    APIChecker,
    HealthChecker,
    HealthStatus,
    ModelExporter,
    ModelServerManager,
    RegistryGate,
    RobotGRPCServer,
    RobotVisionClient,
    ServingModelConfig,
    VisionAPIServer,
)
from tests.test_inference import tiny_inference_config, tiny_model_config


@pytest.fixture(scope="module")
def engine(shared_engine):
    return shared_engine


def _jpeg_bytes(seed=0, h=64, w=64) -> bytes:
    import cv2

    img = np.random.default_rng(seed).integers(0, 255, (h, w, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


# ---------------- REST API (reference test_deployment.py:221-317) -----------


@pytest.fixture(scope="module")
def api_client(engine):
    """Run the aiohttp app with a test server on a background loop."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    server = VisionAPIServer(engine)
    loop = asyncio.new_event_loop()

    client_holder = {}

    def run():
        asyncio.set_event_loop(loop)

        async def setup():
            client = TestClient(TestServer(server.app), loop=loop)
            await client.start_server()
            return client

        client_holder["client"] = loop.run_until_complete(setup())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        if "client" in client_holder:
            break
        time.sleep(0.1)
    client = client_holder["client"]

    def call(coro):
        return asyncio.run_coroutine_threadsafe(coro, loop).result(timeout=120)

    yield client, call
    call(client.close())
    loop.call_soon_threadsafe(loop.stop)
    server.shutdown()


def test_api_detect_base64(api_client):
    client, call = api_client
    b64 = base64.b64encode(_jpeg_bytes()).decode()

    async def go():
        resp = await client.post("/detect", json={"image_base64": b64})
        return resp.status, await resp.json()

    status, body = call(go())
    assert status == 200
    assert "detections" in body and "latency_ms" in body
    assert body["image_size"] == [64, 64]


def test_api_detect_multipart(api_client):
    client, call = api_client
    import aiohttp

    async def go():
        form = aiohttp.FormData()
        form.add_field("file", _jpeg_bytes(1), filename="a.jpg",
                       content_type="image/jpeg")
        resp = await client.post("/detect", data=form)
        return resp.status, await resp.json()

    status, body = call(go())
    assert status == 200
    assert isinstance(body["detections"], list)


def test_api_fast_429_before_decode_when_queue_full(api_client, engine):
    """Admission control at the edge: with the micro-batcher's bounded queue
    full, /detect must return 429 from the fast path (before reading the
    body) — the predicate is engine.accepting() (round-3 overload fix)."""
    from hvs_tpu.inference.engine import _MicroBatcher

    client, call = api_client
    b64 = base64.b64encode(_jpeg_bytes()).decode()

    batcher = _MicroBatcher(engine)  # loop NOT started: queue never drains
    batcher.queue.maxsize = 1
    batcher.queue.put_nowait((None, None))
    assert not engine.accepting() or engine._batcher is None

    engine._batcher = batcher
    try:
        assert not engine.accepting()

        async def go():
            resp = await client.post("/detect", json={"image_base64": b64})
            return resp.status, resp.headers.get("Retry-After")

        status, retry_after = call(go())
        assert status == 429
        assert retry_after == "1"
    finally:
        engine._batcher = None

    # With no batcher the endpoint serves synchronously again.
    async def ok():
        resp = await client.post("/detect", json={"image_base64": b64})
        return resp.status

    assert call(ok()) == 200


def test_api_detect_no_image_is_400(api_client):
    client, call = api_client

    async def go():
        resp = await client.post("/detect", json={})
        return resp.status

    assert call(go()) == 400


def test_api_detect_batch(api_client):
    client, call = api_client
    images = [base64.b64encode(_jpeg_bytes(i)).decode() for i in range(2)]

    async def go():
        resp = await client.post("/detect/batch", json={"images_base64": images})
        return resp.status, await resp.json()

    status, body = call(go())
    assert status == 200
    assert len(body["results"]) == 2


def test_api_health_and_metrics(api_client):
    client, call = api_client

    async def go():
        h = await client.get("/health")
        m = await client.get("/metrics")
        return h.status, await h.json(), m.status, await m.text()

    hs, hbody, ms, mtext = call(go())
    assert hs == 200 and hbody["status"] == "healthy"
    assert ms == 200 and "hvs_requests_total" in mtext


def test_api_models_endpoint(api_client):
    client, call = api_client

    async def go():
        resp = await client.get("/models")
        return resp.status, await resp.json()

    status, body = call(go())
    assert status == 200
    assert body["current"]["image_size"] == 64


def test_api_model_switch_bad_path(api_client):
    client, call = api_client

    async def go():
        resp = await client.post("/models/switch",
                                 json={"checkpoint_path": "/nonexistent"})
        return resp.status

    assert call(go()) == 400


def test_api_mjpeg_stream(api_client):
    client, call = api_client

    async def go():
        resp = await client.get("/stream/synthetic?max_frames=2")
        body = await resp.content.read()
        return resp.status, body

    status, body = call(go())
    assert status == 200
    assert body.count(b"--frame") >= 2


# ---------------- gRPC (reference test_deployment.py gRPC section) ----------


@pytest.fixture(scope="module")
def grpc_pair(engine):
    server = RobotGRPCServer(engine, host="127.0.0.1", port=0)
    port = server.start()
    client = RobotVisionClient(f"127.0.0.1:{port}")
    yield server, client
    client.close()
    server.stop()


def test_grpc_detect_single(grpc_pair):
    _, client = grpc_pair
    resp = client.detect(_jpeg_bytes(3), request_id="r1")
    assert resp.request_id == "r1"
    assert resp.image_height == 64 and resp.image_width == 64
    assert resp.error == ""


def test_grpc_detect_bad_image(grpc_pair):
    _, client = grpc_pair
    resp = client.detect(b"not an image")
    assert resp.error != ""


def test_grpc_detect_batch_stream(grpc_pair):
    _, client = grpc_pair
    responses = list(client.detect_batch(iter([_jpeg_bytes(4), _jpeg_bytes(5)])))
    assert len(responses) == 2


def test_grpc_commands(grpc_pair):
    _, client = grpc_pair
    assert client.command("ping").message == "pong"
    status = client.command("get_status")
    assert status.success and "requests_served" in status.data
    resp = client.command("nonsense")
    assert not resp.success


# ---------------- export ----------------------------------------------------


def test_export_weights_and_reload(engine, tmp_path):
    exporter = ModelExporter(engine.model, engine.variables, image_size=64)
    path = exporter.export_weights(str(tmp_path / "weights.msgpack"))
    loaded = engine.load_checkpoint(path)
    assert "params" in loaded


@pytest.mark.slow
@pytest.mark.heavy
def test_export_stablehlo_consistency(engine, tmp_path):
    exporter = ModelExporter(engine.model, engine.variables, image_size=64)
    path = exporter.export_stablehlo(str(tmp_path / "model.stablehlo"))
    report = exporter.consistency_check(path)
    assert report["consistent"], report


def test_serving_manifest(engine, tmp_path):
    mgr = ModelServerManager(engine, ServingModelConfig(image_size=64))
    root = mgr.build_repository(str(tmp_path / "repo"))
    manifest = json.loads(
        (tmp_path / "repo" / "hybrid_vision" / "manifest.json").read_text()
    )
    assert manifest["input"]["shape"] == [-1, 64, 64, 3]
    assert (tmp_path / "repo" / "hybrid_vision" / "1" / "weights.msgpack").exists()


# ---------------- health -----------------------------------------------------


def test_health_checker_rollup(engine):
    hc = HealthChecker(engine=engine)
    report = hc.run_checks()
    assert report["status"] in ("healthy", "warning", "critical")
    names = {c["name"] for c in report["checks"]}
    assert {"model_loaded", "cpu", "memory", "disk"} <= names
    text = hc.format_report(report)
    assert "overall" in text


def test_health_api_checker_unreachable():
    checker = APIChecker("http://127.0.0.1:1")  # nothing listens there
    results = checker.check()
    assert all(r.status == HealthStatus.CRITICAL for r in results)


def test_health_monitoring_thread(engine):
    hc = HealthChecker(engine=engine)
    reports = []
    hc.start_monitoring(interval_s=0.1, on_report=reports.append)
    time.sleep(0.35)
    hc.stop_monitoring()
    assert len(reports) >= 2
    assert len(hc.history) >= 2


# ---------------- model repository + admission gates -------------------------


def test_registry_gate_thresholds():
    gate = RegistryGate("configs/model_registry.yaml")
    ok, why = gate.admit(
        {"map_50": 0.9, "latency_ms": 10, "precision": 0.95, "recall": 0.9,
         "ds_error": 1e-4, "max_eigenvalue": 0.99}
    )
    assert ok, why
    bad, why = gate.admit({"map_50": 0.5, "latency_ms": 10})
    assert not bad
    assert any("min_map_50" in r for r in why)
    slow_, why = gate.admit({"map_50": 0.9, "latency_ms": 500})
    assert not slow_
    assert any("max_latency_ms" in r for r in why)


def test_repository_versioning_and_gated_load(engine, tmp_path):
    """export -> repository -> health-gated load (reference Triton repo
    builder + registry gates, model_server.py:327-467)."""
    root = str(tmp_path / "repo")
    mgr = ModelServerManager(
        engine, ServingModelConfig(image_size=64),
        gate=RegistryGate("configs/model_registry.yaml"),
    )
    good = {"map_50": 0.9, "latency_ms": 8.0, "precision": 0.95, "recall": 0.9,
            "ds_error": 1e-4, "max_eigenvalue": 0.99}
    bad = dict(good, map_50=0.4)

    r1 = mgr.build_repository(root, version=1, metrics=good)
    assert r1["admitted"], r1
    r2 = mgr.build_repository(root, version=2, metrics=bad)
    assert not r2["admitted"]
    assert any("min_map_50" in f for f in r2["failures"])

    # config.pbtxt carries the dynamic-batching preferences.
    pbtxt = (tmp_path / "repo" / "hybrid_vision" / "config.pbtxt").read_text()
    assert "dynamic_batching" in pbtxt and "preferred_batch_size" in pbtxt

    # Latest ADMITTED version is 1 (2 failed its gates) and loads fine.
    assert ModelServerManager.latest_admitted(root, "hybrid_vision") == 1
    assert mgr.load_from_repository(root) == 1

    # Loading the rejected version explicitly is refused.
    with pytest.raises(RuntimeError, match="not admitted"):
        mgr.load_from_repository(root, version=2)
