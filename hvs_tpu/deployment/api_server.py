"""REST API server: same endpoint surface as the reference FastAPI app.

TPU-native rebuild of the reference REST layer
(reference: src/deployment/api_server.py:46-736). FastAPI is absent in this
environment; the server is built on aiohttp with pydantic request/response
models and the same endpoints:

  * POST /detect            (multipart file | base64 JSON | URL) (:276-347)
  * POST /detect/batch      (sync or background, results to JSON file) (:349-410)
  * GET  /health            (:412-425)
  * GET  /metrics           Prometheus exposition (:427-458,:46-62)
  * GET  /models, POST /models/switch   hot model swap (:460-523)
  * GET  /stream/{camera_id}  MJPEG live-detection stream (:525-580)

Middleware: request counting/latency histograms (Prometheus) and CORS headers
(:185-254). Inference runs in a thread pool so the event loop stays free
(:302-309).
"""

from __future__ import annotations

import asyncio
import base64
import json
import os
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional

import numpy as np
from pydantic import BaseModel, Field


# ---------------- pydantic schemas (reference: api_server.py:64-117) --------


class DetectRequestModel(BaseModel):
    image_base64: Optional[str] = None
    image_url: Optional[str] = None
    score_threshold: Optional[float] = Field(None, ge=0.0, le=1.0)
    return_annotated: bool = False


class DetectionModel(BaseModel):
    box: List[float]
    score: float
    class_id: int
    class_name: str


class DetectionResponseModel(BaseModel):
    detections: List[DetectionModel]
    latency_ms: float
    image_size: List[int]
    request_id: str
    annotated_image_base64: Optional[str] = None


# ---------------- server ----------------------------------------------------


class VisionAPIServer:
    """(reference: VisionAPIServer, api_server.py:119-710)"""

    def __init__(self, engine, config=None, enable_cors: bool = True,
                 results_dir: str = "batch_results"):
        from aiohttp import web

        self.engine = engine
        self.config = config
        self.results_dir = results_dir
        self.enable_cors = enable_cors
        self.executor = ThreadPoolExecutor(max_workers=2)
        self.started_at = time.time()
        self.request_count = 0
        self.error_count = 0
        self._background_jobs: Dict[str, str] = {}
        self._cameras: Dict[str, Any] = {}

        self._init_prometheus()

        @web.middleware
        async def tracking_middleware(request, handler):
            t0 = time.perf_counter()
            self.request_count += 1
            try:
                response = await handler(request)
                status = response.status
            except Exception:
                self.error_count += 1
                status = 500
                raise
            finally:
                if self.registry:
                    self.req_counter.labels(request.path, str(status)).inc()
                    self.latency_hist.labels(request.path).observe(
                        time.perf_counter() - t0
                    )
            if self.enable_cors:
                response.headers["Access-Control-Allow-Origin"] = "*"
            response.headers["X-Process-Time-Ms"] = (
                f"{(time.perf_counter() - t0) * 1e3:.2f}"
            )
            return response

        self.app = web.Application(
            middlewares=[tracking_middleware], client_max_size=32 * 2**20
        )
        self.app.router.add_post("/detect", self.handle_detect)
        self.app.router.add_post("/detect/batch", self.handle_detect_batch)
        self.app.router.add_get("/health", self.handle_health)
        self.app.router.add_get("/metrics", self.handle_metrics)
        self.app.router.add_get("/models", self.handle_models)
        self.app.router.add_post("/models/switch", self.handle_model_switch)
        self.app.router.add_get("/stream/{camera_id}", self.handle_stream)
        self.app.router.add_get("/batch_results/{job_id}", self.handle_batch_result)
        self.app.on_startup.append(self._on_startup)

    # ---------------- prometheus (reference :46-62) ----------------
    def _init_prometheus(self):
        try:
            from prometheus_client import Counter, Histogram, CollectorRegistry

            self.registry = CollectorRegistry()
            self.req_counter = Counter(
                "hvs_requests_total", "Total API requests", ["endpoint", "status"],
                registry=self.registry,
            )
            self.latency_hist = Histogram(
                "hvs_request_latency_seconds", "Request latency", ["endpoint"],
                registry=self.registry,
            )
            self.det_counter = Counter(
                "hvs_detections_total", "Total detections returned",
                registry=self.registry,
            )
        except Exception:
            self.registry = None

    async def _on_startup(self, app):
        """Warmup on startup (reference :675-697): every letterboxed bucket
        plus the raw-frame programs for any configured camera shapes."""
        loop = asyncio.get_event_loop()
        shapes = self.engine.config.performance.warmup_raw_shapes
        await loop.run_in_executor(
            self.executor, lambda: self.engine.warmup(src_shapes=shapes)
        )

    # ---------------- image extraction (reference :582-614) ----------------
    async def _get_image(self, request) -> Optional[np.ndarray]:
        # decode_jpeg picks a DCT-domain reduced decode when the source is
        # >=2x the letterbox target (hvs_tpu/inference/preprocessing.py) —
        # same pixels after letterbox, less host time on this 1-core VM.
        from ..inference.preprocessing import decode_jpeg

        ctype = request.headers.get("Content-Type", "")
        if "multipart" in ctype:
            reader = await request.multipart()
            async for part in reader:
                if part.name in ("file", "image"):
                    data = await part.read()
                    return decode_jpeg(data, self.engine.image_size)
            return None
        body = await request.json()
        req = DetectRequestModel(**body)
        if req.image_base64:
            data = base64.b64decode(req.image_base64)
            return decode_jpeg(data, self.engine.image_size)
        if req.image_url:
            import aiohttp

            async with aiohttp.ClientSession() as session:
                async with session.get(req.image_url) as resp:
                    data = await resp.read()
            return decode_jpeg(data, self.engine.image_size)
        return None

    def _detect_sync(self, image: np.ndarray):
        # Route through the micro-batcher when running (admission control +
        # cross-request batching); fall back to direct inference otherwise.
        if getattr(self.engine, "_batcher", None) is not None:
            return self.engine.submit(image).result()
        return self.engine.infer(image)

    def _response_for(self, det, request_id: str, annotated: Optional[str] = None
                      ) -> Dict[str, Any]:
        if self.registry:
            self.det_counter.inc(len(det))
        return DetectionResponseModel(
            detections=[
                DetectionModel(
                    box=[float(v) for v in det.boxes[i]],
                    score=float(det.scores[i]),
                    class_id=int(det.classes[i]),
                    class_name=det.class_names[i],
                )
                for i in range(len(det))
            ],
            latency_ms=det.latency_ms,
            image_size=list(det.image_size),
            request_id=request_id,
            annotated_image_base64=annotated,
        ).model_dump()

    # ---------------- endpoints ----------------
    async def handle_detect(self, request):
        """(reference :276-347)"""
        from aiohttp import web

        from ..inference.engine import EngineOverloaded

        # Fast-429 BEFORE body read/decode: when the micro-batcher's bounded
        # queue is full, shedding must not cost per-request decode work on
        # the host (engine.accepting() is the same predicate submit() uses).
        if self.engine._batcher is not None and not self.engine.accepting():
            return web.json_response(
                {"error": "overloaded", "detail": "admission queue full"},
                status=429, headers={"Retry-After": "1"},
            )
        image = await self._get_image(request)
        if image is None:
            return web.json_response({"error": "no image provided"}, status=400)
        loop = asyncio.get_event_loop()

        try:
            det = await loop.run_in_executor(
                self.executor, self._detect_sync, image
            )
        except EngineOverloaded as e:
            # Admission control: bounded queue full -> shed at the edge with
            # Retry-After instead of queueing into SLA-violating latency.
            return web.json_response(
                {"error": "overloaded", "detail": str(e)},
                status=429, headers={"Retry-After": "1"},
            )

        annotated_b64 = None
        want_annotated = request.query.get("annotated") == "1"
        if want_annotated:
            import cv2

            from ..inference.visualizer import DetectionVisualizer

            vis = DetectionVisualizer(class_names=self.engine.class_names)
            drawn = vis.draw_detections(image, det.boxes, det.scores, det.classes)
            ok, buf = cv2.imencode(".jpg", drawn)
            if ok:
                annotated_b64 = base64.b64encode(buf.tobytes()).decode()
        return web.json_response(
            self._response_for(det, str(uuid.uuid4()), annotated_b64)
        )

    async def handle_detect_batch(self, request):
        """(reference :349-410,:646-673) — sync list response or background job."""
        from aiohttp import web

        body = await request.json()
        images_b64 = body.get("images_base64", [])
        if not images_b64:
            return web.json_response({"error": "images_base64 required"}, status=400)
        import cv2

        images = []
        for b64 in images_b64:
            arr = np.frombuffer(base64.b64decode(b64), np.uint8)
            img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
            if img is None:
                return web.json_response({"error": "undecodable image"}, status=400)
            images.append(img)

        loop = asyncio.get_event_loop()
        if body.get("background"):
            job_id = str(uuid.uuid4())
            os.makedirs(self.results_dir, exist_ok=True)
            path = os.path.join(self.results_dir, f"{job_id}.json")
            self._background_jobs[job_id] = path

            def run_job():
                results = self.engine.infer_batch(images)
                with open(path, "w") as f:
                    json.dump([r.to_dict() for r in results], f)

            loop.run_in_executor(self.executor, run_job)
            return web.json_response({"job_id": job_id, "status": "processing"})

        results = await loop.run_in_executor(
            self.executor, self.engine.infer_batch, images
        )
        return web.json_response(
            {"results": [self._response_for(r, str(i)) for i, r in enumerate(results)]}
        )

    async def handle_batch_result(self, request):
        from aiohttp import web

        job_id = request.match_info["job_id"]
        path = self._background_jobs.get(job_id)
        if path is None:
            return web.json_response({"error": "unknown job"}, status=404)
        if not os.path.exists(path):
            return web.json_response({"job_id": job_id, "status": "processing"})
        with open(path) as f:
            return web.json_response({"job_id": job_id, "status": "done",
                                      "results": json.load(f)})

    async def handle_health(self, request):
        """(reference :412-425)"""
        from aiohttp import web

        stats = self.engine.get_performance_stats()
        healthy = stats.get("error_rate", 0.0) < 0.5
        return web.json_response(
            {
                "status": "healthy" if healthy else "degraded",
                "uptime_s": time.time() - self.started_at,
                "requests": self.request_count,
                "errors": self.error_count,
                "model_loaded": self.engine.variables is not None,
            },
            status=200 if healthy else 503,
        )

    async def handle_metrics(self, request):
        """(reference :427-458)"""
        from aiohttp import web

        if self.registry is None:
            return web.json_response(self.engine.get_performance_stats())
        from prometheus_client import generate_latest

        return web.Response(
            body=generate_latest(self.registry),
            content_type="text/plain",
        )

    async def handle_models(self, request):
        """(reference :460-487)"""
        from aiohttp import web

        return web.json_response(
            {
                "current": {
                    "num_classes": len(self.engine.class_names),
                    "image_size": self.engine.image_size,
                    "stability": self.engine.get_stability_report(),
                },
            }
        )

    async def handle_model_switch(self, request):
        """Hot model swap (reference :489-523)."""
        from aiohttp import web

        body = await request.json()
        path = body.get("checkpoint_path")
        if not path:
            return web.json_response({"error": "checkpoint_path required"}, status=400)
        loop = asyncio.get_event_loop()
        try:
            def swap():
                variables = self.engine.load_checkpoint(path)
                self.engine.reload(variables)

            await loop.run_in_executor(self.executor, swap)
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response({"status": "switched", "checkpoint": path})

    async def handle_stream(self, request):
        """MJPEG live-detection stream (reference :525-580)."""
        from aiohttp import web

        camera_id = request.match_info["camera_id"]
        from ..data.streaming import RoboticCameraStream, StreamConfig, StreamType

        if camera_id not in self._cameras:
            source: Any = camera_id
            stype = StreamType.SYNTHETIC
            if camera_id.isdigit():
                source, stype = int(camera_id), StreamType.USB
            stream = RoboticCameraStream(
                StreamConfig(source=source, stream_type=stype, target_fps=15.0,
                             name=f"api_{camera_id}")
            ).start()
            self._cameras[camera_id] = stream
        stream = self._cameras[camera_id]

        response = web.StreamResponse(
            status=200,
            headers={"Content-Type": "multipart/x-mixed-replace; boundary=frame"},
        )
        await response.prepare(request)
        import cv2

        from ..inference.visualizer import DetectionVisualizer

        vis = DetectionVisualizer(class_names=self.engine.class_names)
        loop = asyncio.get_event_loop()
        max_frames = int(request.query.get("max_frames", 0)) or None
        sent = 0
        try:
            while max_frames is None or sent < max_frames:
                frame = stream.read(timeout=2.0)
                if frame is None:
                    break
                det = await loop.run_in_executor(
                    self.executor, self._detect_sync, frame.image
                )
                drawn = vis.draw_detections(
                    frame.image, det.boxes, det.scores, det.classes
                )
                ok, buf = cv2.imencode(".jpg", drawn)
                if not ok:
                    continue
                await response.write(
                    b"--frame\r\nContent-Type: image/jpeg\r\n\r\n"
                    + buf.tobytes() + b"\r\n"
                )
                sent += 1
        except (ConnectionResetError, asyncio.CancelledError):
            pass
        return response

    # ---------------- lifecycle ----------------
    def shutdown(self) -> None:
        for stream in self._cameras.values():
            stream.stop()
        self._cameras.clear()
        self.executor.shutdown(wait=False)


def run_server(engine, host: str = "0.0.0.0", port: int = 8000, config=None) -> None:
    """Blocking runner (reference: run_server, api_server.py:712-734)."""
    from aiohttp import web

    server = VisionAPIServer(engine, config=config)
    try:
        web.run_app(server.app, host=host, port=port)
    finally:
        server.shutdown()
