"""Model export and serving management.

TPU-native rebuild of the reference export/serving layer
(reference: src/deployment/model_server.py:48-705). The reference exports
TorchScript/ONNX/TensorRT and manages Triton/TorchServe; the TPU-native
equivalents are:

  * :class:`ModelExporter` —
      - ``export_stablehlo``: portable ahead-of-time artifact via ``jax.export``
        (the StableHLO bytecode runs on any XLA backend; replaces ONNX),
      - ``export_savedmodel``: TF SavedModel via jax2tf (replaces TorchScript),
      - ``export_weights``: flax msgpack weight artifact,
      - with an original-vs-exported consistency check (reference
        scripts/export_model.py:341-360, rtol 1e-3).
  * :class:`ServingModelConfig` — serving shape/batching descriptor
    (reference :48-75).
  * :class:`ModelServerManager` — backend dispatch: in-process REST/gRPC
    servers replace the Triton/TorchServe subprocess management (reference
    :327-631); generates a serving manifest instead of config.pbtxt.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class ServingModelConfig:
    """(reference: model_server.py:48-75)"""

    name: str = "hybrid_vision"
    image_size: int = 640
    batch_buckets: Tuple[int, ...] = (1, 2, 4, 8)
    precision: str = "bf16"
    max_queue_delay_ms: float = 10.0

    def to_manifest(self) -> Dict[str, Any]:
        """Serving manifest (replaces Triton config.pbtxt generation,
        reference :327-398)."""
        return {
            "name": self.name,
            "input": {"shape": [-1, self.image_size, self.image_size, 3],
                      "dtype": "uint8"},
            "outputs": ["boxes", "scores", "classes", "num_valid"],
            "dynamic_batching": {
                "preferred_batch_sizes": list(self.batch_buckets),
                "max_queue_delay_ms": self.max_queue_delay_ms,
            },
            "precision": self.precision,
        }


class ModelExporter:
    """(reference: ModelExporter, model_server.py:119-262)"""

    def __init__(self, model, variables, image_size: int = 640):
        self.model = model
        self.variables = variables
        self.image_size = image_size

    def _serve_fn(self):
        import jax.numpy as jnp

        from ..models.yolo_head import postprocess_detections

        def serve(images):
            x = images.astype(jnp.float32) / 255.0
            out = self.model.apply(self.variables, x, task="detection")
            det = postprocess_detections(out["detection"])
            return det.boxes, det.scores, det.classes

        return serve

    # ------------------------------------------------------------------
    def export_stablehlo(self, path: str, batch: int = 1) -> str:
        """Portable StableHLO artifact via jax.export (replaces ONNX export,
        reference :145-189)."""
        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        fn = jax.jit(self._serve_fn())
        spec = jax.ShapeDtypeStruct((batch, self.image_size, self.image_size, 3),
                                    jnp.uint8)
        exported = jexport.export(fn)(spec)
        blob = exported.serialize()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
        return path

    @staticmethod
    def load_stablehlo(path: str):
        from jax import export as jexport

        with open(path, "rb") as f:
            return jexport.deserialize(f.read())

    # ------------------------------------------------------------------
    def export_savedmodel(self, path: str, batch: int = 1) -> Optional[str]:
        """TF SavedModel via jax2tf (replaces TorchScript trace, reference
        :119-143). Gated on tensorflow availability."""
        try:
            import tensorflow as tf
            from jax.experimental import jax2tf
        except Exception:
            return None

        serve = self._serve_fn()
        tf_fn = tf.function(
            jax2tf.convert(serve, with_gradient=False),
            input_signature=[
                tf.TensorSpec([batch, self.image_size, self.image_size, 3], tf.uint8)
            ],
            autograph=False,
        )
        module = tf.Module()
        module.serve = tf_fn
        tf.saved_model.save(module, path)
        return path

    # ------------------------------------------------------------------
    def export_weights(self, path: str) -> str:
        """flax msgpack weights (the training<->serving interchange format)."""
        from flax import serialization

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes({"params": self.variables["params"]}))
        return path

    # ------------------------------------------------------------------
    def consistency_check(self, exported_path: str, rtol: float = 1e-3,
                          batch: int = 1) -> Dict[str, Any]:
        """Original vs exported output comparison
        (reference: scripts/export_model.py:341-360)."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        x = rng.integers(0, 255, (batch, self.image_size, self.image_size, 3),
                         np.uint8)
        original = jax.jit(self._serve_fn())(jnp.asarray(x))
        exported = self.load_stablehlo(exported_path)
        restored = exported.call(jnp.asarray(x))
        max_diff = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
            for a, b in zip(original, restored)
        )
        ok = bool(
            all(
                np.allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                            rtol=rtol, atol=1e-4)
                for a, b in zip(original, restored)
            )
        )
        return {"consistent": ok, "max_abs_diff": max_diff}


class ModelServerManager:
    """Backend dispatch + model repository management
    (reference: ModelServerManager, model_server.py:400-631)."""

    def __init__(self, engine, config: ServingModelConfig = ServingModelConfig()):
        self.engine = engine
        self.config = config
        self.rest_runner = None
        self.grpc_server = None

    def build_repository(self, root: str) -> str:
        """Model repo layout + manifest (replaces Triton repo builder)."""
        model_dir = os.path.join(root, self.config.name, "1")
        os.makedirs(model_dir, exist_ok=True)
        with open(os.path.join(root, self.config.name, "manifest.json"), "w") as f:
            json.dump(self.config.to_manifest(), f, indent=2)
        exporter = ModelExporter(
            self.engine.model, self.engine.variables, self.config.image_size
        )
        exporter.export_weights(os.path.join(model_dir, "weights.msgpack"))
        return root

    def start(self, backend: str = "rest", host: str = "0.0.0.0",
              port: Optional[int] = None) -> Any:
        """Launch a serving backend in-process (reference backend dispatch
        :490-520)."""
        if backend == "rest":
            from .api_server import VisionAPIServer

            return VisionAPIServer(self.engine)
        if backend == "grpc":
            from .grpc_server import RobotGRPCServer

            self.grpc_server = RobotGRPCServer(
                self.engine, host=host, port=port or 50051
            )
            self.grpc_server.start()
            return self.grpc_server
        raise ValueError(f"unknown backend: {backend!r}")

    def stop(self) -> None:
        if self.grpc_server is not None:
            self.grpc_server.stop()
            self.grpc_server = None
