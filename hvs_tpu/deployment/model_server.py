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


def _config_pbtxt(cfg: "ServingModelConfig") -> str:
    """Triton-style textproto serving config (reference generates config.pbtxt
    with dynamic_batching + instance groups, model_server.py:336-398). Here the
    instance group targets TPU."""
    preferred = ", ".join(str(b) for b in cfg.batch_buckets)
    return f"""name: "{cfg.name}"
platform: "jax_stablehlo"
max_batch_size: {max(cfg.batch_buckets)}
input [
  {{
    name: "images"
    data_type: TYPE_UINT8
    dims: [ {cfg.image_size}, {cfg.image_size}, 3 ]
  }}
]
output [
  {{ name: "boxes" data_type: TYPE_FP32 dims: [ -1, 4 ] }},
  {{ name: "scores" data_type: TYPE_FP32 dims: [ -1 ] }},
  {{ name: "classes" data_type: TYPE_INT32 dims: [ -1 ] }},
  {{ name: "num_valid" data_type: TYPE_INT32 dims: [ 1 ] }}
]
dynamic_batching {{
  preferred_batch_size: [ {preferred} ]
  max_queue_delay_microseconds: {int(cfg.max_queue_delay_ms * 1000)}
}}
instance_group [
  {{ count: 1 kind: KIND_MODEL }}
]
"""


class RegistryGate:
    """Serving admission gates from configs/model_registry.yaml
    (reference: configs/model_registry.yaml:22-27 — min mAP 0.75, max
    latency 50 ms, precision/recall floors; extended with the mHC
    constraint-health gates)."""

    DEFAULTS = {
        "min_map_50": 0.75,
        "max_latency_ms": 50.0,
        "min_precision": 0.8,
        "min_recall": 0.7,
        "max_ds_error": 1e-3,
        "max_eigenvalue": 1.0,
    }

    def __init__(self, registry_yaml: Optional[str] = None,
                 gates: Optional[Dict[str, float]] = None):
        self.gates = dict(self.DEFAULTS)
        self.keep_last = 5
        if registry_yaml and os.path.exists(registry_yaml):
            import yaml

            with open(registry_yaml) as f:
                doc = yaml.safe_load(f) or {}
            self.gates.update(doc.get("admission_gates", {}))
            self.keep_last = int(doc.get("promotion", {}).get("keep_last", 5))
        if gates:
            self.gates.update(gates)

    def admit(self, metrics: Dict[str, float]) -> Tuple[bool, List[str]]:
        """Check candidate metrics against every gate; returns (ok, reasons)."""
        failures = []
        checks = [
            ("map_50", "min_map_50", lambda v, g: v >= g),
            ("latency_ms", "max_latency_ms", lambda v, g: v <= g),
            ("precision", "min_precision", lambda v, g: v >= g),
            ("recall", "min_recall", lambda v, g: v >= g),
            ("ds_error", "max_ds_error", lambda v, g: v <= g),
            ("max_eigenvalue", "max_eigenvalue", lambda v, g: v <= g),
        ]
        for metric, gate, ok in checks:
            if gate in self.gates and metric in metrics:
                if not ok(float(metrics[metric]), float(self.gates[gate])):
                    failures.append(
                        f"{metric}={metrics[metric]:.4g} fails {gate}={self.gates[gate]}"
                    )
        return (not failures, failures)


class ModelServerManager:
    """Backend dispatch + versioned model repository with health-gated
    admission (reference: ModelServerManager, model_server.py:400-631;
    Triton repo builder :327-467)."""

    def __init__(self, engine, config: ServingModelConfig = ServingModelConfig(),
                 gate: Optional[RegistryGate] = None):
        self.engine = engine
        self.config = config
        self.gate = gate or RegistryGate()
        self.rest_runner = None
        self.grpc_server = None

    # ------------------------------------------------------------------
    def build_repository(
        self,
        root: str,
        version: int = 1,
        metrics: Optional[Dict[str, float]] = None,
        savedmodel: bool = False,
        stablehlo: bool = False,
    ) -> Dict[str, Any]:
        """Versioned TF-Serving/Triton-style repository:

            root/<name>/config.pbtxt              serving config (dyn batching)
            root/<name>/manifest.json             io schema
            root/<name>/<version>/weights.msgpack the deployable weights
            root/<name>/<version>/model.stablehlo portable AOT artifact (opt)
            root/<name>/<version>/model.savedmodel/ TF SavedModel (opt)
            root/<name>/<version>/metrics.json + ADMITTED admission record

        Admission is gated on the registry thresholds: a version whose
        candidate metrics fail any gate is written but NOT admitted, and
        ``load_from_repository`` refuses to serve it.
        """
        name_dir = os.path.join(root, self.config.name)
        model_dir = os.path.join(name_dir, str(version))
        os.makedirs(model_dir, exist_ok=True)
        with open(os.path.join(name_dir, "config.pbtxt"), "w") as f:
            f.write(_config_pbtxt(self.config))
        with open(os.path.join(name_dir, "manifest.json"), "w") as f:
            json.dump(self.config.to_manifest(), f, indent=2)

        exporter = ModelExporter(
            self.engine.model, self.engine.variables, self.config.image_size
        )
        exporter.export_weights(os.path.join(model_dir, "weights.msgpack"))
        if stablehlo:
            exporter.export_stablehlo(os.path.join(model_dir, "model.stablehlo"))
        if savedmodel:
            exporter.export_savedmodel(os.path.join(model_dir, "model.savedmodel"))

        admitted, failures = (True, [])
        if metrics is not None:
            admitted, failures = self.gate.admit(metrics)
            with open(os.path.join(model_dir, "metrics.json"), "w") as f:
                json.dump(metrics, f, indent=2, default=float)
        marker = os.path.join(model_dir, "ADMITTED")
        if admitted:
            with open(marker, "w") as f:
                json.dump({"time": time.time(), "gates": self.gate.gates}, f)
        elif os.path.exists(marker):
            os.remove(marker)
        self._prune_versions(name_dir)
        return {
            "root": root, "version": version, "admitted": admitted,
            "failures": failures, "path": model_dir,
        }

    def _prune_versions(self, name_dir: str) -> None:
        versions = sorted(
            (int(d) for d in os.listdir(name_dir) if d.isdigit()), reverse=True
        )
        for stale in versions[self.gate.keep_last:]:
            import shutil

            shutil.rmtree(os.path.join(name_dir, str(stale)), ignore_errors=True)

    # ------------------------------------------------------------------
    @staticmethod
    def latest_admitted(root: str, name: str) -> Optional[int]:
        name_dir = os.path.join(root, name)
        if not os.path.isdir(name_dir):
            return None
        versions = sorted(
            (int(d) for d in os.listdir(name_dir) if d.isdigit()), reverse=True
        )
        for v in versions:
            if os.path.exists(os.path.join(name_dir, str(v), "ADMITTED")):
                return v
        return None

    def load_from_repository(self, root: str, version: Optional[int] = None) -> int:
        """Hot-load an ADMITTED version into the live engine; refuses
        unadmitted versions (the health-gated load)."""
        from flax import serialization

        if version is None:
            version = self.latest_admitted(root, self.config.name)
            if version is None:
                raise RuntimeError("no admitted version in repository")
        model_dir = os.path.join(root, self.config.name, str(version))
        if not os.path.exists(os.path.join(model_dir, "ADMITTED")):
            raise RuntimeError(f"version {version} was not admitted for serving")
        with open(os.path.join(model_dir, "weights.msgpack"), "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        self.engine.reload({"params": restored["params"]})
        return version

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
