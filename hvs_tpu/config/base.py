"""Typed configuration system: dataclasses + YAML/JSON round-trip + merge.

TPU-native redesign of the reference config package
(reference: src/config/base_config.py:17-280, src/config/__init__.py:45-163).
Same surface — nested dataclasses with validation, YAML/JSON save/load,
hierarchical merge — with TPU-relevant fields (device auto-detect picks
tpu/cpu instead of cuda/mps; precision includes bf16 as the default).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import yaml


class Precision(str, enum.Enum):
    FP32 = "fp32"
    BF16 = "bf16"
    FP16 = "fp16"
    INT8 = "int8"


class DeviceType(str, enum.Enum):
    AUTO = "auto"
    TPU = "tpu"
    CPU = "cpu"


def detect_device() -> str:
    """Pick the best available backend (reference: base_config.py device
    AUTO-detect of cuda/mps/cpu — here tpu/cpu)."""
    try:
        import jax

        platform = jax.devices()[0].platform
        return "tpu" if platform not in ("cpu",) else "cpu"
    except Exception:
        return "cpu"


@dataclass
class BaseConfig:
    """Root experiment config (reference: src/config/base_config.py:17-280)."""

    seed: int = 42
    device: str = "auto"
    precision: str = Precision.BF16.value
    batch_size: int = 8
    gradient_accumulation_steps: int = 1
    output_dir: str = "outputs"
    checkpoint_dir: str = "checkpoints"
    log_dir: str = "logs"

    def __post_init__(self):
        if self.device == DeviceType.AUTO.value:
            self.device = detect_device()
        self.validate()

    def validate(self) -> None:
        assert self.batch_size >= 1, "batch_size must be >= 1"
        assert self.gradient_accumulation_steps >= 1
        assert self.precision in {p.value for p in Precision}, self.precision

    def create_directories(self) -> None:
        for d in (self.output_dir, self.checkpoint_dir, self.log_dir):
            os.makedirs(d, exist_ok=True)

    # ---------------- serialization ----------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        data = self.to_dict()
        with open(path, "w") as f:
            if path.endswith(".json"):
                json.dump(data, f, indent=2, default=str)
            else:
                yaml.safe_dump(data, f, sort_keys=False)

    @classmethod
    def load(cls, path: str):
        with open(path) as f:
            data = json.load(f) if path.endswith(".json") else yaml.safe_load(f)
        return from_dict(cls, data or {})

    def dtype(self):
        import jax.numpy as jnp

        return {
            "fp32": jnp.float32,
            "bf16": jnp.bfloat16,
            "fp16": jnp.float16,
            "int8": jnp.int8,
        }[self.precision]

    def display(self) -> str:
        lines = [f"{type(self).__name__}:"]
        for f_ in dataclasses.fields(self):
            lines.append(f"  {f_.name}: {getattr(self, f_.name)}")
        return "\n".join(lines)


def from_dict(cls, data: Dict[str, Any]):
    """Build a (possibly nested) dataclass from a plain dict, ignoring unknown
    keys (reference: load_config's tolerant construction)."""
    if not dataclasses.is_dataclass(cls):
        return data
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in (data or {}).items():
        if key not in fields:
            continue
        f = fields[key]
        ftype = f.type
        if isinstance(value, dict) and dataclasses.is_dataclass(_resolve(ftype)):
            kwargs[key] = from_dict(_resolve(ftype), value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def _resolve(tp):
    """Resolve string annotations to the class when possible."""
    if isinstance(tp, str):
        return None
    return tp


def merge_configs(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursive dict merge, override wins
    (reference: src/config/__init__.py:132-163)."""
    out = dict(base)
    for key, value in (override or {}).items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = merge_configs(out[key], value)
        else:
            out[key] = value
    return out


def load_config(path: str, config_type: Optional[str] = None):
    """Load any config file with auto type detection
    (reference: src/config/__init__.py:45-95)."""
    from .model import ModelConfig
    from .training import TrainingConfig
    from .inference import InferenceConfig

    with open(path) as f:
        data = json.load(f) if path.endswith(".json") else yaml.safe_load(f)
    data = data or {}
    if config_type is None:
        name = os.path.basename(path).lower()
        if "train" in name:
            config_type = "training"
        elif "infer" in name or "deploy" in name:
            config_type = "inference"
        elif "model" in name or "base" in name:
            config_type = "model"
        else:
            config_type = "base"
    mapping = {
        "base": BaseConfig,
        "model": ModelConfig,
        "training": TrainingConfig,
        "inference": InferenceConfig,
    }
    return from_dict(mapping[config_type], data)


def create_default_configs(directory: str) -> None:
    """Write default YAMLs (reference: src/config/__init__.py create_default_configs)."""
    from .model import ModelConfig
    from .training import TrainingConfig
    from .inference import InferenceConfig

    os.makedirs(directory, exist_ok=True)
    ModelConfig().save(os.path.join(directory, "model.yaml"))
    TrainingConfig().save(os.path.join(directory, "training.yaml"))
    InferenceConfig().save(os.path.join(directory, "inference.yaml"))
