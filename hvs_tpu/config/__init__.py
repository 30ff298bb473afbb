"""Typed config system (reference: src/config/__init__.py:6-163)."""

from .base import (
    BaseConfig,
    Precision,
    DeviceType,
    detect_device,
    from_dict,
    merge_configs,
    load_config,
    create_default_configs,
)
from .model import (
    MHCConfig,
    BackboneConfig,
    ViTConfig,
    FusionConfig,
    DetectionHeadConfig,
    RAGConfig,
    QuantizationConfig,
    ModelConfig,
)
from .training import (
    DatasetConfig,
    AugmentationConfig,
    OptimizerConfig,
    SchedulerConfig,
    LossConfig,
    DistributedConfig,
    TrainingConfig,
)
from .inference import (
    PreprocessingConfig,
    PostprocessingConfig,
    VisualizationConfig,
    APIConfig,
    GRPCConfig,
    PerformanceConfig,
    InferenceConfig,
)

__all__ = [
    "BaseConfig", "Precision", "DeviceType", "detect_device", "from_dict",
    "merge_configs", "load_config", "create_default_configs",
    "MHCConfig", "BackboneConfig", "ViTConfig", "FusionConfig",
    "DetectionHeadConfig", "RAGConfig", "QuantizationConfig", "ModelConfig",
    "DatasetConfig", "AugmentationConfig", "OptimizerConfig", "SchedulerConfig",
    "LossConfig", "DistributedConfig", "TrainingConfig",
    "PreprocessingConfig", "PostprocessingConfig", "VisualizationConfig",
    "APIConfig", "GRPCConfig", "PerformanceConfig", "InferenceConfig",
]
