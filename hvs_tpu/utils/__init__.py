"""Observability utilities (reference: src/utils/__init__.py:13-58)."""

from .logging import StructuredLogger, setup_logger
from .metrics import DetectionEvaluator, StabilityMetrics, InferenceMetrics
from .profiler import (
    ModelProfiler,
    InferenceProfiler,
    ResourceMonitor,
    ProfileReport,
)

__all__ = [
    "StructuredLogger",
    "setup_logger",
    "DetectionEvaluator",
    "StabilityMetrics",
    "InferenceMetrics",
    "ModelProfiler",
    "InferenceProfiler",
    "ResourceMonitor",
    "ProfileReport",
]
