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
    "enable_compile_cache",
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

def enable_compile_cache(path: str = ".jax_cache") -> None:
    """Enable JAX's persistent compilation cache (saves minutes per process
    on this host; every entry point should call it before the first jit)."""
    import os

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # cache is an optimization only
