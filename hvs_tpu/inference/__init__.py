"""Inference pipeline (reference: src/inference/__init__.py:17-48)."""

from .engine import InferenceEngine, AsyncInferenceEngine, Detections, EngineOverloaded
from .preprocessing import (
    ImagePreprocessor,
    PreprocessMode,
    PreprocessResult,
    VideoStreamer,
    CameraManager,
    CameraCalibration,
)
from .postprocessing import (
    DetectionPostprocessor,
    NMSFilter,
    DetectionTracker,
    AppearanceTracker,
    Track,
)
from .visualizer import (
    DetectionVisualizer,
    PerformanceMonitor,
    DebugVisualizer,
    class_palette,
)
from .robot_interface import (
    Protocol,
    RobotConfig,
    DetectionCommand,
    RobotCommand,
    RobotCommunication,
    SafetyMonitor,
    CommandHandler,
    commands_from_detections,
    encode_message,
    decode_message,
)
from .integration_demo import CompleteInferencePipeline

__all__ = [
    "InferenceEngine", "AsyncInferenceEngine",
    "EngineOverloaded", "Detections",
    "ImagePreprocessor", "PreprocessMode", "PreprocessResult",
    "VideoStreamer", "CameraManager", "CameraCalibration",
    "DetectionPostprocessor", "NMSFilter", "DetectionTracker",
    "AppearanceTracker", "Track",
    "DetectionVisualizer", "PerformanceMonitor", "DebugVisualizer",
    "class_palette",
    "Protocol", "RobotConfig", "DetectionCommand", "RobotCommand",
    "RobotCommunication", "SafetyMonitor", "CommandHandler",
    "commands_from_detections", "encode_message", "decode_message",
    "CompleteInferencePipeline",
]
