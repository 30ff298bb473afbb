"""Deployment: REST/gRPC serving, export, health checks
(reference: src/deployment/__init__.py:17-26)."""

from .api_server import (
    VisionAPIServer,
    run_server,
    DetectRequestModel,
    DetectionModel,
    DetectionResponseModel,
)
from .grpc_server import (
    RobotVisionService,
    RobotGRPCServer,
    RobotVisionClient,
    SERVICE_NAME,
)
from .model_server import ModelExporter, ModelServerManager, RegistryGate, ServingModelConfig
from .health_check import (
    HealthChecker,
    HealthStatus,
    CheckResult,
    ModelHealthChecker,
    SystemHealthChecker,
    APIChecker,
)

__all__ = [
    "VisionAPIServer", "run_server",
    "DetectRequestModel", "DetectionModel", "DetectionResponseModel",
    "RobotVisionService", "RobotGRPCServer", "RobotVisionClient", "SERVICE_NAME",
    "ModelExporter", "ModelServerManager", "RegistryGate", "ServingModelConfig",
    "HealthChecker", "HealthStatus", "CheckResult",
    "ModelHealthChecker", "SystemHealthChecker", "APIChecker",
]
