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
from .cloud_codegen import CloudDeployConfig, generate as generate_cloud_bundle
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
    "CloudDeployConfig", "generate_cloud_bundle",
    "HealthChecker", "HealthStatus", "CheckResult",
    "ModelHealthChecker", "SystemHealthChecker", "APIChecker",
]
