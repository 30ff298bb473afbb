"""Cloud deployment code generation: full deployable bundles per provider.

TPU-native rebuild of the reference's cloud codegen
(reference: scripts/deploy.py:267-534 — SageMaker/Vertex/AzureML deployment
code for GPU images). The TPU-first targets are GCP (GKE TPU node pools,
Vertex AI TPU endpoints, bare Cloud TPU VMs); SageMaker/AzureML bundles are
still generated for parity — they deploy the exported SavedModel/StableHLO
artifact (scripts/export_model.py) on CPU/GPU instances, since neither cloud
offers TPUs.

Each ``generate_*`` emits a self-contained directory: manifests + a runnable
``deploy.sh`` + (where applicable) a Python SDK script — the same shape the
reference produces, not a single thin JSON.
"""

from __future__ import annotations

import json
import os
import textwrap
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class CloudDeployConfig:
    """Knobs shared across providers (reference: deploy.py argparse surface)."""

    name: str = "hvs-tpu-inference"
    image: str = "hvs-tpu:latest"
    registry: str = ""
    replicas: int = 2
    min_replicas: int = 2
    max_replicas: int = 10
    tpu_accelerator: str = "tpu-v5-lite-podslice"  # GKE accelerator label
    tpu_topology: str = "1x1"
    vertex_machine_type: str = "ct5lp-hightpu-1t"  # Vertex TPU v5e machine
    region: str = "us-central1"
    project: str = "PROJECT_ID"
    rest_port: int = 8000
    grpc_port: int = 50051
    metrics_port: int = 9090
    env: Dict[str, str] = field(default_factory=dict)

    @property
    def full_image(self) -> str:
        return f"{self.registry}/{self.image}" if self.registry else self.image


def _write(path: str, content: str, executable: bool = False) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)
    if executable:
        os.chmod(path, 0o755)
    return path


# ---------------------------------------------------------------------------
# GKE with TPU node pools
# ---------------------------------------------------------------------------

def generate_gke_tpu(cfg: CloudDeployConfig, out_dir: str) -> List[str]:
    """Deployment + Service + HPA + PodMonitoring + deploy.sh
    (replaces the reference's EKS/GPU manifests with GKE TPU scheduling)."""
    import yaml

    d = os.path.join(out_dir, "gke-tpu")
    deployment = {
        "apiVersion": "apps/v1",
        "kind": "Deployment",
        "metadata": {"name": cfg.name, "labels": {"app": cfg.name}},
        "spec": {
            "replicas": cfg.replicas,
            "strategy": {"type": "RollingUpdate",
                         "rollingUpdate": {"maxUnavailable": 0, "maxSurge": 1}},
            "selector": {"matchLabels": {"app": cfg.name}},
            "template": {
                "metadata": {
                    "labels": {"app": cfg.name},
                    "annotations": {
                        "prometheus.io/scrape": "true",
                        "prometheus.io/port": str(cfg.metrics_port),
                    },
                },
                "spec": {
                    "nodeSelector": {
                        "cloud.google.com/gke-tpu-accelerator": cfg.tpu_accelerator,
                        "cloud.google.com/gke-tpu-topology": cfg.tpu_topology,
                    },
                    "containers": [{
                        "name": "inference",
                        "image": cfg.full_image,
                        "resources": {"requests": {"google.com/tpu": "1"},
                                      "limits": {"google.com/tpu": "1"}},
                        "env": [{"name": k, "value": v}
                                for k, v in cfg.env.items()],
                        "ports": [
                            {"name": "rest", "containerPort": cfg.rest_port},
                            {"name": "grpc", "containerPort": cfg.grpc_port},
                            {"name": "metrics", "containerPort": cfg.metrics_port},
                        ],
                        "readinessProbe": {
                            "httpGet": {"path": "/health", "port": cfg.rest_port},
                            "initialDelaySeconds": 30, "periodSeconds": 10,
                        },
                        "livenessProbe": {
                            "httpGet": {"path": "/health", "port": cfg.rest_port},
                            "initialDelaySeconds": 60, "periodSeconds": 30,
                        },
                    }],
                },
            },
        },
    }
    service = {
        "apiVersion": "v1",
        "kind": "Service",
        "metadata": {"name": cfg.name},
        "spec": {
            "selector": {"app": cfg.name},
            "ports": [
                {"name": "rest", "port": 80, "targetPort": cfg.rest_port},
                {"name": "grpc", "port": cfg.grpc_port,
                 "targetPort": cfg.grpc_port},
            ],
            "type": "LoadBalancer",
        },
    }
    hpa = {
        "apiVersion": "autoscaling/v2",
        "kind": "HorizontalPodAutoscaler",
        "metadata": {"name": cfg.name},
        "spec": {
            "scaleTargetRef": {"apiVersion": "apps/v1", "kind": "Deployment",
                               "name": cfg.name},
            "minReplicas": cfg.min_replicas,
            "maxReplicas": cfg.max_replicas,
            "metrics": [
                {"type": "Resource",
                 "resource": {"name": "cpu",
                              "target": {"type": "Utilization",
                                         "averageUtilization": 70}}},
                {"type": "Pods",
                 "pods": {"metric": {"name": "hvs_requests_per_second"},
                          "target": {"type": "AverageValue",
                                     "averageValue": "30"}}},
            ],
        },
    }
    monitoring = {
        "apiVersion": "monitoring.googleapis.com/v1",
        "kind": "PodMonitoring",
        "metadata": {"name": cfg.name},
        "spec": {
            "selector": {"matchLabels": {"app": cfg.name}},
            "endpoints": [{"port": cfg.metrics_port, "interval": "15s"}],
        },
    }
    files = [
        _write(os.path.join(d, "deployment.yaml"), yaml.safe_dump(deployment)),
        _write(os.path.join(d, "service.yaml"), yaml.safe_dump(service)),
        _write(os.path.join(d, "hpa.yaml"), yaml.safe_dump(hpa)),
        _write(os.path.join(d, "podmonitoring.yaml"), yaml.safe_dump(monitoring)),
        _write(
            os.path.join(d, "deploy.sh"),
            textwrap.dedent(f"""\
                #!/usr/bin/env bash
                # Deploy {cfg.name} to a GKE cluster with a TPU node pool.
                set -euo pipefail
                PROJECT="${{PROJECT:-{cfg.project}}}"
                REGION="${{REGION:-{cfg.region}}}"
                CLUSTER="${{CLUSTER:-hvs-tpu}}"

                gcloud container clusters create-auto "$CLUSTER" \\
                  --project "$PROJECT" --region "$REGION" || true
                gcloud container clusters get-credentials "$CLUSTER" \\
                  --project "$PROJECT" --region "$REGION"
                kubectl apply -f deployment.yaml
                kubectl apply -f service.yaml
                kubectl apply -f hpa.yaml
                kubectl apply -f podmonitoring.yaml
                kubectl rollout status deployment/{cfg.name} --timeout=600s
                """),
            executable=True,
        ),
    ]
    return files


# ---------------------------------------------------------------------------
# Vertex AI custom-container endpoint on TPU
# ---------------------------------------------------------------------------

def generate_vertex_tpu(cfg: CloudDeployConfig, out_dir: str) -> List[str]:
    """Vertex AI Model upload + TPU Endpoint deploy script
    (the reference's Vertex GPU path, scripts/deploy.py:auto-generated
    aiplatform code, retargeted at {machine} TPU machines)."""
    d = os.path.join(out_dir, "vertex-tpu")
    script = textwrap.dedent(f"""\
        #!/usr/bin/env python
        \"\"\"Deploy {cfg.name} as a Vertex AI custom-container TPU endpoint.

        Generated by hvs_tpu.deployment.cloud_codegen — edit PROJECT/REGION or
        set env vars, then run. Requires google-cloud-aiplatform.
        \"\"\"
        import os

        from google.cloud import aiplatform

        PROJECT = os.environ.get("PROJECT", "{cfg.project}")
        REGION = os.environ.get("REGION", "{cfg.region}")
        IMAGE = os.environ.get("IMAGE", "{cfg.full_image}")

        aiplatform.init(project=PROJECT, location=REGION)

        model = aiplatform.Model.upload(
            display_name="{cfg.name}",
            serving_container_image_uri=IMAGE,
            serving_container_predict_route="/detect",
            serving_container_health_route="/health",
            serving_container_ports=[{cfg.rest_port}],
            serving_container_environment_variables={json.dumps(cfg.env)},
        )

        endpoint = aiplatform.Endpoint.create(display_name="{cfg.name}-endpoint")
        endpoint.deploy(
            model=model,
            machine_type="{cfg.vertex_machine_type}",  # TPU v5e
            min_replica_count={cfg.min_replicas},
            max_replica_count={cfg.max_replicas},
            traffic_percentage=100,
        )
        print("endpoint:", endpoint.resource_name)
        """)
    files = [
        _write(os.path.join(d, "deploy_vertex.py"), script, executable=True),
        _write(
            os.path.join(d, "README.md"),
            f"# Vertex AI TPU endpoint for {cfg.name}\n\n"
            f"1. Push the serving image: `docker push {cfg.full_image}`\n"
            f"2. `python deploy_vertex.py`\n\n"
            f"Machine type `{cfg.vertex_machine_type}` is a TPU v5e host; the\n"
            f"container serves REST on :{cfg.rest_port} (predict `/detect`,\n"
            f"health `/health`) — matching hvs_tpu.deployment.api_server.\n",
        ),
    ]
    return files


# ---------------------------------------------------------------------------
# Bare Cloud TPU VM
# ---------------------------------------------------------------------------

def generate_tpu_vm(cfg: CloudDeployConfig, out_dir: str) -> List[str]:
    """gcloud TPU-VM provisioning + systemd service unit."""
    d = os.path.join(out_dir, "tpu-vm")
    unit = textwrap.dedent(f"""\
        [Unit]
        Description={cfg.name} serving
        After=network-online.target

        [Service]
        WorkingDirectory=/opt/hvs_tpu
        ExecStart=/usr/bin/python3 -m scripts.deploy serve --backend rest \\
          --port {cfg.rest_port}
        Restart=always
        RestartSec=5
        Environment=JAX_PLATFORMS=tpu

        [Install]
        WantedBy=multi-user.target
        """)
    deploy = textwrap.dedent(f"""\
        #!/usr/bin/env bash
        # Provision a Cloud TPU VM and install {cfg.name} as a systemd service.
        set -euo pipefail
        PROJECT="${{PROJECT:-{cfg.project}}}"
        ZONE="${{ZONE:-{cfg.region}-a}}"
        NAME="${{NAME:-{cfg.name}}}"

        gcloud compute tpus tpu-vm create "$NAME" \\
          --project "$PROJECT" --zone "$ZONE" \\
          --accelerator-type v5litepod-1 \\
          --version tpu-ubuntu2204-base
        gcloud compute tpus tpu-vm scp --recurse \\
          ../../../hvs_tpu ../../../scripts "$NAME":/opt/hvs_tpu/ \\
          --project "$PROJECT" --zone "$ZONE"
        gcloud compute tpus tpu-vm scp hvs-tpu.service \\
          "$NAME":/tmp/ --project "$PROJECT" --zone "$ZONE"
        gcloud compute tpus tpu-vm ssh "$NAME" --project "$PROJECT" \\
          --zone "$ZONE" --command \\
          'sudo mv /tmp/hvs-tpu.service /etc/systemd/system/ && \\
           sudo systemctl daemon-reload && sudo systemctl enable --now hvs-tpu'
        """)
    return [
        _write(os.path.join(d, "hvs-tpu.service"), unit),
        _write(os.path.join(d, "deploy.sh"), deploy, executable=True),
    ]


# ---------------------------------------------------------------------------
# SageMaker / AzureML parity bundles (no TPUs there: serve the exported model)
# ---------------------------------------------------------------------------

def generate_sagemaker(cfg: CloudDeployConfig, out_dir: str) -> List[str]:
    """SageMaker bring-your-own-container deploy script
    (reference: scripts/deploy.py SageMaker codegen; CPU/GPU instances —
    AWS offers no TPUs, so this serves the exported SavedModel)."""
    d = os.path.join(out_dir, "sagemaker")
    script = textwrap.dedent(f"""\
        #!/usr/bin/env python
        \"\"\"Deploy {cfg.name} to a SageMaker real-time endpoint (BYO container).\"\"\"
        import os

        import boto3
        import sagemaker
        from sagemaker.model import Model

        ROLE = os.environ["SAGEMAKER_ROLE"]
        IMAGE = os.environ.get("IMAGE", "{cfg.full_image}")

        session = sagemaker.Session()
        model = Model(
            image_uri=IMAGE,
            role=ROLE,
            name="{cfg.name}",
            env={json.dumps(cfg.env)},
        )
        predictor = model.deploy(
            initial_instance_count={cfg.min_replicas},
            instance_type="ml.m5.xlarge",
            endpoint_name="{cfg.name}",
        )
        boto3.client("application-autoscaling").register_scalable_target(
            ServiceNamespace="sagemaker",
            ResourceId="endpoint/{cfg.name}/variant/AllTraffic",
            ScalableDimension="sagemaker:variant:DesiredInstanceCount",
            MinCapacity={cfg.min_replicas},
            MaxCapacity={cfg.max_replicas},
        )
        print("endpoint:", predictor.endpoint_name)
        """)
    return [
        _write(os.path.join(d, "deploy_sagemaker.py"), script, executable=True),
        _write(
            os.path.join(d, "README.md"),
            "# SageMaker bundle\n\nAWS offers no TPUs; this endpoint serves "
            "the exported SavedModel (scripts/export_model.py --format "
            "savedmodel) through the same REST surface.\n",
        ),
    ]


def generate_azureml(cfg: CloudDeployConfig, out_dir: str) -> List[str]:
    """AzureML managed online endpoint YAML + deploy.sh
    (reference: scripts/deploy.py AzureML codegen)."""
    import yaml

    d = os.path.join(out_dir, "azureml")
    endpoint = {
        "$schema": "https://azuremlschemas.azureedge.net/latest/"
                   "managedOnlineEndpoint.schema.json",
        "name": cfg.name,
        "auth_mode": "key",
    }
    deployment = {
        "$schema": "https://azuremlschemas.azureedge.net/latest/"
                   "managedOnlineDeployment.schema.json",
        "name": "blue",
        "endpoint_name": cfg.name,
        "environment": {
            "image": cfg.full_image,
            "inference_config": {
                "liveness_route": {"path": "/health", "port": cfg.rest_port},
                "readiness_route": {"path": "/health", "port": cfg.rest_port},
                "scoring_route": {"path": "/detect", "port": cfg.rest_port},
            },
        },
        "instance_type": "Standard_DS3_v2",
        "instance_count": cfg.min_replicas,
    }
    sh = textwrap.dedent(f"""\
        #!/usr/bin/env bash
        set -euo pipefail
        az ml online-endpoint create -f endpoint.yaml
        az ml online-deployment create -f deployment.yaml --all-traffic
        az ml online-endpoint show -n {cfg.name} --query scoring_uri
        """)
    return [
        _write(os.path.join(d, "endpoint.yaml"), yaml.safe_dump(endpoint)),
        _write(os.path.join(d, "deployment.yaml"), yaml.safe_dump(deployment)),
        _write(os.path.join(d, "deploy.sh"), sh, executable=True),
    ]


PROVIDERS = {
    "gke-tpu": generate_gke_tpu,
    "vertex-tpu": generate_vertex_tpu,
    "tpu-vm": generate_tpu_vm,
    "sagemaker": generate_sagemaker,
    "azureml": generate_azureml,
}


def generate(provider: str, out_dir: str,
             cfg: Optional[CloudDeployConfig] = None) -> List[str]:
    """Generate the full deployable bundle for one provider."""
    if provider not in PROVIDERS:
        raise ValueError(
            f"unknown provider {provider!r}; choose from {sorted(PROVIDERS)}"
        )
    return PROVIDERS[provider](cfg or CloudDeployConfig(), out_dir)
