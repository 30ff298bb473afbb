#!/usr/bin/env python
"""Deployment manager: containers, Kubernetes, cloud codegen, edge deploy.

TPU-native rebuild of the reference deploy tool
(reference: scripts/deploy.py:50-772): docker build/push, kubectl apply +
rollout wait, cloud deployment manifest generation (GKE-TPU instead of
SageMaker/Vertex GPU images), and scp/ssh edge deploy. Every subprocess action
supports --dry-run, printing the exact commands (used by tests/CI where no
docker daemon or cluster exists).

Usage:
    python scripts/deploy.py docker --tag hvs-tpu:latest --dry-run
    python scripts/deploy.py k8s --manifest-dir kubernetes --dry-run
    python scripts/deploy.py serve --backend grpc --port 50051
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class DeploymentManager:
    """(reference: DeploymentManager, scripts/deploy.py:50-635)"""

    def __init__(self, dry_run: bool = False):
        self.dry_run = dry_run
        self.executed = []

    def _run(self, cmd: list, **kwargs) -> int:
        printable = " ".join(shlex.quote(c) for c in cmd)
        self.executed.append(printable)
        print(f"$ {printable}")
        if self.dry_run:
            return 0
        return subprocess.run(cmd, **kwargs).returncode

    # ---------------- docker (reference :50-138) ----------------
    def docker_build(self, tag: str, dockerfile: str = "docker/Dockerfile.inference",
                     push: bool = False, registry: str = "") -> int:
        rc = self._run(["docker", "build", "-f", dockerfile, "-t", tag, REPO_ROOT])
        if rc == 0 and push:
            full = f"{registry}/{tag}" if registry else tag
            if registry:
                rc = self._run(["docker", "tag", tag, full])
            rc = rc or self._run(["docker", "push", full])
        return rc

    # ---------------- kubernetes (reference :139-266) ----------------
    def k8s_apply(self, manifest_dir: str = "kubernetes",
                  namespace: str = "hvs-tpu") -> int:
        rc = self._run(["kubectl", "create", "namespace", namespace,
                        "--dry-run=client", "-o", "yaml"])
        for name in sorted(os.listdir(manifest_dir)) if os.path.isdir(manifest_dir) else []:
            if name.endswith((".yaml", ".yml")):
                rc = rc or self._run(
                    ["kubectl", "apply", "-n", namespace, "-f",
                     os.path.join(manifest_dir, name)]
                )
        rc = rc or self._run(
            ["kubectl", "rollout", "status", "-n", namespace,
             "deployment/hvs-tpu-inference", "--timeout=300s"]
        )
        return rc

    # ---------------- cloud codegen (reference :267-534) ----------------
    def generate_cloud_manifest(self, provider: str, out_dir: str,
                                image: str = "hvs-tpu:latest",
                                registry: str = "") -> list:
        """Full per-provider deployable bundles — GKE-TPU / Vertex-TPU /
        TPU-VM (TPU-first) plus SageMaker/AzureML parity bundles serving the
        exported model (reference emits SageMaker/Vertex/AzureML code,
        scripts/deploy.py:267-534). Delegates to
        :mod:`hvs_tpu.deployment.cloud_codegen`."""
        from hvs_tpu.deployment.cloud_codegen import CloudDeployConfig, generate

        cfg = CloudDeployConfig(image=image, registry=registry)
        files = generate(provider, out_dir, cfg)
        for f in files:
            print(f"wrote {f}")
        return files

    # ---------------- edge (reference :535-635) ----------------
    def edge_deploy(self, host: str, user: str = "robot",
                    remote_dir: str = "/opt/hvs_tpu") -> int:
        rc = self._run(["ssh", f"{user}@{host}", f"mkdir -p {remote_dir}"])
        rc = rc or self._run(
            ["scp", "-r", os.path.join(REPO_ROOT, "hvs_tpu"),
             os.path.join(REPO_ROOT, "scripts"),
             f"{user}@{host}:{remote_dir}/"]
        )
        rc = rc or self._run(
            ["ssh", f"{user}@{host}",
             f"cd {remote_dir} && python -m scripts.inference --source 0"]
        )
        return rc


def serve(args) -> None:
    """In-process serving entry (REST or gRPC)."""
    from hvs_tpu.config import InferenceConfig, ModelConfig
    from hvs_tpu.inference import InferenceEngine

    mcfg = ModelConfig()
    icfg = InferenceConfig()
    if args.checkpoint:
        icfg.checkpoint_path = args.checkpoint
    engine = InferenceEngine(mcfg, icfg)
    if args.backend == "rest":
        from hvs_tpu.deployment import run_server

        run_server(engine, host=args.host, port=args.port)
    else:
        from hvs_tpu.deployment import RobotGRPCServer

        server = RobotGRPCServer(engine, host=args.host, port=args.port)
        server.start()
        print(f"gRPC serving on {args.host}:{args.port}")
        server.wait()


def apply_config_defaults(args, subparser, path, argv=None):
    """Overlay YAML defaults (configs/deployment.yaml) under CLI flags.

    Precedence: explicit CLI flag > YAML value > argparse default. A flag
    counts as explicit when it APPEARS on the command line (checked against
    ``argv``), not when its value differs from the argparse default — so
    ``--tag hvs-tpu:latest`` passed explicitly is never overridden by YAML
    (ADVICE r2). The default config path resolves relative to the repo root,
    not the CWD, so running from elsewhere still finds the YAML layer.
    """
    if path and not os.path.isabs(path) and not os.path.exists(path):
        candidate = os.path.join(REPO_ROOT, path)
        if os.path.exists(candidate):
            path = candidate
    if not path or not os.path.exists(path):
        return args
    import sys as _sys

    import yaml

    argv = list(_sys.argv[1:] if argv is None else argv)
    explicit = set()
    for a in subparser._actions:
        for opt in a.option_strings:
            if any(tok == opt or tok.startswith(opt + "=") for tok in argv):
                explicit.add(a.dest)
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    section = cfg.get(args.action, {}) or {}
    for key, value in section.items():
        attr = key.replace("-", "_")
        if hasattr(args, attr) and attr not in explicit:
            setattr(args, attr, value)
    return args


def main():
    p = argparse.ArgumentParser(description="Deploy the vision stack")
    p.add_argument("--config", default="configs/deployment.yaml",
                   help="YAML defaults layered under CLI flags")
    sub = p.add_subparsers(dest="action", required=True)

    d = sub.add_parser("docker")
    d.add_argument("--tag", default="hvs-tpu:latest")
    d.add_argument("--dockerfile", default="docker/Dockerfile.inference")
    d.add_argument("--push", action="store_true")
    d.add_argument("--registry", default="")
    d.add_argument("--dry-run", action="store_true")

    k = sub.add_parser("k8s")
    k.add_argument("--manifest-dir", default="kubernetes")
    k.add_argument("--namespace", default="hvs-tpu")
    k.add_argument("--dry-run", action="store_true")

    c = sub.add_parser("cloud")
    c.add_argument("--provider", default="gke-tpu",
                   choices=["gke-tpu", "vertex-tpu", "tpu-vm", "sagemaker",
                            "azureml"])
    c.add_argument("--out-dir", default="cloud_manifests")
    c.add_argument("--image", default="hvs-tpu:latest")
    c.add_argument("--registry", default="")

    e = sub.add_parser("edge")
    e.add_argument("--host", required=True)
    e.add_argument("--user", default="robot")
    e.add_argument("--dry-run", action="store_true")

    s = sub.add_parser("serve")
    s.add_argument("--backend", choices=["rest", "grpc"], default="rest")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--checkpoint", default=None)

    args = p.parse_args()
    args = apply_config_defaults(args, sub.choices[args.action], args.config)
    if args.action == "docker":
        mgr = DeploymentManager(args.dry_run)
        sys.exit(mgr.docker_build(args.tag, args.dockerfile, args.push, args.registry))
    elif args.action == "k8s":
        mgr = DeploymentManager(args.dry_run)
        sys.exit(mgr.k8s_apply(args.manifest_dir, args.namespace))
    elif args.action == "cloud":
        DeploymentManager().generate_cloud_manifest(
            args.provider, args.out_dir, image=args.image,
            registry=args.registry,
        )
    elif args.action == "edge":
        mgr = DeploymentManager(args.dry_run)
        sys.exit(mgr.edge_deploy(args.host, args.user))
    elif args.action == "serve":
        serve(args)


if __name__ == "__main__":
    main()
