"""Infra config-lint tests (behavioral spec: reference
src/tests/test_deployment.py:34-219,551-588 — Dockerfile structure, compose
services, k8s schema, cross-config consistency)."""

import os

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(*parts):
    with open(os.path.join(REPO, *parts)) as f:
        return f.read()


# ---------------- Dockerfiles (reference :37-57) ----------------


def test_inference_dockerfile_structure():
    content = _read("docker", "Dockerfile.inference")
    assert content.startswith("#") or "FROM" in content
    assert "FROM python:" in content  # TPU image, not nvidia/cuda
    assert "EXPOSE 8000 50051 9090" in content
    assert "HEALTHCHECK" in content
    assert "USER hvs" in content  # non-root
    assert "jax[tpu]" in content


def test_train_dockerfile_structure():
    content = _read("docker", "Dockerfile.train")
    assert "FROM python:" in content
    assert "scripts/train.py" in content
    assert "libnccl" not in content.lower()  # XLA collectives, no NCCL install


def test_entrypoint_modes():
    content = _read("docker", "entrypoint.sh")
    for mode in ("api)", "grpc)", "train)", "healthcheck)"):
        assert mode in content


def test_compose_services():
    compose = yaml.safe_load(_read("docker-compose.yml"))
    services = compose["services"]
    assert {"inference", "grpc", "prometheus"} <= set(services)
    assert services["inference"]["healthcheck"]["test"][0] == "CMD"


# ---------------- Kubernetes (reference :107-219) ----------------


def test_k8s_deployment_schema():
    dep = yaml.safe_load(_read("kubernetes", "deployment.yaml"))
    assert dep["kind"] == "Deployment"
    spec = dep["spec"]
    assert spec["replicas"] == 3
    assert spec["strategy"]["rollingUpdate"]["maxUnavailable"] == 0
    pod = spec["template"]["spec"]
    assert "gke-tpu" in str(pod["nodeSelector"])  # TPU nodes, not GPU plugin
    container = pod["containers"][0]
    assert container["resources"]["limits"]["google.com/tpu"] == "1"
    probes = {p for p in ("readinessProbe", "livenessProbe") if p in container}
    assert probes == {"readinessProbe", "livenessProbe"}
    ann = spec["template"]["metadata"]["annotations"]
    assert ann["prometheus.io/scrape"] == "true"


def test_k8s_hpa_schema():
    hpa = yaml.safe_load(_read("kubernetes", "hpa.yaml"))
    assert hpa["kind"] == "HorizontalPodAutoscaler"
    assert hpa["spec"]["minReplicas"] == 2
    assert hpa["spec"]["maxReplicas"] == 10
    metric_types = {m["type"] for m in hpa["spec"]["metrics"]}
    assert "Resource" in metric_types


def test_k8s_service_ports_match_deployment():
    svc = yaml.safe_load(_read("kubernetes", "service.yaml"))
    dep = yaml.safe_load(_read("kubernetes", "deployment.yaml"))
    container_ports = {
        p["containerPort"] for p in dep["spec"]["template"]["spec"]["containers"][0]["ports"]
    }
    for port in svc["spec"]["ports"]:
        assert port["targetPort"] in container_ports


def test_k8s_configmap_referenced():
    cm = yaml.safe_load(_read("kubernetes", "configmap.yaml"))
    dep = yaml.safe_load(_read("kubernetes", "deployment.yaml"))
    env_from = dep["spec"]["template"]["spec"]["containers"][0]["envFrom"]
    assert env_from[0]["configMapRef"]["name"] == cm["metadata"]["name"]


# ---------------- Cross-config consistency (reference :551-588) -------------


def test_registry_gates_match_reference_slas():
    reg = yaml.safe_load(_read("configs", "model_registry.yaml"))
    gates = reg["admission_gates"]
    assert gates["min_map_50"] == 0.75
    assert gates["max_latency_ms"] == 50
    assert gates["min_precision"] == 0.8
    assert gates["min_recall"] == 0.7


def test_default_config_yamls_load():
    from hvs_tpu.config import InferenceConfig, ModelConfig, TrainingConfig

    t = TrainingConfig.load(os.path.join(REPO, "configs", "training.yaml"))
    m = ModelConfig.load(os.path.join(REPO, "configs", "model.yaml"))
    i = InferenceConfig.load(os.path.join(REPO, "configs", "inference.yaml"))
    # Cross-consistency: serving latency target matches the registry gate.
    reg = yaml.safe_load(_read("configs", "model_registry.yaml"))
    assert i.performance.latency_target_ms <= reg["admission_gates"]["max_latency_ms"]
    assert m.detection.num_classes == 80


def test_robot_config_safety_consistency():
    robot = yaml.safe_load(_read("configs", "robot_config.yaml"))
    assert robot["safety"]["emergency_distance_m"] < robot["safety"]["safety_distance_m"]
    assert robot["kinematics"]["max_linear_velocity_mps"] <= 1.0


def test_proto_file_exists_and_has_service():
    proto = _read("hvs_tpu", "deployment", "proto", "robot_vision.proto")
    assert "service RobotVisionService" in proto
    for rpc in ("DetectSingle", "DetectBatch", "StreamDetections", "HandleCommand"):
        assert rpc in proto


# ---------------- native runtime kernels ----------------


def test_native_library_builds_and_matches_python():
    """The C++ runtime kernels must agree with the Python reference paths."""
    import numpy as np

    from hvs_tpu.native import (
        NATIVE_AVAILABLE,
        greedy_nms_native,
        iou_matrix_native,
        letterbox_u8_native,
    )

    assert NATIVE_AVAILABLE, "g++ is present in this environment; build must work"

    # letterbox geometry parity with the Python/cv2 path
    from hvs_tpu.data.dataset import letterbox

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (50, 100, 3), np.uint8)
    n_img, n_scale, n_pad = letterbox_u8_native(img, 64)
    p_img, p_scale, p_pad = letterbox(img, 64)
    assert n_scale == p_scale and n_pad == p_pad
    assert n_img.shape == p_img.shape
    # bilinear kernels differ at most by rounding
    diff = np.abs(n_img.astype(np.int32) - p_img.astype(np.int32))
    assert diff.mean() < 3.0, diff.mean()

    # greedy NMS parity with the numpy oracle
    from hvs_tpu.inference import NMSFilter

    boxes = rng.uniform(0, 100, (50, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 30, (50, 2)).astype(np.float32)
    scores = rng.uniform(0, 1, 50).astype(np.float32)
    classes = np.zeros(50, np.int32)
    keep_native = greedy_nms_native(boxes, scores, classes, 0.45, 0.1, 50,
                                    class_aware=False)
    keep_py = NMSFilter.greedy_numpy(boxes, scores, 0.45)
    keep_py = keep_py[scores[keep_py] >= 0.1]
    np.testing.assert_array_equal(np.sort(keep_native), np.sort(keep_py))

    # IoU matrix parity
    a, b = boxes[:10], boxes[10:30]
    native = iou_matrix_native(a, b)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    ref = inter / (area_a[:, None] + area_b[None, :] - inter)
    np.testing.assert_allclose(native, ref, atol=1e-5)


# ---------------- Round-2 infra additions ----------------


def test_split_compose_files():
    """Split train/inference stacks (reference: docker/docker-compose.*.yml)."""
    inf = yaml.safe_load(_read("docker", "docker-compose.inference.yml"))
    assert {"api", "grpc", "prometheus"} <= set(inf["services"])
    assert inf["services"]["api"]["healthcheck"]["test"][0] == "CMD"
    tr = yaml.safe_load(_read("docker", "docker-compose.train.yml"))
    assert "train" in tr["services"]
    cmd = " ".join(tr["services"]["train"]["command"])
    assert "scripts/train.py" in cmd


def test_build_script():
    """build.sh exists, is executable, and dry-runs both images."""
    import subprocess

    path = os.path.join(REPO, "docker", "build.sh")
    assert os.access(path, os.X_OK)
    out = subprocess.run(
        ["bash", path, "--type", "all", "--dry-run"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "Dockerfile.inference" in out and "Dockerfile.train" in out
    # --push without --registry must fail loudly, not push to docker.io.
    rc = subprocess.run(
        ["bash", path, "--type", "inference", "--dry-run", "--push"],
        capture_output=True, text=True,
    )
    assert rc.returncode != 0


def test_k8s_secrets_template_has_no_real_values():
    docs = list(yaml.safe_load_all(_read("kubernetes", "secrets.yaml")))
    secret = next(d for d in docs if d.get("kind") == "Secret"
                  and d["type"] == "Opaque")
    token = secret["stringData"]["api-auth-token"]
    assert token in ("", "CHANGE-ME"), "never commit real secrets"


def test_k8s_tpu_scheduler_policy():
    docs = list(yaml.safe_load_all(_read("kubernetes", "tpu-scheduler.yaml")))
    kinds = [d["kind"] for d in docs]
    assert kinds.count("PriorityClass") == 2
    serving = next(d for d in docs if d.get("metadata", {}).get("name")
                   == "hvs-tpu-serving")
    batch = next(d for d in docs if d.get("metadata", {}).get("name")
                 == "hvs-tpu-batch")
    assert serving["value"] > batch["value"]  # serving preempts batch
    contract = next(d for d in docs if d["kind"] == "ConfigMap")
    assert "gke-tpu-accelerator" in contract["data"]["node-selector"]


def test_base_yaml_loads_as_base_config():
    from hvs_tpu.config import BaseConfig, load_config

    cfg = load_config(os.path.join(REPO, "configs", "base.yaml"), "base")
    assert isinstance(cfg, BaseConfig)
    assert cfg.precision == "bf16"


def test_deploy_config_defaults_layering():
    """YAML fills argparse defaults; explicit CLI flags still win."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "deploy.py"),
         "docker", "--dry-run"],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout
    assert "-t hvs-tpu:latest" in out  # from configs/deployment.yaml
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "deploy.py"),
         "docker", "--dry-run", "--tag", "override:v9"],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout
    assert "-t override:v9" in out


# ---------------- Notebooks (reference: notebooks/01..05) ----------------


def test_notebooks_valid_and_in_sync():
    """notebooks/*.ipynb are generated from examples/nb_*.py and committed;
    they must parse as valid nbformat v4 and match their sources exactly."""
    import glob
    import subprocess
    import sys

    import nbformat

    nbs = sorted(glob.glob(os.path.join(REPO, "notebooks", "*.ipynb")))
    assert len(nbs) == 5, "expected the 5 reference-parity notebooks"
    for p in nbs:
        nb = nbformat.read(p, as_version=4)
        assert len(nb.cells) >= 8, f"{p} is thin"
        assert nb.cells[0].cell_type == "markdown"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_notebooks.py"),
         "--check"],
        check=True, cwd=REPO, capture_output=True,
    )


def test_notebook_source_data_exploration_executes(tmp_path):
    """nb_01 is pure host-side; execute it end-to-end (the model notebooks
    are covered by the slow suite's component tests)."""
    import subprocess
    import sys

    env = dict(os.environ, HVS_NB_TINY="1", HVS_NB_OUT=str(tmp_path))
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "nb_01_data_exploration.py")],
        check=True, cwd=REPO, env=env, capture_output=True, timeout=280,
    )


def test_summarize_run_dedupes_resumed_steps(tmp_path):
    """A resume replays steps between the restore point and the crash point;
    the stability artifact must count unique steps and use the last record."""
    import json
    import subprocess
    import sys

    steps = tmp_path / "steps.jsonl"
    rows = []
    # Segment 1: steps 0..9.
    for s in range(10):
        rows.append({"step": s, "time": 1000.0 + s, "lr_scale": 1.0,
                     "loss": 10.0 - 0.5 * s, "grad_norm": 5.0})
    # Resume from step 5: steps 5..14 replayed/continued with new losses.
    for s in range(5, 15):
        rows.append({"step": s, "time": 2000.0 + (s - 5), "lr_scale": 1.0,
                     "loss": 8.0 - 0.5 * s, "grad_norm": 4.0})
    steps.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = tmp_path / "stab.json"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "summarize_run.py"),
         "--steps", str(steps), "--output", str(out)],
        check=True, cwd=REPO, capture_output=True, timeout=280,
    )
    artifact = json.loads(out.read_text())
    assert artifact["steps"] == 15  # unique steps, not 20 raw rows
    assert artifact["all_finite"]
    # Replayed steps 5..9 must use the post-resume (last) records.
    assert artifact["loss_min"] == 8.0 - 0.5 * 14
    assert not artifact["diverged"]


# ---------------------------------------------------------------------------
# Cloud deployment codegen (reference: scripts/deploy.py:267-534)
# ---------------------------------------------------------------------------

def test_cloud_codegen_all_providers(tmp_path):
    from hvs_tpu.deployment import generate_cloud_bundle

    for provider in ("gke-tpu", "vertex-tpu", "tpu-vm", "sagemaker", "azureml"):
        files = generate_cloud_bundle(provider, str(tmp_path))
        assert files, provider
        import os
        for f in files:
            assert os.path.exists(f), f


def test_cloud_codegen_gke_manifest_schema(tmp_path):
    import os

    import yaml

    from hvs_tpu.deployment import CloudDeployConfig, generate_cloud_bundle

    cfg = CloudDeployConfig(image="img:v1", registry="gcr.io/p", replicas=3)
    generate_cloud_bundle("gke-tpu", str(tmp_path), cfg)
    d = os.path.join(str(tmp_path), "gke-tpu")
    dep = yaml.safe_load(open(os.path.join(d, "deployment.yaml")))
    spec = dep["spec"]["template"]["spec"]
    assert spec["nodeSelector"]["cloud.google.com/gke-tpu-accelerator"]
    assert spec["containers"][0]["image"] == "gcr.io/p/img:v1"
    assert spec["containers"][0]["resources"]["limits"]["google.com/tpu"] == "1"
    assert dep["spec"]["replicas"] == 3
    hpa = yaml.safe_load(open(os.path.join(d, "hpa.yaml")))
    assert hpa["spec"]["maxReplicas"] == cfg.max_replicas
    # deploy.sh is executable and applies every manifest
    sh = open(os.path.join(d, "deploy.sh")).read()
    for manifest in ("deployment", "service", "hpa", "podmonitoring"):
        assert f"{manifest}.yaml" in sh


def test_cloud_codegen_unknown_provider(tmp_path):
    import pytest

    from hvs_tpu.deployment import generate_cloud_bundle

    with pytest.raises(ValueError):
        generate_cloud_bundle("ec2", str(tmp_path))
