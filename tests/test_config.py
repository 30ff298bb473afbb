"""Config system tests (reference spec: src/config validation, YAML round-trip,
hierarchical merge — src/config/base_config.py:178-214, __init__.py:132-163)."""

import pytest

from hvs_tpu.config import (
    BaseConfig,
    InferenceConfig,
    ModelConfig,
    TrainingConfig,
    create_default_configs,
    load_config,
    merge_configs,
)


def test_base_config_defaults_and_validation():
    cfg = BaseConfig()
    assert cfg.precision == "bf16"
    assert cfg.device in ("tpu", "cpu")
    with pytest.raises(AssertionError):
        BaseConfig(batch_size=0)


def test_model_config_nested_and_estimates():
    cfg = ModelConfig()
    assert cfg.mhc.sinkhorn_iterations == 20
    est = cfg.estimate_parameters()
    assert 5e6 < est < 40e6, est
    shapes = cfg.output_shapes(batch=2)
    assert shapes["nms_boxes"] == (2, 100, 4)
    n = sum((416 // s) ** 2 * 3 for s in (8, 16, 32))
    assert shapes["boxes"] == (2, n, 4)


def test_model_config_builds_model():
    cfg = ModelConfig(input_size=64)
    cfg.backbone.stage_channels = (16, 24, 32, 40)
    cfg.backbone.stage_blocks = (1, 1, 1, 1)
    cfg.vit.dim = 16
    cfg.vit.num_heads = 2
    model = cfg.build_model()
    assert model.num_classes == 80
    prod = cfg.build_model(production=True)
    assert prod.precomputed_constraints


def test_quantization_config_roundtrip_and_build(tmp_path):
    """quantization.* survives YAML round-trip and gates the int8 twin."""
    cfg = ModelConfig(input_size=64)
    cfg.quantization.enabled = True
    cfg.quantization.scales_path = "scales.msgpack"
    cfg.quantization.quantize_fpn = True
    p = tmp_path / "model.yaml"
    cfg.save(str(p))
    loaded = ModelConfig.load(str(p))
    assert loaded.quantization.enabled
    assert loaded.quantization.scales_path == "scales.msgpack"
    assert loaded.quantization.quantize_fpn
    # int8 is serving-only: the training build stays float.
    assert not loaded.build_model().act_quant
    prod = loaded.build_model(production=True)
    assert prod.act_quant and prod.act_quant_fpn


def test_yaml_roundtrip(tmp_path):
    cfg = TrainingConfig(epochs=7)
    cfg.optimizer.learning_rate = 3e-4
    p = tmp_path / "training.yaml"
    cfg.save(str(p))
    loaded = TrainingConfig.load(str(p))
    assert loaded.epochs == 7
    assert loaded.optimizer.learning_rate == 3e-4
    assert loaded.loss.lambda_coord == 5.0


def test_json_roundtrip(tmp_path):
    cfg = InferenceConfig()
    p = tmp_path / "inference.json"
    cfg.save(str(p))
    loaded = InferenceConfig.load(str(p))
    assert loaded.postprocessing.iou_threshold == 0.45
    # 16 is the measured throughput-optimal bucket on v5e (default since r2).
    assert tuple(loaded.performance.batch_buckets) == (1, 2, 4, 8, 16)


def test_merge_configs():
    base = {"a": 1, "b": {"c": 2, "d": 3}}
    override = {"b": {"c": 9}, "e": 4}
    merged = merge_configs(base, override)
    assert merged == {"a": 1, "b": {"c": 9, "d": 3}, "e": 4}


def test_load_config_auto_type(tmp_path):
    create_default_configs(str(tmp_path))
    cfg = load_config(str(tmp_path / "training.yaml"))
    assert isinstance(cfg, TrainingConfig)
    cfg = load_config(str(tmp_path / "inference.yaml"))
    assert isinstance(cfg, InferenceConfig)


def test_trainer_config_conversion():
    cfg = TrainingConfig()
    tc = cfg.trainer_config(num_classes=80)
    assert tc.clip_mhc == 0.5
    assert tc.learning_rate == cfg.optimizer.learning_rate
