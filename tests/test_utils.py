"""Tests for logging, detection evaluator, stability/inference metrics, profiler."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hvs_tpu.utils import (
    DetectionEvaluator,
    InferenceMetrics,
    InferenceProfiler,
    ModelProfiler,
    ResourceMonitor,
    StabilityMetrics,
    StructuredLogger,
    setup_logger,
)


# ---------------- DetectionEvaluator ----------------


def test_evaluator_perfect_predictions():
    ev = DetectionEvaluator(num_classes=3)
    gt = np.array([[10, 10, 50, 50], [60, 60, 100, 100]], np.float32)
    cls = np.array([0, 1])
    ev.add_image(gt, np.array([0.9, 0.8]), cls, gt, cls)
    res = ev.evaluate()
    assert res["mAP@0.5"] == 1.0
    assert res["mAP@[.5:.95]"] == 1.0


def test_evaluator_no_predictions():
    ev = DetectionEvaluator(num_classes=2)
    gt = np.array([[10, 10, 50, 50]], np.float32)
    ev.add_image(np.zeros((0, 4)), np.zeros(0), np.zeros(0), gt, np.array([0]))
    assert ev.evaluate()["mAP@0.5"] == 0.0


def test_evaluator_false_positive_lowers_precision():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[10, 10, 50, 50]], np.float32)
    preds = np.array([[10, 10, 50, 50], [200, 200, 250, 250]], np.float32)
    # FP scored higher than the TP -> AP must drop below 1.
    ev.add_image(preds, np.array([0.5, 0.9]), np.array([0, 0]), gt, np.array([0]))
    res = ev.evaluate()
    assert 0.0 < res["mAP@0.5"] < 1.0


def test_evaluator_localization_threshold():
    ev = DetectionEvaluator(num_classes=1, iou_thresholds=[0.5])
    gt = np.array([[0, 0, 100, 100]], np.float32)
    shifted = np.array([[40, 0, 140, 100]], np.float32)  # IoU ~ 0.43 < 0.5
    ev.add_image(shifted, np.array([0.9]), np.array([0]), gt, np.array([0]))
    assert ev.evaluate()["mAP@0.5"] == 0.0


def test_evaluator_size_buckets():
    ev = DetectionEvaluator(num_classes=1)
    small_gt = np.array([[0, 0, 10, 10]], np.float32)  # area 100 < 32^2
    ev.add_image(small_gt, np.array([0.9]), np.array([0]), small_gt, np.array([0]))
    res = ev.evaluate()
    assert res["AP@0.5_small"] == 1.0


# ---------------- StabilityMetrics ----------------


def test_stability_composite_score():
    s = StabilityMetrics()
    for _ in range(20):
        s.update({"grad_norm": 1.0, "max_eigenvalue": 1.0, "ds_error_max": 1e-4,
                  "signal_ratio_mean": 1.0})
    r = s.report()
    assert r["stability_score"] > 0.5
    s2 = StabilityMetrics()
    s2.update({"grad_norm": 1.0, "max_eigenvalue": 5.0, "ds_error_max": 0.5,
               "signal_ratio_mean": 100.0})
    assert s2.composite_score() < 0.3


# ---------------- InferenceMetrics ----------------


def test_inference_metrics_percentiles():
    m = InferenceMetrics(latency_target_ms=50)
    for lat in [0.01, 0.02, 0.03, 0.04, 0.1]:
        m.record(lat, batch_size=2)
    s = m.summary()
    assert s["count"] == 5
    assert 25 <= s["p50_latency_ms"] <= 35
    assert s["meets_latency_target"] == 1.0
    m.record_error()
    assert m.summary()["error_rate"] > 0


# ---------------- Logging ----------------


def test_structured_logger(tmp_path):
    log = StructuredLogger("t", log_dir=str(tmp_path))
    log.info("hello %s", "world")
    log.log_metrics({"loss": 1.5, "skip": "str"}, step=1)
    log.log_metrics({"loss": 1.2}, step=2)
    hist = log.get_metric_history("loss")
    assert hist == [(1, 1.5), (2, 1.2)]
    with log.timer("op", step=3):
        time.sleep(0.01)
    assert log.get_metric_history("time/op")[0][1] >= 0.01
    jsonl = (tmp_path / "t.metrics.jsonl").read_text().strip().splitlines()
    assert json.loads(jsonl[0])["loss"] == 1.5
    assert (tmp_path / "t.log").exists()
    log.close()


def test_setup_logger():
    assert isinstance(setup_logger("x"), StructuredLogger)


# ---------------- Profilers ----------------


def test_model_profiler_cost_and_walltime():
    f = lambda x: jnp.dot(x, x, preferred_element_type=jnp.float32)
    x = jnp.ones((256, 256))
    p = ModelProfiler(f, x)
    report = p.profile(iters=3)
    assert report.wall_time_ms > 0
    if report.flops:
        assert report.flops >= 2 * 256**3 * 0.5


def test_inference_profiler_sweep():
    def make_fn(b):
        return jax.jit(lambda x: jnp.sum(x * 2, axis=(1,)))

    prof = InferenceProfiler(make_fn, batch_sizes=(1, 2))
    prof.run(lambda b: jnp.ones((b, 64)), iters=3)
    assert set(prof.results) == {1, 2}
    assert prof.optimal_batch() in (1, 2)
    eff = prof.scaling_efficiency()
    assert 1 in eff


def test_resource_monitor():
    mon = ResourceMonitor(interval_s=0.05)
    mon.start()
    time.sleep(0.3)
    summary = mon.stop()
    assert "cpu_percent_mean" in summary
    assert summary["mem_used_gb_max"] > 0
