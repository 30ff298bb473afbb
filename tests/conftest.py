"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip TPU hardware is not available in CI; sharding/pjit paths are validated
on virtual CPU devices exactly as the driver's ``dryrun_multichip`` does.
"""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# Isolate the engine's AOT program cache: tests must not read or pollute the
# user-level cache (CPU-lowered blobs are useless for the real chip anyway).
os.environ.setdefault("HVS_AOT_CACHE", tempfile.mkdtemp(prefix="hvs_aot_test_"))
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Compile-time, not run-time, dominates this 1-core CI host (dozens of
# XLA:CPU graph compiles at 20-60 s each). Tests assert math, not speed —
# skip the backend optimization pipeline: measured 35% off the cold lane
# with identical results. Perf measurements NEVER use the test conftest.
if "xla_backend_optimization_level" not in _flags:
    _flags += (
        " --xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes"
    )
os.environ["XLA_FLAGS"] = _flags

# Shim google.cloud.logging BEFORE anything imports orbax: orbax.checkpoint's
# __init__ unconditionally imports its cloud logger, whose google.cloud.logging
# import spends ~4.6 s scanning installed-package metadata on this host
# (google.api_core version-support check). Orbax only needs the Client symbol
# to exist at class-definition time; no test uses cloud logging.
import sys  # noqa: E402
import types  # noqa: E402

if "google.cloud.logging" not in sys.modules:
    _fake_gcl = types.ModuleType("google.cloud.logging")

    class _NoCloudLoggingClient:  # pragma: no cover - never instantiated
        def __init__(self, *a, **k):
            raise RuntimeError("google.cloud.logging is stubbed out in tests")

    _fake_gcl.Client = _NoCloudLoggingClient
    sys.modules["google.cloud.logging"] = _fake_gcl

import jax  # noqa: E402  (import after env setup)
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# This environment pre-registers an experimental TPU plugin that overrides
# JAX_PLATFORMS; force CPU explicitly so tests never contend for the real chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compile cache, keyed by HLO hash. Two big wins on a 1-core
# CI host: (a) WITHIN one run, identical programs compiled by different jit
# objects (each engine deserializes the same AOT blob into a fresh callable;
# the multihost test's two subprocesses compile the same train step) become
# ~1s cache hits instead of 10-60s XLA CPU compiles; (b) ACROSS runs the whole
# suite warm-starts. The dir is machine-local (not committed); subprocess
# tests inherit it via the env var below.
_JAX_TEST_CACHE = os.environ.setdefault(
    "HVS_TEST_JAX_CACHE", os.path.join(tempfile.gettempdir(), "hvs_jax_test_cache")
)
jax.config.update("jax_compilation_cache_dir", _JAX_TEST_CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"


# ---------------------------------------------------------------------------
# Fast lane: anything that compiles a model (even tiny flax inits dispatch
# thousands of ops on this 1-core host) is marked slow automatically, keyed by
# the expensive fixtures, plus explicit module marks. CI lanes:
#   pytest -m "not slow"   fast lane (<2 min)
#   pytest                 default lane, <10 min (pyproject addopts deselect heavy)
#   pytest -m heavy        heavyweight integration lane (~20 min)
_SLOW_FIXTURES = {
    "trainer", "engine", "swap_engine", "ema_trainer", "pipeline",
    "api_server", "grpc_server", "model", "variables",
}
_SLOW_MODULES = {
    "test_models", "test_training", "test_training_round2", "test_inference",
    "test_deployment", "test_pallas", "test_hot_swap", "test_multihost",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if _SLOW_FIXTURES & set(getattr(item, "fixturenames", ())) or (
            item.module.__name__ in _SLOW_MODULES
        ):
            item.add_marker(pytest.mark.slow)
        # heavy implies slow: `-m "not slow"` (fast lane) must never pick up a
        # heavyweight integration test that lacks an explicit slow mark.
        if item.get_closest_marker("heavy") is not None:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def key():
    return jax.random.PRNGKey(0)


def create_test_image(height=64, width=64, channels=3, seed=0):
    """Synthetic uint8 test image (parity with reference src/tests/__init__.py:18-56)."""
    r = np.random.default_rng(seed)
    return r.integers(0, 255, size=(height, width, channels), dtype=np.uint8)


def create_test_batch(batch=2, height=64, width=64, channels=3, seed=0):
    r = np.random.default_rng(seed)
    return r.standard_normal((batch, height, width, channels)).astype(np.float32)


def create_test_detections(n=5, image_size=64, seed=0):
    r = np.random.default_rng(seed)
    x1 = r.uniform(0, image_size * 0.6, n)
    y1 = r.uniform(0, image_size * 0.6, n)
    w = r.uniform(4, image_size * 0.4, n)
    h = r.uniform(4, image_size * 0.4, n)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)
    scores = r.uniform(0.3, 1.0, n).astype(np.float32)
    classes = r.integers(0, 80, n).astype(np.int32)
    return boxes, scores, classes


@pytest.fixture(scope="session")
def shared_engine():
    """ONE tiny InferenceEngine for every module that serves through it
    (test_inference, test_deployment): engine build + warmup dominated the
    cold lane at ~60 s per module. Tests that MUTATE engine state must
    restore it (reload back, stop_batcher) — hot-swap tests keep their own
    engine."""
    from tests.test_inference import tiny_inference_config, tiny_model_config

    from hvs_tpu.inference import InferenceEngine

    e = InferenceEngine(tiny_model_config(), tiny_inference_config())
    e.warmup()
    return e
