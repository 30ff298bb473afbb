"""Hot model swap under concurrent load — the reload()/update_config race.

The engine's serve functions take weights as jit ARGUMENTS, so a swap is one
atomic reference assignment (no recompile, no half-updated state) and a
config-driven cache rebuild is a lock-guarded dict swap. These tests hammer
``infer`` from a worker thread while the main thread swaps weights and
rebuilds the serve-fn cache (reference hot swap: src/deployment/api_server.py:460-523;
micro-batcher thread: src/inference/engine.py:389-471).
"""

import threading
import time

import numpy as np
import pytest

from tests.test_inference import tiny_inference_config, tiny_model_config

from hvs_tpu.inference import InferenceEngine


@pytest.fixture(scope="module")
def swap_engine():
    e = InferenceEngine(tiny_model_config(), tiny_inference_config())
    e.warmup()
    # Warm the raw-frame programs for the source shapes the tests hammer with
    # (production warms its camera shapes the same way) — first use traces.
    for h, w in ((72, 96), (64, 64)):
        e.infer(np.zeros((h, w, 3), np.uint8))
    return e


def _alt_variables(engine, seed):
    import jax

    init = jax.jit(
        lambda k, x: engine.model.init(k, x, task="detection")
    )
    import jax.numpy as jnp

    return init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, engine.image_size, engine.image_size, 3), jnp.float32),
    )


# Heavy lane: 2000 hammered infers across a 20-swap sequence (~22 s);
# default-lane swap coverage stays via test_detect_during_config_rebuild.
@pytest.mark.heavy
def test_detect_during_weight_swap(swap_engine):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (72, 96, 3), np.uint8)
    variants = [_alt_variables(swap_engine, s) for s in (1, 2)]
    errors = []
    stop = threading.Event()
    counts = {"infer": 0}

    def hammer():
        try:
            while not stop.is_set():
                det = swap_engine.infer(img)
                assert det.boxes.shape[1] == 4
                assert np.isfinite(det.scores).all()
                counts["infer"] += 1
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    t = threading.Thread(target=hammer)
    t.start()
    deadline = time.time() + 6.0
    swaps = 0
    while time.time() < deadline and not errors:
        swap_engine.reload(variants[swaps % 2])
        swaps += 1
    stop.set()
    t.join(timeout=30)
    assert not errors, errors
    assert counts["infer"] > 3
    assert swaps > 10  # swaps are cheap: no recompile happened


def test_detect_during_config_rebuild(swap_engine):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    errors = []
    stop = threading.Event()

    def hammer():
        try:
            while not stop.is_set():
                swap_engine.infer(img)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=hammer)
    t.start()
    deadline = time.time() + 4.0
    flip = False
    while time.time() < deadline and not errors:
        swap_engine.config.postprocessing.score_threshold = 0.02 if flip else 0.01
        flip = not flip
        swap_engine.rebuild_serve_fns()
        time.sleep(0.05)
    stop.set()
    t.join(timeout=30)
    assert not errors, errors


@pytest.mark.heavy
def test_batcher_survives_swap(swap_engine):
    """Micro-batcher thread mid-flight while weights swap.

    The admission queue is widened for this test: its default depth
    (2 x max_batch) is the ADMISSION-CONTROL setting under test in
    test_admission.py, and on a contended 1-core host the batcher thread can
    legitimately be starved long enough for 8 submits to overflow it — which
    would fail this test for the wrong reason. Swap-survival, not shedding,
    is the behavior under test here.
    """
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(8)]
    variants = [_alt_variables(swap_engine, s) for s in (3, 4)]
    swap_engine.config.performance.max_queue_depth = 64
    swap_engine.start_batcher()
    try:
        futures = [swap_engine.submit(im) for im in imgs[:4]]
        swap_engine.reload(variants[0])
        futures += [swap_engine.submit(im) for im in imgs[4:]]
        swap_engine.reload(variants[1])
        for f in futures:
            det = f.result(timeout=60)
            assert np.isfinite(det.scores).all()
    finally:
        swap_engine.stop_batcher()
