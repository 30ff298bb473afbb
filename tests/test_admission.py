"""Admission control of the serving micro-batcher (bounded queue + shed/reject).

Round 2 measured p95 latency of 26 s under overload because the request queue
was unbounded (SERVE_SUSTAINED_r02.json); round 3 bounds it and sheds or
rejects the excess (reference drop-oldest precedent:
src/inference/preprocessing.py:489-497; measured bounded-latency overload run:
SERVE_SUSTAINED_r03.json). These tests drive ``_MicroBatcher.submit`` WITHOUT
starting the drain thread so queue occupancy is deterministic — no model, no
device work.
"""

from types import SimpleNamespace

import numpy as np
import pytest

from hvs_tpu.inference.engine import (
    EngineOverloaded,
    InferenceEngine,
    _MicroBatcher,
)

IMG = np.zeros((8, 8, 3), np.uint8)


def make_batcher(policy="reject", depth=4):
    perf = SimpleNamespace(
        batch_buckets=(1, 2),
        max_queue_depth=depth,
        overload_policy=policy,
        max_queue_delay_ms=33.0,
    )
    engine = SimpleNamespace(config=SimpleNamespace(performance=perf))
    return _MicroBatcher(engine)


def test_reject_policy_raises_and_counts():
    b = make_batcher("reject", depth=3)
    futs = [b.submit(IMG) for _ in range(3)]
    with pytest.raises(EngineOverloaded):
        b.submit(IMG)
    s = b.stats()
    assert s["submitted"] == 4
    assert s["rejected"] == 1
    assert s["queue_depth"] == s["queue_capacity"] == 3
    # Accepted requests are untouched by the rejection.
    assert all(not f.done() for f in futs)


def test_shed_oldest_fails_oldest_future_and_admits_new():
    b = make_batcher("shed_oldest", depth=2)
    f0 = b.submit(IMG)
    f1 = b.submit(IMG)
    f2 = b.submit(IMG)  # overflows: f0 is shed, f2 admitted
    assert f0.done()
    assert isinstance(f0.exception(), EngineOverloaded)
    assert not f1.done() and not f2.done()
    s = b.stats()
    assert s["shed"] == 1 and s["rejected"] == 0
    assert s["queue_depth"] == 2  # still at capacity, newest retained


def test_default_depth_derived_from_largest_bucket():
    perf = SimpleNamespace(
        batch_buckets=(1, 2, 8),
        max_queue_depth=0,  # 0 = derive
        overload_policy="reject",
        max_queue_delay_ms=33.0,
    )
    b = _MicroBatcher(SimpleNamespace(config=SimpleNamespace(performance=perf)))
    assert b.queue.maxsize == 16  # 2 x max_batch


def test_depth_sized_from_measured_service_time():
    """With warmup()'s measured service time available, queue depth follows
    the latency budget: depth = budget / per-item service time (VERDICT r3
    weak #3 — a fixed count queued 2.5 s of work under overload)."""
    perf = SimpleNamespace(
        batch_buckets=(1, 2, 8),
        max_queue_depth=0,
        overload_policy="reject",
        max_queue_delay_ms=33.0,
        queue_budget_ms=100.0,
        latency_target_ms=50.0,
    )
    engine = SimpleNamespace(
        config=SimpleNamespace(performance=perf),
        _service_time_s={1: 0.010, 8: 0.040},  # 5 ms/item at bucket 8
    )
    b = _MicroBatcher(engine)
    assert b.queue.maxsize == 20  # 100 ms / 5 ms

    # Budget defaults to latency_target_ms when queue_budget_ms is 0.
    perf.queue_budget_ms = 0.0
    assert _MicroBatcher(engine).queue.maxsize == 10

    # Never below one full batch.
    engine._service_time_s = {8: 0.400}
    assert _MicroBatcher(engine).queue.maxsize == 8


def test_accepting_predicate_tracks_capacity():
    """The API layer checks accepting() BEFORE paying JPEG decode (fast-429);
    it must flip exactly at capacity and be False with no batcher running."""
    e = object.__new__(InferenceEngine)
    e._batcher = None
    assert not InferenceEngine.accepting(e)

    b = make_batcher("reject", depth=2)
    e._batcher = b
    assert InferenceEngine.accepting(e)
    b.submit(IMG)
    assert InferenceEngine.accepting(e)
    b.submit(IMG)
    assert not InferenceEngine.accepting(e)


class _StubEngine:
    """Records dispatch batch sizes and timestamps; instant device."""

    def __init__(self, max_delay_ms=50.0, service_s=0.0):
        self.config = SimpleNamespace(performance=SimpleNamespace(
            batch_buckets=(1, 2, 8),
            max_queue_depth=64,
            overload_policy="reject",
            max_queue_delay_ms=max_delay_ms,
        ))
        self.metrics = SimpleNamespace(record_error=lambda: None)
        self.dispatches = []
        self.service_s = service_s

    def dispatch_batch(self, images):
        import time as _t
        self.dispatches.append((len(images), _t.perf_counter()))
        return {"n": len(images)}

    def finalize_batch(self, handle):
        import time as _t
        if self.service_s:
            _t.sleep(self.service_s)
        return [f"det{i}" for i in range(handle["n"])]


def test_idle_device_dispatches_immediately_without_deadline_wait():
    """A lone request on an idle device must NOT wait the flush deadline
    (VERDICT r3 weak #2: p50 = floor + deadline at 8 FPS offered)."""
    import time

    eng = _StubEngine(max_delay_ms=200.0)  # deadline long enough to detect
    b = _MicroBatcher(eng)
    b.start()
    try:
        t0 = time.perf_counter()
        fut = b.submit(IMG)
        assert fut.result(timeout=5.0) == "det0"
        elapsed = time.perf_counter() - t0
        # Far below the 200 ms deadline: the batcher shipped immediately.
        assert elapsed < 0.15, f"waited {elapsed*1e3:.0f} ms on an idle device"
        assert eng.dispatches[0][0] == 1
    finally:
        b.stop()


def test_busy_device_accumulates_batches():
    """While a batch is in flight, arrivals coalesce instead of going out
    as singles: total dispatches << total requests under load."""
    eng = _StubEngine(max_delay_ms=30.0, service_s=0.02)
    b = _MicroBatcher(eng)
    b.start()
    try:
        futs = [b.submit(IMG) for _ in range(24)]
        for f in futs:
            f.result(timeout=10.0)
        sizes = [n for n, _ in eng.dispatches]
        assert sum(sizes) == 24
        assert max(sizes) > 1, f"never batched: {sizes}"
        assert len(sizes) < 24, f"all singles: {sizes}"
    finally:
        b.stop()
