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
