"""Profiling: XLA cost analysis, per-stage timing, latency sweeps, host monitor.

TPU-native redesign of the reference profilers
(reference: src/utils/profiler.py:79-1159). The reference hooks every
nn.Module for per-layer CUDA timing; under XLA the program is one fused
executable, so per-layer wall timing is meaningless — instead:

  * :class:`ModelProfiler` — compiles the jitted function and reads XLA's
    ``cost_analysis`` (FLOPs, bytes accessed, memory) plus measured wall time;
    emits bottleneck-style reports and optimization hints (the reference's
    recommendations engine, profiler.py:529-598) and can capture a
    ``jax.profiler`` trace for xprof.
  * :class:`InferenceProfiler` — per-batch-size latency/throughput sweep with
    optimal-batch selection and sublinear-scaling detection (reference
    :780-1159).
  * :class:`ResourceMonitor` — background psutil sampling thread (reference
    :79-234; GPUtil replaced by jax device memory stats when available).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


@dataclass
class ProfileReport:
    flops: Optional[float]
    bytes_accessed: Optional[float]
    wall_time_ms: float
    achieved_tflops: Optional[float]
    memory_mb: Optional[float]
    recommendations: List[str] = field(default_factory=list)


class ModelProfiler:
    """Profile a jittable function on the current backend
    (reference: src/utils/profiler.py:237-777, redesigned for XLA)."""

    # Peak specs used for utilization estimates (v5e: ~197 bf16 TFLOP/s).
    PEAK_TFLOPS = {"tpu": 197.0, "cpu": 0.5}

    def __init__(self, fn: Callable, *example_args):
        import jax

        self.fn = jax.jit(fn) if not hasattr(fn, "lower") else fn
        self.example_args = example_args
        self._compiled = None

    def compile(self):
        if self._compiled is None:
            self._compiled = self.fn.lower(*self.example_args).compile()
        return self._compiled

    def cost_analysis(self) -> Dict[str, float]:
        """XLA's static cost model (flops, bytes accessed)."""
        compiled = self.compile()
        try:
            costs = compiled.cost_analysis()
            if isinstance(costs, (list, tuple)):
                costs = costs[0]
            return dict(costs) if costs else {}
        except Exception:
            return {}

    def measure_wall_time(self, iters: int = 20) -> float:
        import jax

        r = self.fn(*self.example_args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = self.fn(*self.example_args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters

    def profile(self, iters: int = 20) -> ProfileReport:
        import jax

        costs = self.cost_analysis()
        wall = self.measure_wall_time(iters)
        flops = costs.get("flops")
        byts = costs.get("bytes accessed")
        platform = jax.devices()[0].platform
        peak = self.PEAK_TFLOPS.get("tpu" if platform != "cpu" else "cpu", 1.0)
        achieved = flops / wall / 1e12 if flops else None

        mem_mb = None
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                mem_mb = stats.get("bytes_in_use", 0) / 2**20
        except Exception:
            pass

        recs: List[str] = []
        if achieved is not None and achieved < 0.1 * peak:
            recs.append(
                f"MXU utilization {achieved / peak:.1%}: program is latency- or "
                "bandwidth-bound; increase batch size or fuse host round-trips."
            )
        if byts and flops and flops / max(byts, 1) < 10:
            recs.append(
                f"arithmetic intensity {flops / max(byts, 1):.1f} FLOP/byte: "
                "HBM-bandwidth-bound; consider bf16 activations and operator fusion."
            )
        return ProfileReport(
            flops=flops,
            bytes_accessed=byts,
            wall_time_ms=wall * 1e3,
            achieved_tflops=achieved,
            memory_mb=mem_mb,
            recommendations=recs,
        )

    def trace(self, log_dir: str, iters: int = 5) -> str:
        """Capture a jax.profiler trace viewable in xprof/TensorBoard
        (replaces the reference's per-module hook tree)."""
        import jax

        r = self.fn(*self.example_args)
        jax.block_until_ready(r)
        with jax.profiler.trace(log_dir):
            for _ in range(iters):
                r = self.fn(*self.example_args)
            jax.block_until_ready(r)
        return log_dir


class InferenceProfiler:
    """Latency/throughput sweep over batch sizes
    (reference: src/utils/profiler.py:780-1159)."""

    def __init__(self, make_fn: Callable[[int], Callable], batch_sizes=(1, 2, 4, 8)):
        """``make_fn(batch)`` returns a callable taking a [batch, ...] input."""
        self.make_fn = make_fn
        self.batch_sizes = batch_sizes
        self.results: Dict[int, Dict[str, float]] = {}

    def run(self, make_input: Callable[[int], Any], iters: int = 20) -> Dict[int, Dict]:
        import jax

        for b in self.batch_sizes:
            fn = self.make_fn(b)
            x = make_input(b)
            r = fn(x)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(x)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / iters
            self.results[b] = {
                "latency_ms": dt * 1e3,
                "throughput_fps": b / dt,
                "latency_per_item_ms": dt * 1e3 / b,
            }
        return self.results

    def optimal_batch(self, latency_budget_ms: Optional[float] = None) -> int:
        """Highest-throughput batch within the latency budget
        (reference optimal-batch selection)."""
        candidates = {
            b: r for b, r in self.results.items()
            if latency_budget_ms is None or r["latency_ms"] <= latency_budget_ms
        } or self.results
        return max(candidates, key=lambda b: candidates[b]["throughput_fps"])

    def scaling_efficiency(self) -> Dict[int, float]:
        """Throughput scaling vs batch 1 (sublinear detection, reference)."""
        if 1 not in self.results:
            return {}
        base = self.results[1]["throughput_fps"]
        return {
            b: r["throughput_fps"] / (base * b) for b, r in self.results.items()
        }


class ResourceMonitor:
    """Background host/device resource sampler
    (reference: src/utils/profiler.py:79-234)."""

    def __init__(self, interval_s: float = 0.5, window: int = 1200):
        self.interval_s = interval_s
        self.samples: deque = deque(maxlen=window)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _sample(self) -> Dict[str, float]:
        import psutil

        s = {
            "time": time.time(),
            "cpu_percent": psutil.cpu_percent(interval=None),
            "mem_percent": psutil.virtual_memory().percent,
            "mem_used_gb": psutil.virtual_memory().used / 2**30,
        }
        try:
            import jax

            stats = jax.devices()[0].memory_stats()
            if stats:
                s["device_mem_gb"] = stats.get("bytes_in_use", 0) / 2**30
                s["device_mem_limit_gb"] = stats.get("bytes_limit", 0) / 2**30
        except Exception:
            pass
        return s

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.is_set():
                try:
                    self.samples.append(self._sample())
                except Exception:
                    pass
                self._stop.wait(self.interval_s)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> Dict[str, float]:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2)
            self._thread = None
        return self.summary()

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        keys = [k for k in self.samples[0] if k != "time"]
        out = {}
        for k in keys:
            arr = np.asarray([s[k] for s in self.samples if k in s])
            if len(arr):
                out[f"{k}_mean"] = float(arr.mean())
                out[f"{k}_max"] = float(arr.max())
        return out
