#!/usr/bin/env python
"""Component-level serving ceiling probe -> tunnel_probe.json.

The sustained JPEG->boxes benchmark (scripts/serve_bench.py) measures a
closed-loop number that is dominated by the *deployment link* between host
and chip, not by the engine. This probe measures each component in
isolation so the ceiling analysis in SERVE_SUSTAINED_r{N}.json is built
from measurements, not derivations (VERDICT r2 weak #1):

  - trivial-op RTT and small-result pull RTT (per-batch fixed costs)
  - H2D bandwidth in a fresh process (no device->host pull yet)
  - H2D bandwidth after the first result pull (the tunnel degrades H2D to
    ~tens of MB/s for the remainder of the process — measured pathology,
    see .claude/skills/verify/SKILL.md)
  - D2H bandwidth
  - host JPEG decode + letterbox throughput (1-core host work per frame)

Phases that depend on process history (fresh vs degraded H2D) run in fresh
subprocesses; the orchestrator merges everything into one JSON.

Reference SLA being analyzed: mean <50 ms / p95 <100 ms
(reference: src/tests/test_inference.py:127-154).

Usage:
    python scripts/tunnel_probe.py --output tunnel_probe.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = 1e6


def _tpu():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


def phase_rtt() -> dict:
    """Round-trip costs of trivial dispatch and small result pulls."""
    jax = _tpu()
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(jnp.zeros(()))
    f(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        f(x).block_until_ready()
    rtt_block = (time.perf_counter() - t0) / n

    # Small-result pull (what finalize_batch pays per packed output array).
    small = jax.device_put(jnp.zeros((16, 100, 7), jnp.float32))
    np.asarray(small)  # first pull (may carry a one-time stall; not timed)
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(f(small))
    pull_small = (time.perf_counter() - t0) / n
    return {
        "trivial_op_block_ms": round(rtt_block * 1e3, 3),
        "small_result_pull_ms": round(pull_small * 1e3, 3),
        "n_iters": n,
    }


def phase_h2d(degrade_first: bool) -> dict:
    """H2D bandwidth; optionally after a first D2H pull (tunnel pathology)."""
    jax = _tpu()
    import jax.numpy as jnp

    if degrade_first:
        np.asarray(jax.device_put(jnp.ones((4,))))  # any pull flips the link
    rng = np.random.default_rng(0)
    # Incompressible payload the size of a raw-frame micro-batch
    # (16 x 480x640x3 uint8 = 14.7 MB). On the degraded link (35-51 MB/s
    # normally, far worse in bad tunnel weather — an r5 run blew a 600 s
    # phase budget) a smaller 2-frame payload keeps the phase bounded while
    # still measuring MB/s.
    frames = 2 if degrade_first else 16
    host = rng.integers(0, 255, (frames, 480, 640, 3), np.uint8)
    sizes = []
    jax.block_until_ready(jax.device_put(host))  # warm path/allocs
    for _ in range(3 if degrade_first else 5):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(host))
        sizes.append(host.nbytes / (time.perf_counter() - t0))
    return {
        "payload_mb": round(host.nbytes / MB, 1),
        "h2d_MBps_median": round(float(np.median(sizes)) / MB, 1),
        "h2d_MBps_best": round(float(np.max(sizes)) / MB, 1),
        "after_first_pull": degrade_first,
    }


def phase_d2h() -> dict:
    jax = _tpu()
    import jax.numpy as jnp

    # Pull a FRESH computed buffer each iter — np.asarray of an unchanged
    # array returns a cached host copy and measures nothing.
    f = jax.jit(lambda x: x + 1.0)
    dev = jax.device_put(jnp.ones((8, 416, 416, 3), jnp.float32))
    np.asarray(f(dev))  # compile + first pull not timed (one-time stall)
    rates = []
    for _ in range(5):
        y = f(dev)
        y.block_until_ready()  # time the transfer, not the compute
        t0 = time.perf_counter()
        out = np.asarray(y)
        rates.append(out.nbytes / (time.perf_counter() - t0))
    return {
        "payload_mb": round(out.nbytes / MB, 1),
        "d2h_MBps_median": round(float(np.median(rates)) / MB, 1),
    }


def phase_host() -> dict:
    """Host-side per-frame work: JPEG decode + letterbox (1 core, no TPU)."""
    import cv2

    from hvs_tpu.data.dataset import letterbox

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    blob = enc.tobytes()
    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        dec = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
    t_dec = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for _ in range(n):
        letterbox(dec, 416)
    t_lb = (time.perf_counter() - t0) / n
    return {
        "jpeg_decode_ms": round(t_dec * 1e3, 3),
        "jpeg_decode_fps": round(1 / t_dec, 1),
        "letterbox_416_ms": round(t_lb * 1e3, 3),
        "host_path_fps": round(1 / (t_dec + t_lb), 1),
    }


PHASES = {
    "rtt": phase_rtt,
    "h2d_fresh": lambda: phase_h2d(False),
    "h2d_degraded": lambda: phase_h2d(True),
    "d2h": phase_d2h,
    "host": phase_host,
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--phase", choices=sorted(PHASES), default=None)
    p.add_argument("--output", default="tunnel_probe.json")
    args = p.parse_args()

    if args.phase:
        print(json.dumps({args.phase: PHASES[args.phase]()}))
        return 0

    # Orchestrate: each phase in a fresh process (H2D state is per-process;
    # also the single TPU chip only admits one process at a time).
    merged: dict = {"measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    for name in ["host", "rtt", "h2d_fresh", "h2d_degraded", "d2h"]:
        line = []
        for attempt in (1, 2):  # retry once: tunnel weather is transient
            t0 = time.time()
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--phase", name],
                    capture_output=True, text=True, timeout=600,
                    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                )
            except subprocess.TimeoutExpired:
                print(f"phase {name} attempt {attempt} timed out", file=sys.stderr)
                continue
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if out.returncode == 0 and line:
                break
            print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
        if not line:
            # Record the failure but keep probing: a partial probe (e.g. no
            # degraded-link number in a bad-weather window) still anchors
            # the report; consumers fall back to explicit --floor-ms.
            merged[name] = {"error": "phase failed/timed out twice"}
            continue
        merged.update(json.loads(line[-1]))
        print(f"{name}: {json.dumps(merged[name])} ({time.time()-t0:.0f}s)",
              flush=True)
    with open(args.output, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
