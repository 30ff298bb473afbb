#!/usr/bin/env python
"""Summarize a long training run's step log into a stability artifact.

Consumes the trainer's per-step JSONL metrics (TrainerConfig.metrics_log) and
emits the evidence the reference claims narratively (">100k steps without
divergence", reference README.md:182): step count, finiteness, loss trend,
gradient-norm distribution, DS-error ceiling, lr_scale interventions.

Usage:
    python scripts/summarize_run.py --steps logs/shapes/steps.jsonl \
        --report logs/shapes/stability_report.json --output STABILITY_r02.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", default="logs/shapes/steps.jsonl")
    p.add_argument("--report", default=None, help="StabilityMonitor JSON report")
    p.add_argument("--chunks", default=None,
                   help="train_chunked chunks.jsonl (eigenvalue telemetry)")
    p.add_argument("--output", default="STABILITY.json")
    args = p.parse_args()

    rows = [json.loads(l) for l in open(args.steps)]
    # A resumed run replays steps between its restore point and the crash
    # point; keep the last record per step so counts reflect unique steps.
    by_step = {}
    for r in rows:
        by_step[r["step"]] = r
    rows = [by_step[s] for s in sorted(by_step)]
    loss = np.asarray([r["loss"] for r in rows], np.float64)
    grad = np.asarray([r["grad_norm"] for r in rows], np.float64)
    lr = np.asarray([r.get("lr_scale", 1.0) for r in rows], np.float64)
    t = np.asarray([r["time"] for r in rows], np.float64)
    ds = np.asarray([r["ds_error_max"] for r in rows if "ds_error_max" in r],
                    np.float64)

    n = len(rows)
    k = max(n // 20, 1)
    window_means = [float(loss[i:i + k].mean()) for i in range(0, n - k + 1, k)]
    gaps = np.diff(t)
    stepping = gaps[gaps < 5.0]  # exclude validation/checkpoint pauses
    # Chunked on-device runs log a whole chunk's rows at once (identical
    # timestamps) — per-row gaps are then meaningless; rate = span-based.
    chunked = stepping.size and np.median(stepping) < 1e-4
    span = max(t[-1] - t[0], 1e-9)
    rate = (n - 1) / span if chunked else float(1.0 / np.median(stepping))

    out = {
        "steps": n,
        "all_finite": bool(np.isfinite(loss).all() and np.isfinite(grad).all()),
        "loss_first_1pct_mean": float(loss[: max(n // 100, 1)].mean()),
        "loss_last_1pct_mean": float(loss[-max(n // 100, 1):].mean()),
        "loss_min": float(loss.min()),
        "loss_window_means": [round(v, 3) for v in window_means],
        "grad_norm": {
            "p50": float(np.percentile(grad, 50)),
            "p95": float(np.percentile(grad, 95)),
            "max": float(grad.max()),
        },
        "ds_error_max_overall": float(ds.max()) if ds.size else None,
        "lr_scale_final": float(lr[-1]),
        "lr_scale_min": float(lr.min()),
        "steps_per_sec_median": float(rate),
        "wall_hours": float((t[-1] - t[0]) / 3600),
        "diverged": bool(
            not np.isfinite(loss).all()
            or loss[-max(n // 100, 1):].mean() > loss[: max(n // 100, 1)].mean()
        ),
    }
    if args.chunks and os.path.exists(args.chunks):
        # Low-frequency eigenvalue spectra of every Sinkhorn-projected H_res
        # (the architecture's non-expansiveness guarantee: max eig <= 1).
        crows = [json.loads(l) for l in open(args.chunks)]
        eig = [r["eig_max_eigenvalue"] for r in crows
               if r.get("eig_max_eigenvalue") is not None]
        dsp = [r.get("eig_ds_error_max_proj") for r in crows
               if r.get("eig_ds_error_max_proj") is not None]
        if eig:
            stride = max(len(eig) // 50, 1)
            out["eigenvalue_telemetry"] = {
                "samples": len(eig),
                "max_eigenvalue_overall": float(np.max(eig)),
                "max_eigenvalue_final": float(eig[-1]),
                "constraint_satisfied": bool(np.max(eig) <= 1.0 + 1e-3),
                "series_sampled": [round(float(v), 6) for v in eig[::stride]],
            }
        if dsp:
            out["ds_error_proj_max_overall"] = float(np.max(dsp))
    if args.report and os.path.exists(args.report):
        rep = json.load(open(args.report))
        out["monitor"] = {
            "num_alerts": len(rep.get("alerts", [])),
            "num_corrections": len(rep.get("corrections", [])),
            "loss_trend_slope": rep.get("loss_trend"),
        }
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
