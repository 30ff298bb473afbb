# %% [markdown]
# # 03 — Training analysis
#
# TPU-native counterpart of the reference's `notebooks/03_training_analysis.ipynb`:
# run a short manifold-constrained training, then analyze what the trainer
# records — per-step JSONL metrics, the stability monitor's report, the
# EMA/adaptive-LR machinery — the same artifacts a real long run produces
# (`logs/<run>/steps.jsonl`, summarized by `scripts/summarize_run.py`).

# %%
import os
import sys

# Works as a script (repo/examples/) AND inside a notebook kernel
# (cwd = repo root, no __file__).
sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "__file__" in globals() else os.getcwd(),
)

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin overrides env alone

import jax
import numpy as np

TINY = bool(int(os.environ.get("HVS_NB_TINY", "0")))
OUT = os.environ.get("HVS_NB_OUT", "outputs/nb03")
os.makedirs(OUT, exist_ok=True)
STEPS = 8 if TINY else 60

# %% [markdown]
# ## A tiny model + synthetic detection batches
#
# Training needs no real dataset to study *stability*: random images with
# random (valid) boxes exercise the full loss/optimizer/constraint path.

# %%
from hvs_tpu.models import HybridVisionSystem
from hvs_tpu.training import ManifoldConstrainedTrainer, TrainerConfig

model = HybridVisionSystem(
    num_classes=8, base_channels=8, stage_channels=(16, 24, 32, 40),
    stage_blocks=(1, 1, 1, 1), vit_dim=16, vit_depth=1, vit_heads=2,
    fpn_channels=16, head_channels=16, feature_dim=32, sk_iters=5,
)
cfg = TrainerConfig(
    num_classes=8, sk_iters=5, learning_rate=1e-3,
    metrics_log=os.path.join(OUT, "steps.jsonl"),
    stability_check_every=5, ema_decay=0.99,
)
trainer = ManifoldConstrainedTrainer(model, cfg, rng=jax.random.PRNGKey(0))


def batches(n, batch=4, size=64, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield {
            "images": rng.standard_normal((batch, size, size, 3)).astype(np.float32),
            "boxes": np.clip(rng.uniform(0.2, 0.8, (batch, 8, 4)), 0, 1).astype(np.float32),
            "labels": rng.integers(0, 8, (batch, 8)).astype(np.int32),
            "box_mask": np.ones((batch, 8), np.float32),
        }


trainer.init_state(next(batches(1)))
print("params:", sum(p.size for p in jax.tree_util.tree_leaves(trainer.state.params)))

# %% [markdown]
# ## Train and watch the curves

# %%
metrics = trainer.train_epoch(batches(STEPS), epoch=0)
print({k: round(v, 4) for k, v in metrics.items()})

# %% [markdown]
# ## Per-step metrics (what a long run writes to steps.jsonl)

# %%
import json

rows = [json.loads(l) for l in open(cfg.metrics_log)]
loss = np.asarray([r["loss"] for r in rows])
grad = np.asarray([r["grad_norm"] for r in rows])
print(f"steps logged: {len(rows)}")
print(f"loss:  first={loss[0]:.3f} last={loss[-1]:.3f} min={loss.min():.3f}")
print(f"grad norm: p50={np.percentile(grad, 50):.2f} max={grad.max():.2f}")
print(f"all finite: {bool(np.isfinite(loss).all() and np.isfinite(grad).all())}")

# %% [markdown]
# ## Stability monitor report
#
# The monitor consumes window *maxima* between periodic checks (a one-step
# spike cannot slip between samples) and applies LR corrections as data
# (`lr_scale` array — never a recompile).

# %%
report_path = os.path.join(OUT, "stability_report.json")
trainer.monitor.save_report(report_path)
rep = json.load(open(report_path))
print("alerts:", len(rep.get("alerts", [])))
print("corrections:", len(rep.get("corrections", [])))
print("lr_scale now:", float(trainer.state.lr_scale))

# %% [markdown]
# ## EMA weights
#
# `ema_params` update every step, persist in checkpoints, and serve eval —
# compare the EMA copy's distance from the live params.

# %%
if trainer.state.ema_params is not None:
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a - b)).max()),
        trainer.state.params, trainer.state.ema_params,
    )
    worst = max(jax.tree_util.tree_leaves(d))
    print(f"max |param - ema| after {STEPS} steps: {worst:.4f}")

# %% [markdown]
# ## Checkpoint round-trip (orbax: params + opt state + step + EMA)

# %%
ckpt_dir = os.path.join(OUT, "ckpt")
trainer.config.checkpoint_dir = ckpt_dir
path = trainer.save_checkpoint("demo")
step_before = int(trainer.state.step)
trainer.load_checkpoint(path)
assert int(trainer.state.step) == step_before
print("checkpoint round-trip OK at step", step_before)
