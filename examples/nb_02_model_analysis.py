# %% [markdown]
# # 02 — Model analysis
#
# TPU-native counterpart of the reference's `notebooks/02_model_analysis.ipynb`:
# build the hybrid CNN+ViT detector, count parameters per subsystem, check the
# mHC manifold constraints, and read XLA's own cost analysis for the jitted
# forward (the TPU answer to per-layer GPU hook profiling — under fusion the
# compiled program, not the Python module tree, is the ground truth).

# %%
import functools
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
import jax.numpy as jnp
import numpy as np

TINY = bool(int(os.environ.get("HVS_NB_TINY", "0")))
print("devices:", jax.devices())

# %% [markdown]
# ## Build the flagship model
#
# `HybridVisionSystem` = CNN backbone (NHWC, GroupNorm, bottleneck mHC) →
# ViT encoder over the coarsest scale → FPN fusion → YOLO head, with
# manifold-hyper-connected residual streams throughout.

# %%
from hvs_tpu.models import HybridVisionSystem

if TINY:
    model = HybridVisionSystem(
        num_classes=8, base_channels=8, stage_channels=(16, 24, 32, 40),
        stage_blocks=(1, 1, 1, 1), vit_dim=16, vit_depth=1, vit_heads=2,
        fpn_channels=16, head_channels=16, feature_dim=32, sk_iters=5,
    )
    size = 64
else:
    model = HybridVisionSystem()
    size = 320

images = jnp.zeros((1, size, size, 3), jnp.float32)
variables = jax.jit(functools.partial(model.init, task="detection"))(
    jax.random.PRNGKey(0), images
)
params = variables["params"]

# %% [markdown]
# ## Parameters per subsystem (reference budget: 10–30M total, 2–5M backbone)

# %%
totals = {}
for top, sub in params.items():
    totals[top] = sum(p.size for p in jax.tree_util.tree_leaves(sub))
width = max(len(k) for k in totals)
for k, v in sorted(totals.items(), key=lambda kv: -kv[1]):
    print(f"{k:>{width}}: {v / 1e6:7.3f} M")
print(f"{'TOTAL':>{width}}: {sum(totals.values()) / 1e6:7.3f} M")

# %% [markdown]
# ## Forward pass + output surfaces

# %%
out = jax.jit(functools.partial(model.apply, task="detection"))(variables, images)
for scale, pred in out["detection"]["raw"].items():
    print(f"{scale}: {pred.shape}  (B, H, W, anchors, 5+C)")
print("decoded boxes:", out["detection"]["boxes"].shape)
print("features:", out["features"].shape)

# %% [markdown]
# ## mHC constraint health
#
# Every mHC layer's mixing matrix must stay doubly stochastic (Birkhoff
# polytope). `collect_stability_metrics` runs a forward with the `stability`
# telemetry collection and reports the worst DS error over all layers.

# %%
from hvs_tpu.models import collect_stability_metrics

mon_model = model.clone(monitor=True)
_, coll = mon_model.apply(variables, images, task="detection",
                          mutable=["stability"])
stab = collect_stability_metrics(coll["stability"])
print("layers monitored:", stab["num_layers"])
print("worst DS error:  ", f"{stab['ds_error_max']:.3e}")

# %% [markdown]
# ## The math core in isolation: Sinkhorn on device
#
# Log-domain Sinkhorn under `lax.fori_loop`, fp32 potentials — bf16-safe.

# %%
from hvs_tpu.ops import doubly_stochastic_error, sinkhorn_log

m = jax.random.normal(jax.random.PRNGKey(1), (64, 64))
p = jax.jit(lambda x: sinkhorn_log(x, n_iters=20))(m)
print("row sums ~1:", np.asarray(p.sum(1))[:4].round(4))
print("col sums ~1:", np.asarray(p.sum(0))[:4].round(4))
print("DS error:", float(doubly_stochastic_error(p)))

# %% [markdown]
# ## XLA cost analysis of the compiled forward
#
# FLOPs and bytes for the *fused* program — what the chip actually runs.

# %%
from hvs_tpu.utils import ModelProfiler

prof = ModelProfiler(
    jax.jit(functools.partial(model.apply, task="detection")), variables, images
)
report = prof.profile(iters=5)
print(f"flops:           {report.flops and int(report.flops):,}")
print(f"bytes accessed:  {report.bytes_accessed and int(report.bytes_accessed):,}")
print(f"wall time:       {report.wall_time_ms:.2f} ms")
print(f"achieved TFLOPs: {report.achieved_tflops}")
for r in report.recommendations:
    print("  -", r)
