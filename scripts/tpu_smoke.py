#!/usr/bin/env python
"""On-TPU smoke test: one train step + engine warmup + one serve, tiny shapes.

The pytest suite runs on a virtual CPU mesh; this script is the fast
real-hardware lane (run it whenever the chip is idle):

    python scripts/tpu_smoke.py            # ~2 min with a warm compile cache

Exits nonzero on any failure. Covers: jitted init, train step (loss finite,
grads flow), Sinkhorn DS property on device, engine end-to-end
(uint8 image -> letterbox -> forward -> decode -> NMS -> boxes).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    t_start = time.time()
    import jax

    from hvs_tpu.utils import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    # --- ops sanity: Sinkhorn DS property in bf16 range on device.
    import jax.numpy as jnp

    from hvs_tpu.ops import doubly_stochastic_error, sinkhorn_log

    p = jax.jit(lambda m: sinkhorn_log(m, n_iters=20))(
        jax.random.normal(jax.random.PRNGKey(0), (256, 256))
    )
    ds = float(doubly_stochastic_error(p))
    assert ds < 1e-3, f"sinkhorn DS error {ds}"
    print(f"sinkhorn OK (ds_error={ds:.2e})", flush=True)

    # --- one train step, tiny model.
    from hvs_tpu.models import HybridVisionSystem
    from hvs_tpu.training import ManifoldConstrainedTrainer, TrainerConfig

    model = HybridVisionSystem(
        num_classes=8, base_channels=8, stage_channels=(16, 24, 32, 40),
        stage_blocks=(1, 1, 1, 1), vit_dim=16, vit_depth=1, vit_heads=2,
        fpn_channels=16, head_channels=16, feature_dim=32, sk_iters=5,
        dropout_rate=0.1,
    )
    trainer = ManifoldConstrainedTrainer(
        model, TrainerConfig(num_classes=8, sk_iters=5, project_every=2)
    )
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8),
        "boxes": np.clip(rng.uniform(0.2, 0.8, (2, 8, 4)), 0, 1).astype(np.float32),
        "labels": rng.integers(0, 8, (2, 8)).astype(np.int32),
        "box_mask": np.ones((2, 8), np.float32),
    }
    trainer.init_state(batch)
    m1 = trainer.train_step(batch)
    m2 = trainer.train_step(batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m2["grad_norm"]) > 0
    print(f"train step OK (loss={float(m2['loss']):.3f}, "
          f"grad_norm={float(m2['grad_norm']):.2f})", flush=True)

    # --- engine end-to-end serve.
    from hvs_tpu.config import InferenceConfig, ModelConfig
    from hvs_tpu.inference import InferenceEngine

    mcfg = ModelConfig()
    mcfg.backbone.stage_channels = (16, 24, 32, 40)
    mcfg.backbone.stage_blocks = (1, 1, 1, 1)
    mcfg.vit.dim = 16
    mcfg.vit.depth = 1
    mcfg.vit.num_heads = 2
    mcfg.fusion.fpn_channels = 16
    mcfg.detection.head_channels = 16
    mcfg.detection.num_classes = 8
    mcfg.mhc.sinkhorn_iterations = 5
    icfg = InferenceConfig()
    icfg.preprocessing.image_size = 64
    icfg.performance.batch_buckets = (1, 4)
    engine = InferenceEngine(mcfg, icfg)
    engine.warmup()
    det = engine.infer(rng.integers(0, 255, (100, 140, 3), np.uint8))
    assert det.boxes.shape[1] == 4 and np.isfinite(det.scores).all()
    # Hot swap must not recompile (weights are jit arguments).
    engine.reload(engine.variables)
    det2 = engine.infer(rng.integers(0, 255, (100, 140, 3), np.uint8))
    assert np.isfinite(det2.scores).all()
    print(f"engine OK ({len(det.boxes)} boxes, "
          f"latency {det.latency_ms:.1f} ms incl. tunnel)", flush=True)

    print(f"TPU SMOKE PASS in {time.time() - t_start:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
