"""On-chip A/B of class-loss fixes for 80-way convergence.

Arms (fresh init each, overfit 64 images @640, 900 steps):
  A: bce + cls_pos_weight=79 (balanced BCE, keeps sigmoid serve scoring)
  B: softmax CE (smoothed)
Metric: class argmax accuracy at GT-assigned cells + sigmoid(true logit)
(the serve score path) + obj_p at positives, probed every 300 steps.
Baseline (plain bce, same protocol, 1500 steps): argmax accuracy 0.000.

Measured on v5e 2026-08-19 (artifacts/r5_logs/cls_loss_ab.log):
  A: acc 1.000@300 steps, true_sig 0.96 — but obj_p stalls at 0.28-0.31 and
     obj_loss at 1.3: the pos-weighted cls term (cls_loss ~63-76) dominates
     the shared tower's gradient mass and drowns the objectness signal.
  B: acc 1.000@600, true_sig 0.964, obj_p 0.78, obj_loss 0.119 — balanced
     loss magnitudes let every term converge. WINNER: --cls-loss softmax.
"""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from hvs_tpu.config import ModelConfig
from hvs_tpu.data import load_coco_arrays
from hvs_tpu.training import ManifoldConstrainedTrainer, TrainerConfig
from hvs_tpu.training.losses import build_targets
from hvs_tpu.utils import enable_compile_cache

enable_compile_cache()
imgs, boxes, labels, mask = load_coco_arrays('data/shapes80_640', 'train', max_boxes=16, limit=64)
print("loaded", imgs.shape, "n_boxes", mask.sum(), flush=True)
B = 8

mcfg = ModelConfig(); mcfg.detection.num_classes = 80


def make_probe(model):
    @jax.jit
    def _probe(params, images, gboxes, glabels, gmask):
        x = images.astype(jnp.float32) / 255.0
        from hvs_tpu.constants import IMAGENET_MEAN, IMAGENET_STD
        x = (x - jnp.asarray(IMAGENET_MEAN, jnp.float32)) / jnp.asarray(IMAGENET_STD, jnp.float32)
        out = model.apply({"params": params}, x, task="detection")
        raw = out["detection"]["raw"]
        grids = [(raw[k].shape[1], raw[k].shape[2]) for k in ("fused_small", "fused_medium", "fused_large")]
        tg = build_targets(gboxes, glabels, gmask, grids, 80)
        accs, objs, tsigs = [], [], []
        npos_tot = 0.0
        acc_num = 0.0; obj_num = 0.0; tsig_num = 0.0
        for k in ("fused_small", "fused_medium", "fused_large"):
            v = raw[k].astype(jnp.float32)
            t = tg[k]
            pos = t["obj"]
            n = jnp.sum(pos)
            cls_logit = v[..., 5:]
            am = jnp.argmax(cls_logit, -1)
            hit = (am == t["cls"]).astype(jnp.float32) * pos
            obj_p = jax.nn.sigmoid(v[..., 4]) * pos
            tsig = jax.nn.sigmoid(
                jnp.take_along_axis(cls_logit, t["cls"][..., None], axis=-1)[..., 0]
            ) * pos
            acc_num += jnp.sum(hit); obj_num += jnp.sum(obj_p); tsig_num += jnp.sum(tsig)
            npos_tot += n
        d = jnp.maximum(npos_tot, 1.0)
        return acc_num / d, obj_num / d, tsig_num / d, npos_tot
    return _probe


def run_arm(name, **cfg_over):
    cfg = TrainerConfig(num_classes=80, learning_rate=1e-3, warmup_steps=100,
                        total_steps=2000, ema_decay=0.0, max_boxes=16,
                        checkpoint_dir='/tmp/ab_ckpt', **cfg_over)
    model = mcfg.build_model(monitor=True)
    tr = ManifoldConstrainedTrainer(model, cfg, rng=jax.random.PRNGKey(1))
    batch0 = {"images": imgs[:B], "boxes": boxes[:B], "labels": labels[:B], "box_mask": mask[:B]}
    tr.init_state(batch0)
    pr = make_probe(model)
    t0 = time.time()
    for step in range(1, 901):
        i = (step % 8) * 8
        b = {"images": imgs[i:i+B], "boxes": boxes[i:i+B], "labels": labels[i:i+B], "box_mask": mask[i:i+B]}
        m = tr.train_step(b)
        if step % 300 == 0 or step == 1:
            host = {k: round(float(v), 3) for k, v in jax.device_get(m).items()
                    if k in ("loss", "box_loss", "obj_loss", "cls_loss")}
            acc, objp, tsig, npos = jax.device_get(pr(
                tr.state.params, jnp.asarray(imgs[:32]), jnp.asarray(boxes[:32]),
                jnp.asarray(labels[:32]), jnp.asarray(mask[:32])))
            print(f"[{name}] step {step} ({time.time()-t0:.0f}s): {host} "
                  f"| probe acc={float(acc):.3f} obj_p={float(objp):.3f} "
                  f"true_sig={float(tsig):.3f} npos={float(npos):.0f}", flush=True)
    return


run_arm("A:bce_pw79", cls_mode="bce", cls_pos_weight=79.0)
run_arm("B:softmax", cls_mode="softmax")
print("done", flush=True)
