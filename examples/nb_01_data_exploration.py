# %% [markdown]
# # 01 — Data exploration
#
# TPU-native counterpart of the reference's `notebooks/01_data_exploration.ipynb`:
# generate the synthetic-shapes detection benchmark, load it through the COCO
# adapter, inspect class balance / box statistics, and visualize samples with
# ground truth. Everything here is host-side numpy — no accelerator needed.
#
# Run as a script (`python examples/nb_01_data_exploration.py`) or open the
# generated notebook (`notebooks/01_data_exploration.ipynb`).

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

import numpy as np

TINY = bool(int(os.environ.get("HVS_NB_TINY", "0")))
OUT = os.environ.get("HVS_NB_OUT", "outputs/nb01")
os.makedirs(OUT, exist_ok=True)

# %% [markdown]
# ## Generate the benchmark
#
# 8 classes whose identity is *geometry only* (color is randomized per
# instance), cluttered backgrounds with unlabeled distractors, COCO layout.

# %%
from hvs_tpu.data import SHAPE_CLASSES, generate_shapes_dataset

root = os.path.join(OUT, "shapes")
n_train, n_val = (24, 8) if TINY else (200, 50)
paths = generate_shapes_dataset(root, num_train=n_train, num_val=n_val,
                                size=256, seed=0)
print("splits:", paths)
print("classes:", SHAPE_CLASSES)

# %% [markdown]
# ## Load through the COCO adapter
#
# `COCODataset` parses the instances JSON directly (no pycocotools), remaps
# category ids to contiguous `[0, C)`, and emits static-shape samples:
# letterboxed image, `max_boxes`-padded normalized cxcywh boxes + mask.

# %%
from hvs_tpu.data import COCODataset

ds = COCODataset(root=os.path.join(root, "train"),
                 annotation_file=paths["train"],
                 image_size=256, max_boxes=16)
print(f"{len(ds)} images, {len(ds.class_names)} classes")
sample = ds[0]
for k, v in sample.items():
    print(f"  {k}: shape={getattr(v, 'shape', v)} dtype={getattr(v, 'dtype', '')}")

# %% [markdown]
# ## Class balance and box statistics

# %%
dist = ds.class_distribution()
for cid, count in sorted(dist.items()):
    bar = "#" * max(1, count // 2)
    print(f"{ds.class_names[cid]:>10}: {count:4d} {bar}")

areas, aspects = [], []
for anns in ds.annotations.values():
    for a in anns:
        _, _, w, h = a["bbox"]
        areas.append(w * h)
        aspects.append(w / max(h, 1e-6))
areas, aspects = np.asarray(areas), np.asarray(aspects)
print(f"\nbox area   p10/p50/p90: {np.percentile(areas, [10, 50, 90]).round(0)}")
print(f"box aspect p10/p50/p90: {np.percentile(aspects, [10, 50, 90]).round(2)}")

# %% [markdown]
# ## Visualize ground truth

# %%
for i in range(min(3, len(ds))):
    path = ds.visualize_sample(i, os.path.join(OUT, f"gt_{i}.png"))
    print("wrote", path)

# %% [markdown]
# ## Augmentation pipeline
#
# The train transform composes flip / color jitter / crop / erasing (plus
# mosaic & mixup at the loader level — real implementations; the reference's
# were no-ops). Box coordinates ride along through every op.

# %%
from hvs_tpu.data import MHCTransformComposer
from hvs_tpu.data.dataset import load_image

tf = MHCTransformComposer.train_default(256)
info = ds.images[0]
img = load_image(ds._resolve_path(info["file_name"]))
anns = ds.annotations[info["id"]]
boxes = np.asarray([a["bbox"] for a in anns], np.float32)
labels = np.asarray([a["category_id"] for a in anns], np.int32)
aug_img, aug_boxes, aug_labels = tf(img, boxes.copy(), labels.copy())
print("before:", img.shape, len(boxes), "boxes")
print("after: ", aug_img.shape, len(aug_boxes), "boxes")

# %% [markdown]
# ## Batched loading
#
# `MHCDataLoader` is a thread-pool loader producing stacked numpy batches with
# static shapes — every batch compiles to the same XLA program.

# %%
from hvs_tpu.data import MHCDataLoader

loader = MHCDataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                       drop_last=True)
batch = next(iter(loader))
print({k: v.shape for k, v in batch.items()})
print("boxes per image in batch:", batch["box_mask"].sum(-1))
