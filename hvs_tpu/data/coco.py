"""COCO adapter: reads instances_*.json directly (no pycocotools dependency).

TPU-native redesign of the reference COCO layer
(reference: src/data/coco.py:1-402). pycocotools is absent in this
environment; the instances JSON is parsed directly, with category-id
remapping to contiguous [0, 80), class filtering, empty-image filtering, and a
Lightning-style :class:`COCODataModule` (reference :268-402).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .dataset import BaseVisionDataset
from .loader import MHCDataLoader
from .transforms import MHCTransformComposer


class COCODataset(BaseVisionDataset):
    """COCO instances dataset (reference: COCODataset, src/data/coco.py:1-266)."""

    def __init__(
        self,
        root: str,
        annotation_file: str,
        image_dir: Optional[str] = None,
        image_size: int = 416,
        max_boxes: int = 64,
        transform=None,
        class_filter: Optional[Sequence[str]] = None,
        max_samples: Optional[int] = None,
        skip_empty: bool = True,
        normalize: bool = True,
        cache_images: bool = False,
        as_uint8: bool = False,
    ):
        with open(annotation_file) as f:
            coco = json.load(f)

        categories = sorted(coco.get("categories", []), key=lambda c: c["id"])
        self.cat_id_to_contiguous = {c["id"]: i for i, c in enumerate(categories)}
        class_names = [c["name"] for c in categories]

        keep_contiguous = None
        if class_filter:
            keep_contiguous = {
                i for i, name in enumerate(class_names) if name in set(class_filter)
            }

        images = coco.get("images", [])
        annotations = []
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            cid = self.cat_id_to_contiguous.get(a["category_id"])
            if cid is None:
                continue
            if keep_contiguous is not None and cid not in keep_contiguous:
                continue
            annotations.append(
                {
                    "image_id": a["image_id"],
                    "bbox": a["bbox"],
                    "category_id": cid,
                    "segmentation": a.get("segmentation"),
                }
            )

        std_path = annotation_file + ".standardized.json"
        std = {"images": images, "annotations": annotations}
        # Write the standardized view next to the source once (cache).
        try:
            if not os.path.exists(std_path) or os.path.getmtime(std_path) < os.path.getmtime(annotation_file):
                with open(std_path, "w") as f:
                    json.dump(std, f)
        except OSError:
            import tempfile

            std_path = os.path.join(tempfile.gettempdir(), "coco_std.json")
            with open(std_path, "w") as f:
                json.dump(std, f)

        super().__init__(
            root=image_dir or root,
            annotation_file=std_path,
            image_size=image_size,
            max_boxes=max_boxes,
            transform=transform,
            class_names=class_names,
            max_samples=max_samples,
            skip_empty=skip_empty,
            normalize=normalize,
            cache_images=cache_images,
            as_uint8=as_uint8,
        )


class COCODataModule:
    """Train/val loader factory (reference: COCODataModule, src/data/coco.py:268-402)."""

    def __init__(
        self,
        root: str,
        image_size: int = 416,
        batch_size: int = 8,
        max_boxes: int = 64,
        num_workers: int = 2,
        train_split: str = "train2017",
        val_split: str = "val2017",
        max_samples: Optional[int] = None,
        augmentation_config=None,
        cache_images: bool = False,
        as_uint8: bool = True,
    ):
        self.root = root
        self.image_size = image_size
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.num_workers = num_workers
        self.train_split = train_split
        self.val_split = val_split
        self.max_samples = max_samples
        self.augmentation_config = augmentation_config
        self.cache_images = cache_images
        self.as_uint8 = as_uint8
        self.train_dataset: Optional[COCODataset] = None
        self.val_dataset: Optional[COCODataset] = None

    def _ann(self, split: str) -> str:
        return os.path.join(self.root, "annotations", f"instances_{split}.json")

    def setup(self) -> None:
        train_tf = MHCTransformComposer.train_default(
            self.image_size, self.augmentation_config
        )
        self.train_dataset = COCODataset(
            root=os.path.join(self.root, self.train_split),
            annotation_file=self._ann(self.train_split),
            image_size=self.image_size,
            max_boxes=self.max_boxes,
            transform=train_tf,
            max_samples=self.max_samples,
            cache_images=self.cache_images,
            as_uint8=self.as_uint8,
        )
        self.val_dataset = COCODataset(
            root=os.path.join(self.root, self.val_split),
            annotation_file=self._ann(self.val_split),
            image_size=self.image_size,
            max_boxes=self.max_boxes,
            transform=None,
            max_samples=self.max_samples,
            cache_images=self.cache_images,
            as_uint8=self.as_uint8,
        )

    def train_dataloader(self) -> MHCDataLoader:
        assert self.train_dataset is not None, "call setup() first"
        return MHCDataLoader(
            self.train_dataset, batch_size=self.batch_size, shuffle=True,
            num_workers=self.num_workers, drop_last=True,
        )

    def val_dataloader(self) -> MHCDataLoader:
        assert self.val_dataset is not None, "call setup() first"
        return MHCDataLoader(
            self.val_dataset, batch_size=self.batch_size, shuffle=False,
            num_workers=self.num_workers, drop_last=True,
        )
