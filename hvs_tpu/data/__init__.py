"""Data pipeline (reference: src/data/__init__.py:3-26 — including the
camera-stream API its broken streaming.py never actually defined)."""

from .dataset import BaseVisionDataset, letterbox, load_image
from .coco import COCODataset, COCODataModule
from .shapes import (
    SHAPE_CLASSES,
    SHAPE80_CLASSES,
    class_names_for,
    generate_dataset as generate_shapes_dataset,
    generate_image as generate_shapes_image,
)
from .transforms import (
    MHCTransformComposer,
    AdaptiveAugmentation,
    batch_augment_device,
    mosaic,
    mixup,
    hflip,
    color_jitter,
    random_resized_crop,
    rotate_small,
    random_erasing,
)
from .device_pipeline import (
    DeviceData,
    AugmentConfig,
    load_coco_arrays,
    put_device_data,
    sample_batch,
    eval_batch,
)
from .loader import (
    MHCDataLoader,
    StreamingDataLoader,
    ShardedDataLoader,
    default_collate,
)
from .streaming import (
    StreamType,
    StreamConfig,
    Frame,
    RoboticCameraStream,
    MultiCameraManager,
)

__all__ = [
    "BaseVisionDataset", "letterbox", "load_image",
    "COCODataset", "COCODataModule",
    "SHAPE_CLASSES", "SHAPE80_CLASSES", "class_names_for",
    "generate_shapes_dataset", "generate_shapes_image",
    "MHCTransformComposer", "AdaptiveAugmentation", "batch_augment_device",
    "mosaic", "mixup", "hflip", "color_jitter", "random_resized_crop",
    "rotate_small", "random_erasing",
    "DeviceData", "AugmentConfig", "load_coco_arrays", "put_device_data",
    "sample_batch", "eval_batch",
    "MHCDataLoader", "StreamingDataLoader", "ShardedDataLoader", "default_collate",
    "StreamType", "StreamConfig", "Frame", "RoboticCameraStream",
    "MultiCameraManager",
]
