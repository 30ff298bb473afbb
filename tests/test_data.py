"""Data pipeline tests over a temp-dir synthetic dataset
(behavioral spec: reference src/tests/test_data.py:36-577)."""

import json
import os

import numpy as np
import pytest

from hvs_tpu.data import (
    BaseVisionDataset,
    COCODataset,
    MHCDataLoader,
    MHCTransformComposer,
    MultiCameraManager,
    RoboticCameraStream,
    ShardedDataLoader,
    StreamConfig,
    StreamType,
    default_collate,
    hflip,
    letterbox,
    mixup,
    mosaic,
    random_resized_crop,
    rotate_small,
)


@pytest.fixture(scope="module")
def synthetic_dataset_dir(tmp_path_factory):
    """cv2-written JPEGs + JSON annotations (reference test_data.py:36-88)."""
    import cv2

    root = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(6):
        h, w = int(rng.integers(60, 120)), int(rng.integers(60, 120))
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"img_{i}.jpg"
        cv2.imwrite(str(root / name), img)
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        for j in range(int(rng.integers(1, 4))):
            bw, bh = int(rng.integers(10, 30)), int(rng.integers(10, 30))
            x = int(rng.integers(0, max(w - bw, 1)))
            y = int(rng.integers(0, max(h - bh, 1)))
            annotations.append(
                {"image_id": i, "bbox": [x, y, bw, bh],
                 "category_id": int(rng.integers(0, 4))}
            )
    ann_path = root / "annotations.json"
    ann_path.write_text(json.dumps({"images": images, "annotations": annotations}))
    return root, str(ann_path)


def test_dataset_sample_shapes(synthetic_dataset_dir):
    root, ann = synthetic_dataset_dir
    ds = BaseVisionDataset(str(root), ann, image_size=64, max_boxes=8)
    assert len(ds) == 6
    s = ds[0]
    assert s["images"].shape == (64, 64, 3)
    assert s["boxes"].shape == (8, 4)
    assert s["labels"].shape == (8,)
    assert s["box_mask"].sum() >= 1
    # normalized cxcywh in [0, 1]
    valid = s["boxes"][s["box_mask"] > 0]
    assert np.all(valid >= 0) and np.all(valid <= 1)


def test_letterbox_geometry():
    img = np.zeros((50, 100, 3), np.uint8)
    out, scale, (px, py) = letterbox(img, 64, pad_value=114)
    assert out.shape == (64, 64, 3)
    assert scale == 64 / 100
    assert py == (64 - 32) // 2
    assert out[0, 0, 0] == 114  # padding
    assert out[py + 1, px + 1, 0] == 0  # content


def test_class_distribution(synthetic_dataset_dir):
    root, ann = synthetic_dataset_dir
    ds = BaseVisionDataset(str(root), ann, image_size=64)
    dist = ds.class_distribution()
    assert sum(dist.values()) > 0


def test_corrupt_image_raises(synthetic_dataset_dir, tmp_path):
    """(reference test_data.py:151)"""
    root, ann = synthetic_dataset_dir
    bad = {"images": [{"id": 0, "file_name": "missing.jpg", "width": 10, "height": 10}],
           "annotations": []}
    bad_ann = tmp_path / "bad.json"
    bad_ann.write_text(json.dumps(bad))
    ds = BaseVisionDataset(str(root), str(bad_ann), image_size=64)
    with pytest.raises(FileNotFoundError):
        _ = ds[0]


# ---------------- transforms (reference test_data.py:268) ----------------


def test_hflip_box_math():
    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[10.0, 20.0, 30.0, 40.0]])  # x,y,w,h
    out, nb, _ = hflip(img, boxes, np.array([0]), np.random.default_rng(0))
    assert nb[0, 0] == 200 - 10 - 30
    assert nb[0, 1] == 20 and nb[0, 2] == 30


def test_crop_keeps_valid_boxes():
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[40.0, 40.0, 20.0, 20.0]])
    rng = np.random.default_rng(1)
    out, nb, nl = random_resized_crop(img, boxes, np.array([1]), rng, min_scale=0.9)
    assert out.shape[0] <= 100
    if len(nb):
        assert np.all(nb[:, 2] > 0)


def test_rotation_preserves_count_for_small_angle():
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[40.0, 40.0, 20.0, 20.0]])
    out, nb, _ = rotate_small(img, boxes, np.array([0]), np.random.default_rng(0), 3.0)
    assert len(nb) == 1
    assert abs(nb[0, 2] - 20) < 6  # AABB grows slightly


def test_mosaic_combines_four():
    rng = np.random.default_rng(0)
    samples = []
    for i in range(4):
        img = np.full((50, 50, 3), i * 40, np.uint8)
        boxes = np.array([[10.0, 10.0, 20.0, 20.0]])
        samples.append((img, boxes, np.array([i])))
    img, boxes, labels = mosaic(samples, rng, out_size=100)
    assert img.shape == (100, 100, 3)
    assert len(boxes) == 4
    assert set(labels.tolist()) == {0, 1, 2, 3}


def test_mixup_unions_boxes():
    a = (np.zeros((40, 40, 3), np.uint8), np.array([[1.0, 1, 5, 5]]), np.array([0]))
    b = (np.full((40, 40, 3), 255, np.uint8), np.array([[2.0, 2, 6, 6]]), np.array([1]))
    img, boxes, labels = mixup(a, b, np.random.default_rng(0))
    assert len(boxes) == 2 and len(labels) == 2
    assert 0 < img.mean() < 255


def test_composer_runs(synthetic_dataset_dir):
    root, ann = synthetic_dataset_dir
    tf = MHCTransformComposer(seed=0)
    ds = BaseVisionDataset(str(root), ann, image_size=64, transform=tf)
    s = ds[0]
    assert s["images"].shape == (64, 64, 3)


# ---------------- loaders (reference test_data.py:346-494) ----------------


def test_loader_batching(synthetic_dataset_dir):
    root, ann = synthetic_dataset_dir
    ds = BaseVisionDataset(str(root), ann, image_size=64, max_boxes=8)
    loader = MHCDataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["images"].shape == (2, 64, 64, 3)
    assert batches[0]["boxes"].shape == (2, 8, 4)


def test_loader_shuffle_changes_with_epoch(synthetic_dataset_dir):
    root, ann = synthetic_dataset_dir
    ds = BaseVisionDataset(str(root), ann, image_size=64)
    loader = MHCDataLoader(ds, batch_size=2, shuffle=True, num_workers=1)
    ids1 = [b["image_id"].tolist() for b in loader]
    ids2 = [b["image_id"].tolist() for b in loader]  # epoch auto-advances
    assert ids1 != ids2 or len(ids1) == 1


def test_loader_grad_accumulation(synthetic_dataset_dir):
    root, ann = synthetic_dataset_dir
    ds = BaseVisionDataset(str(root), ann, image_size=64)
    loader = MHCDataLoader(ds, batch_size=2, num_workers=1,
                           gradient_accumulation_steps=2)
    batches = list(loader)
    assert batches[0]["images"].shape[0] == 4  # merged micro-batches


def test_sharded_loader(synthetic_dataset_dir):
    import jax

    from hvs_tpu.parallel import make_mesh

    root, ann = synthetic_dataset_dir
    ds = BaseVisionDataset(str(root), ann, image_size=64)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    loader = ShardedDataLoader(ds, mesh, per_process_batch=2, num_workers=1)
    batch = next(iter(loader))
    assert batch["images"].shape == (2, 64, 64, 3)
    # batch axis sharded over the mesh 'data' axis
    assert len(batch["images"].sharding.device_set) == 2


# ---------------- streaming (reference test_data.py:499-577) ----------------


def test_synthetic_camera_stream():
    cfg = StreamConfig(stream_type=StreamType.SYNTHETIC, width=32, height=24,
                       target_fps=0, name="cam0")
    stream = RoboticCameraStream(cfg).start()
    frame = stream.read(timeout=2.0)
    stream.stop()
    assert frame is not None
    assert frame.image.shape[0] == 24
    assert stream.stats()["frames_captured"] >= 1
    assert not stream.is_running


def test_multi_camera_synchronized_read():
    cfgs = [
        StreamConfig(stream_type=StreamType.SYNTHETIC, width=16, height=16,
                     target_fps=0, name=f"cam{i}")
        for i in range(2)
    ]
    mgr = MultiCameraManager(cfgs, sync_window_s=5.0).start_all()
    frames = None
    for _ in range(5):
        frames = mgr.read_synchronized(timeout=2.0)
        if frames:
            break
    mgr.stop_all()
    assert frames is not None and set(frames) == {"cam0", "cam1"}


def test_coco_dataset_category_remap(tmp_path):
    """COCO ids are sparse; dataset must remap to contiguous [0, C)."""
    import cv2

    img = np.zeros((40, 40, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "a.jpg"), img)
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 40, "height": 40}],
        "annotations": [
            {"id": 1, "image_id": 1, "bbox": [5, 5, 10, 10], "category_id": 17,
             "iscrowd": 0},
        ],
        "categories": [{"id": 3, "name": "car"}, {"id": 17, "name": "cat"}],
    }
    ann = tmp_path / "instances.json"
    ann.write_text(json.dumps(coco))
    ds = COCODataset(root=str(tmp_path), annotation_file=str(ann), image_size=32,
                     max_boxes=4)
    s = ds[0]
    assert s["labels"][0] == 1  # 17 -> contiguous index 1
    assert ds.class_names == ["car", "cat"]


def test_shapes_benchmark_generator(tmp_path):
    """Shapes benchmark: COCO layout, tight boxes, determinism, 8 classes.

    Regression guard: this module was once lost to an unanchored ``data/``
    gitignore rule — keep it imported and exercised from the suite.
    """
    from hvs_tpu.data import (
        SHAPE_CLASSES,
        generate_shapes_dataset,
        generate_shapes_image,
    )

    assert len(SHAPE_CLASSES) == 8
    paths = generate_shapes_dataset(str(tmp_path), num_train=4, num_val=2,
                                    size=128, seed=7)
    for split, n in (("train", 4), ("val", 2)):
        ds = COCODataset(root=str(tmp_path / split),
                         annotation_file=paths[split],
                         image_size=128, max_boxes=8)
        assert len(ds) == n
        assert ds.class_names == list(SHAPE_CLASSES)
        s = ds[0]
        assert s["images"].shape == (128, 128, 3)
        nvalid = int(s["box_mask"].sum())
        assert nvalid >= 1
        b = s["boxes"][:nvalid]
        assert (b > 0).all() and (b <= 1).all()  # normalized cxcywh in frame

    # Per-image RNG streams: the same (seed, index) regenerates bit-exactly.
    r1 = np.random.default_rng(np.random.SeedSequence([7, 2]))
    r2 = np.random.default_rng(np.random.SeedSequence([7, 2]))
    i1, b1, l1 = generate_shapes_image(r1, size=96)
    i2, b2, l2 = generate_shapes_image(r2, size=96)
    assert (i1 == i2).all() and (b1 == b2).all() and (l1 == l2).all()

    # Boxes are tight: every annotation's bbox region must contain foreground
    # pixels that differ from the (clutter-free) background immediately
    # outside — checked structurally: area > 0 and inside the frame.
    ann = json.loads((tmp_path / "annotations" / "instances_train.json").read_text())
    assert len(ann["categories"]) == 8
    for a in ann["annotations"]:
        x, y, w, h = a["bbox"]
        assert w > 2 and h > 2
        assert 0 <= x and x + w <= 128 + 1e-3 and 0 <= y and y + h <= 128 + 1e-3


def test_shapes80_taxonomy_names():
    """80-class taxonomy (reference scale, src/data/dataset.py:428-450):
    80 unique names laid out as shape_id*10 + family_id*2 + fill_id."""
    from hvs_tpu.data import SHAPE_CLASSES, SHAPE80_CLASSES, class_names_for
    from hvs_tpu.data.shapes import COLOR_FAMILIES, FILL_PATTERNS

    assert len(SHAPE80_CLASSES) == 80
    assert len(set(SHAPE80_CLASSES)) == 80
    for cls_id, name in enumerate(SHAPE80_CLASSES):
        shape_id, family_id, fill_id = cls_id // 10, (cls_id % 10) // 2, cls_id % 2
        assert name == (f"{SHAPE_CLASSES[shape_id]}_"
                        f"{COLOR_FAMILIES[family_id][0]}_"
                        f"{FILL_PATTERNS[fill_id]}")
    assert class_names_for(8) == SHAPE_CLASSES
    assert class_names_for(80) == SHAPE80_CLASSES
    with pytest.raises(ValueError):
        class_names_for(13)


def test_shapes80_family_colors_stay_in_hue_band():
    """Color families are HUE BANDS: every sampled color's hue must fall
    inside its family's band (sat/value jitter must not leak across hue)."""
    import colorsys

    from hvs_tpu.data.shapes import COLOR_FAMILIES, _sample_family_color

    rng = np.random.default_rng(3)
    for family_id, (_, lo, hi) in enumerate(COLOR_FAMILIES):
        for _ in range(20):
            r, g, b = np.asarray(
                _sample_family_color(rng, family_id)) / 255.0
            hue = colorsys.rgb_to_hsv(r, g, b)[0] * 360.0
            # +-2 deg: float32 RGB round-trip shifts hue slightly at edges
            in_band = (lo - 2 <= hue <= hi + 2) or (lo - 2 <= hue + 360.0 <= hi + 2)
            assert in_band, (COLOR_FAMILIES[family_id][0], hue)


def test_shapes80_stripes_darken_but_preserve_hue():
    """Striped fill darkens alternating bands multiplicatively (x0.35), so
    hue — the color-family signal — is identical in both bands, and both
    bands are actually present (legible pattern)."""
    from hvs_tpu.data.shapes import _apply_stripes

    img = np.full((64, 64, 3), (200, 120, 40), np.uint8)
    stamp = np.zeros((64, 64), np.uint8)
    stamp[8:56, 8:56] = 1
    _apply_stripes(img, stamp, cx=32.0, cy=32.0, s=24.0, stripe_theta=0.3)
    inside = img[8:56, 8:56].reshape(-1, 3)
    dark = inside[:, 0] < 150
    frac = dark.mean()
    assert 0.2 < frac < 0.8, frac  # both bands visible
    assert (inside[~dark] == (200, 120, 40)).all()
    # multiplicative: per-channel ratio ~0.35 keeps the hue ordering
    np.testing.assert_allclose(
        inside[dark].mean(axis=0) / np.array([200, 120, 40]), 0.35, atol=0.02
    )


def test_shapes80_generate_image_valid_and_deterministic():
    from hvs_tpu.data.shapes import generate_image

    r1 = np.random.default_rng(np.random.SeedSequence([11, 4]))
    r2 = np.random.default_rng(np.random.SeedSequence([11, 4]))
    i1, b1, l1 = generate_image(r1, size=128, num_classes=80)
    i2, b2, l2 = generate_image(r2, size=128, num_classes=80)
    assert (i1 == i2).all() and (b1 == b2).all() and (l1 == l2).all()
    assert l1.dtype == np.int32 and (l1 >= 0).all() and (l1 < 80).all()
    for x, y, w, h in b1:
        assert w > 2 and h > 2
        assert 0 <= x and x + w <= 128 + 1e-3 and 0 <= y and y + h <= 128 + 1e-3
    with pytest.raises(ValueError):
        generate_image(np.random.default_rng(0), size=64, num_classes=12)


def test_shapes80_dataset_categories(tmp_path):
    """The COCO writer emits all 80 categories and the generator actually
    uses the width of the taxonomy (>8 distinct classes in a small sample)."""
    from hvs_tpu.data import generate_shapes_dataset

    paths = generate_shapes_dataset(str(tmp_path), num_train=6, num_val=2,
                                    size=128, seed=5, num_classes=80)
    ann = json.loads((tmp_path / "annotations" /
                      "instances_train.json").read_text())
    assert len(ann["categories"]) == 80
    assert len({c["name"] for c in ann["categories"]}) == 80
    used = {a["category_id"] for a in ann["annotations"]}
    assert len(used) > 8
    ds = COCODataset(root=str(tmp_path / "train"),
                     annotation_file=paths["train"],
                     image_size=128, max_boxes=8)
    assert len(ds.class_names) == 80


def test_loader_abandoned_iterator_exits_cleanly(synthetic_dataset_dir):
    """Breaking out of a loader loop must not abort the process at exit.

    Regression: daemon workers still inside cv2 native code during
    interpreter teardown raise the C++ 'terminate called without an active
    exception' abort (SIGABRT). The iterator's finally-block now cancels and
    joins its workers.
    """
    import subprocess
    import sys
    import textwrap

    root, ann = synthetic_dataset_dir
    code = textwrap.dedent(f"""
        from hvs_tpu.data import BaseVisionDataset, MHCDataLoader
        ds = BaseVisionDataset({str(str(root))!r}, {str(ann)!r},
                               image_size=64, max_boxes=8)
        loader = MHCDataLoader(ds, batch_size=2, num_workers=2, prefetch=4)
        batch = next(iter(loader))   # abandon the iterator mid-epoch
        print("got", batch["images"].shape)
    """)
    for _ in range(3):  # teardown race: give it several chances to fail
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=120,
        )
        assert proc.returncode == 0, proc.stderr[-800:]
        assert "got" in proc.stdout
