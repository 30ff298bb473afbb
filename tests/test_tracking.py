"""AppearanceTracker tests (DeepSORT-style: embeddings + Hungarian matching)."""

import numpy as np

from hvs_tpu.inference import AppearanceTracker


def _emb(seed, dim=32):
    v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def test_identity_maintained_by_appearance_despite_box_jump():
    """Two objects swap positions between frames; appearance keeps IDs."""
    tr = AppearanceTracker(min_hits=1)
    box_a = np.array([10, 10, 30, 30], np.float32)
    box_b = np.array([100, 100, 130, 130], np.float32)
    ea, eb = _emb(1), _emb(2)

    t1 = tr.update(np.stack([box_a, box_b]), np.array([0.9, 0.9]),
                   np.array([0, 0]), np.stack([ea, eb]))
    ids = {tuple(t.box.astype(int)): t.track_id for t in t1}
    id_a = ids[tuple(box_a.astype(int))]
    id_b = ids[tuple(box_b.astype(int))]

    # Frame 2: positions swapped, embeddings follow the objects.
    t2 = tr.update(np.stack([box_b, box_a]), np.array([0.9, 0.9]),
                   np.array([0, 0]), np.stack([ea, eb]))
    by_id = {t.track_id: t for t in t2}
    np.testing.assert_allclose(by_id[id_a].box, box_b)  # object A moved to b
    np.testing.assert_allclose(by_id[id_b].box, box_a)


def test_reappearance_after_occlusion_keeps_id():
    tr = AppearanceTracker(min_hits=1, max_age=5)
    e = _emb(7)
    box = np.array([50, 50, 80, 80], np.float32)
    t1 = tr.update(box[None], np.array([0.9]), np.array([2]), e[None])
    tid = t1[0].track_id
    # 3 empty frames (occluded).
    for _ in range(3):
        tr.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0, int),
                  np.zeros((0, 32), np.float32))
    # Reappears far away (IoU 0) with the same appearance.
    far = np.array([300, 300, 330, 330], np.float32)
    t2 = tr.update(far[None], np.array([0.8]), np.array([2]), e[None])
    assert t2[0].track_id == tid


def test_different_classes_never_match():
    tr = AppearanceTracker(min_hits=1)
    e = _emb(3)
    box = np.array([10, 10, 40, 40], np.float32)
    t1 = tr.update(box[None], np.array([0.9]), np.array([0]), e[None])
    t2 = tr.update(box[None], np.array([0.9]), np.array([1]), e[None])
    assert t2[-1].track_id != t1[0].track_id  # same box+emb, new class -> new id


def test_distinct_appearance_blocks_wrong_match():
    """Same position, totally different appearance AND low IoU elsewhere:
    gate admits the IoU match (position), since either signal can rescue."""
    tr = AppearanceTracker(min_hits=1)
    box = np.array([10, 10, 40, 40], np.float32)
    t1 = tr.update(box[None], np.array([0.9]), np.array([0]), _emb(1)[None])
    t2 = tr.update(box[None], np.array([0.9]), np.array([0]), _emb(99)[None])
    # High IoU keeps the identity despite the appearance change (occlusion
    # handover is the job of the cosine gate only when IoU is absent).
    assert t2[0].track_id == t1[0].track_id


def test_iou_fallback_without_embeddings():
    tr = AppearanceTracker(min_hits=1)
    box = np.array([10, 10, 40, 40], np.float32)
    t1 = tr.update(box[None], np.array([0.9]), np.array([0]), None)
    t2 = tr.update((box + 2)[None], np.array([0.9]), np.array([0]), None)
    assert t1 and t2 and t2[0].track_id == t1[0].track_id


def test_stale_tracks_expire_and_embeddings_are_cleaned():
    tr = AppearanceTracker(min_hits=1, max_age=2)
    box = np.array([10, 10, 40, 40], np.float32)
    tr.update(box[None], np.array([0.9]), np.array([0]), _emb(1)[None])
    for _ in range(4):
        tr.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0, int),
                  np.zeros((0, 32), np.float32))
    assert not tr.tracks
    assert not tr._embeddings
