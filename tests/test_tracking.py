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


def test_fallback_frame_then_embeddings_frame():
    """Tracks created on an embedding-less frame must survive a later
    embedding frame (ADVICE r3 medium: KeyError on np.stack of missing
    self._embeddings entries) and keep their identity via IoU."""
    tr = AppearanceTracker(min_hits=1)
    box = np.array([10, 10, 40, 40], np.float32)
    t1 = tr.update(box[None], np.array([0.9]), np.array([0]), None)
    tid = t1[0].track_id
    # Next frame carries embeddings: must not crash, must IoU-match.
    t2 = tr.update((box + 1)[None], np.array([0.9]), np.array([0]),
                   _emb(5)[None])
    assert t2[0].track_id == tid
    # The placeholder got replaced by the real embedding.
    assert tr._embeddings[tid] is not None
    # And a further appearance-only rematch works off that embedding.
    far = np.array([200, 200, 230, 230], np.float32)
    tr.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0, int),
              np.zeros((0, 32), np.float32))
    t3 = tr.update(far[None], np.array([0.9]), np.array([0]), _emb(5)[None])
    assert t3[0].track_id == tid


def test_fallback_and_appearance_paths_share_one_id_counter():
    """Interleaved fallback/appearance frames must never mint duplicate
    track_ids (ADVICE r3 medium: two independent counters)."""
    tr = AppearanceTracker(min_hits=1)
    a = np.array([10, 10, 40, 40], np.float32)
    b = np.array([200, 200, 240, 240], np.float32)
    tr.update(a[None], np.array([0.9]), np.array([0]), None)  # fallback path
    tr.update(np.stack([a, b]), np.array([0.9, 0.9]), np.array([0, 0]),
              np.stack([_emb(1), _emb(2)]))  # appearance path creates b
    ids = [t.track_id for t in tr.tracks]
    assert len(ids) == len(set(ids)) == 2


def test_assign_greedy_matches_hungarian_on_simple_cost():
    from hvs_tpu.inference.postprocessing import _assign

    cost = np.array([[0.1, 0.9], [0.8, 0.2]])
    rows, cols = _assign(cost)
    assert dict(zip(rows.tolist(), cols.tolist())) == {0: 0, 1: 1}


def test_postprocessor_plumbs_embeddings_to_appearance_tracker():
    """tracking='appearance' through DetectionPostprocessor must reach the
    DeepSORT path, not silently degrade to IoU (ADVICE r3 low)."""
    from hvs_tpu.inference.postprocessing import DetectionPostprocessor

    pp = DetectionPostprocessor(tracking="appearance", score_threshold=0.1)
    pp.tracker.min_hits = 1
    boxes = np.array([[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.8, 0.8]], np.float32)
    scores = np.zeros((2, 80), np.float32)
    scores[0, 3] = 0.9
    scores[1, 3] = 0.8
    emb = np.stack([_emb(1), _emb(2)])
    r1 = pp.process({"boxes": boxes, "scores": scores}, embeddings=emb)
    assert len(r1["track_ids"]) == 2
    # Embeddings landed in the tracker (not the IoU fallback).
    assert all(e is not None for e in pp.tracker._embeddings.values())
    # Identity follows appearance across a position swap.
    swapped = boxes[::-1].copy()
    r2 = pp.process({"boxes": swapped, "scores": scores},
                    embeddings=emb[::-1].copy())
    assert set(r2["track_ids"]) == set(r1["track_ids"])


def test_stale_tracks_expire_and_embeddings_are_cleaned():
    tr = AppearanceTracker(min_hits=1, max_age=2)
    box = np.array([10, 10, 40, 40], np.float32)
    tr.update(box[None], np.array([0.9]), np.array([0]), _emb(1)[None])
    for _ in range(4):
        tr.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0, int),
                  np.zeros((0, 32), np.float32))
    assert not tr.tracks
    assert not tr._embeddings
