"""get_guided_anchors parity vs a numpy transcription of the reference
(ssd_rotate_head.py:307-372): decode, sigmoid-threshold under anchors_mask,
direction flip by pi, GT prepending at train."""
import numpy as np
import jax.numpy as jnp

from sassd_tpu.core import boxes as B
from sassd_tpu.models import ssd_head


def reference_guided(box_preds, cls_preds, dir_preds, anchors, mask, thr,
                     gt_boxes=None):
    decoded = np.asarray(B.second_box_decode(jnp.asarray(box_preds),
                                             jnp.asarray(anchors)))
    out = []
    for i in range(box_preds.shape[0]):
        bp = decoded[i][mask[i]]
        cp = cls_preds[i][mask[i]]
        dp = dir_preds[i][mask[i]]
        scores = 1 / (1 + np.exp(-cp[:, 0]))
        dir_labels = dp.argmax(-1)
        sel = scores > thr
        bp, dl = bp[sel], dir_labels[sel]
        opp = (bp[:, -1] > 0) != (dl > 0)
        bp[opp, -1] += np.pi
        if gt_boxes is not None:
            bp = np.concatenate([gt_boxes[i], bp], 0)
        out.append(bp)
    return out


def test_guided_anchors_match_reference():
    rng = np.random.default_rng(0)
    b, a = 2, 200
    anchors = np.zeros((a, 7), np.float32)
    anchors[:, :2] = rng.uniform(-20, 20, (a, 2))
    anchors[:, 2] = -1.78
    anchors[:, 3:6] = [1.6, 3.9, 1.56]
    anchors[:, 6] = rng.choice([0.0, 1.57], a)
    box_preds = rng.normal(0, 0.3, (b, a, 7)).astype(np.float32)
    cls_preds = rng.normal(-2.0, 1.5, (b, a, 1)).astype(np.float32)
    dir_preds = rng.normal(0, 1, (b, a, 2)).astype(np.float32)
    mask = rng.uniform(size=(b, a)) > 0.3

    outs = ssd_head.HeadOutputs(jnp.asarray(box_preds), jnp.asarray(cls_preds),
                                jnp.asarray(dir_preds))
    cap = 200  # >= number passing -> selection == reference set
    ga = ssd_head.get_guided_anchors(outs, jnp.asarray(anchors),
                                     jnp.asarray(mask), num_class=1,
                                     thr=0.1, cap=cap)
    ref = reference_guided(box_preds, cls_preds, dir_preds, anchors, mask, 0.1)
    got_boxes = np.asarray(ga.boxes)
    got_valid = np.asarray(ga.valid)
    for i in range(b):
        gb = got_boxes[i][got_valid[i]]
        assert len(gb) == len(ref[i])
        # same box SET (top-k reorders by score)
        gb_sorted = gb[np.lexsort(gb.T)]
        rf_sorted = ref[i][np.lexsort(ref[i].T)]
        np.testing.assert_allclose(gb_sorted, rf_sorted, atol=1e-4)


def test_guided_anchors_train_appends_gt():
    rng = np.random.default_rng(1)
    b, a, g = 2, 100, 4
    anchors = np.zeros((a, 7), np.float32)
    anchors[:, :2] = rng.uniform(-10, 10, (a, 2))
    anchors[:, 3:6] = [1.6, 3.9, 1.56]
    outs = ssd_head.HeadOutputs(
        jnp.asarray(rng.normal(0, 0.2, (b, a, 7)).astype(np.float32)),
        jnp.asarray(np.full((b, a, 1), -10.0, np.float32)),   # nothing passes
        jnp.asarray(rng.normal(0, 1, (b, a, 2)).astype(np.float32)))
    gt = rng.normal(0, 5, (b, g, 7)).astype(np.float32)
    gt_labels = np.ones((b, g), np.int32)
    gt_valid = np.tile(np.array([True, True, False, False]), (b, 1))
    ga = ssd_head.get_guided_anchors(
        outs, jnp.asarray(anchors), jnp.ones((b, a), bool), num_class=1,
        thr=0.1, cap=64, gt_boxes=jnp.asarray(gt),
        gt_labels=jnp.asarray(gt_labels), gt_valid=jnp.asarray(gt_valid))
    valid = np.asarray(ga.valid)
    boxes = np.asarray(ga.boxes)
    # only the valid GTs survive, in the leading slots
    np.testing.assert_array_equal(valid[:, :g], gt_valid)
    assert not valid[:, g:].any()
    np.testing.assert_allclose(boxes[:, :g], gt, atol=1e-6)

def test_truncation_counter_dense_scene():
    """VERDICT r3 item 8: when more anchors pass the score threshold than the
    static cap keeps, GuidedAnchors.truncated reports exactly how many were
    dropped (the reference keeps ALL passing anchors); zero when under cap."""
    rng = np.random.default_rng(2)
    b, a = 2, 300
    anchors = np.zeros((a, 7), np.float32)
    anchors[:, :2] = rng.uniform(-20, 20, (a, 2))
    anchors[:, 3:6] = [1.6, 3.9, 1.56]
    outs = ssd_head.HeadOutputs(
        jnp.asarray(rng.normal(0, 0.2, (b, a, 7)).astype(np.float32)),
        jnp.asarray(np.full((b, a, 1), 3.0, np.float32)),   # ALL pass
        jnp.asarray(rng.normal(0, 1, (b, a, 2)).astype(np.float32)))
    mask = np.ones((b, a), bool)
    mask[1, :100] = False                                   # sample 1: 200 pass

    cap = 64
    ga = ssd_head.get_guided_anchors(outs, jnp.asarray(anchors),
                                     jnp.asarray(mask), num_class=1,
                                     thr=0.1, cap=cap)
    np.testing.assert_array_equal(np.asarray(ga.truncated),
                                  [a - cap, 200 - cap])

    # train mode: GT slots shrink the candidate budget (k = cap - n_gt)
    g = 4
    gt = rng.normal(0, 5, (b, g, 7)).astype(np.float32)
    ga_tr = ssd_head.get_guided_anchors(
        outs, jnp.asarray(anchors), jnp.asarray(mask), num_class=1,
        thr=0.1, cap=cap, gt_boxes=jnp.asarray(gt),
        gt_labels=jnp.ones((b, g), jnp.int32),
        gt_valid=jnp.ones((b, g), bool))
    np.testing.assert_array_equal(np.asarray(ga_tr.truncated),
                                  [a - (cap - g), 200 - (cap - g)])

    # under-cap scene: counter is zero
    ga0 = ssd_head.get_guided_anchors(
        outs, jnp.asarray(anchors),
        jnp.asarray(np.arange(a)[None, :] < np.array([[10], [20]])),
        num_class=1, thr=0.1, cap=cap)
    np.testing.assert_array_equal(np.asarray(ga0.truncated), [0, 0])
