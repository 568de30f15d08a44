"""Target assignment tests against a direct numpy re-implementation of the
reference semantics (target_ops.py:139-277)."""
import numpy as np
import jax.numpy as jnp

from sassd_tpu.core import boxes as B
from sassd_tpu.core import targets as T


def numpy_reference_assign(anchors, anchors_mask, gt, gt_classes, sim,
                           matched, unmatched):
    """Literal numpy transcription of create_target_torch semantics."""
    A = anchors.shape[0]
    labels = np.full(A, -1, np.int64)
    targets = np.zeros((A, 7), np.float32)
    inside = np.where(anchors_mask)[0] if anchors_mask is not None else np.arange(A)
    sub = anchors[inside]
    n = len(inside)
    lab = np.full(n, -1, np.int64)
    if len(gt) > 0 and n > 0:
        ov = sim(sub, gt)
        a2g_arg = ov.argmax(1)
        a2g_max = ov[np.arange(n), a2g_arg]
        g2a_max = ov.max(0)
        g2a_max[g2a_max == 0] = -1
        forced = np.nonzero(ov == g2a_max[None, :])[0]
        lab[forced] = gt_classes[a2g_arg[forced]]
        pos = a2g_max >= matched
        lab[pos] = gt_classes[a2g_arg[pos]]
        fg = np.where(lab > 0)[0]
        bg = a2g_max < unmatched
        lab[bg] = 0
        lab[forced] = gt_classes[a2g_arg[forced]]
        tg = np.zeros((n, 7), np.float32)
        enc = np.asarray(B.second_box_encode(
            jnp.asarray(gt[a2g_arg[fg]]), jnp.asarray(sub[fg])))
        tg[fg] = enc
    else:
        lab[:] = 0
        tg = np.zeros((n, 7), np.float32)
    labels[inside] = lab
    targets[inside] = tg
    return labels, targets


def np_nearest_sim(a, g):
    return np.asarray(B.nearest_iou_similarity(jnp.asarray(a), jnp.asarray(g)))


def make_case(seed, n_anchor=200, n_gt=7, with_mask=True):
    rng = np.random.default_rng(seed)
    anchors = np.zeros((n_anchor, 7), np.float32)
    anchors[:, :2] = rng.uniform(-20, 20, (n_anchor, 2))
    anchors[:, 2] = -1.78
    anchors[:, 3:6] = [1.6, 3.9, 1.56]
    anchors[:, 6] = rng.choice([0.0, np.pi / 2], n_anchor)
    gt = np.zeros((n_gt, 7), np.float32)
    gt[:, :2] = rng.uniform(-20, 20, (n_gt, 2))
    gt[:, 2] = rng.uniform(-2, -1, n_gt)
    gt[:, 3:6] = rng.uniform(1.2, 4.5, (n_gt, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
    mask = rng.uniform(size=n_anchor) > 0.3 if with_mask else None
    return anchors, gt, mask


def check_case(seed, n_gt_valid, g_pad=12, with_mask=True):
    anchors, gt, mask = make_case(seed, n_gt=n_gt_valid, with_mask=with_mask)
    gt_classes = np.ones(n_gt_valid, np.int64)

    ref_labels, ref_targets = numpy_reference_assign(
        anchors, mask, gt, gt_classes, np_nearest_sim, 0.6, 0.45)

    # padded-GT fixed-shape version
    gt_pad = np.zeros((g_pad, 7), np.float32)
    gt_pad[:n_gt_valid] = gt
    valid = np.arange(g_pad) < n_gt_valid
    out = T.create_targets(
        jnp.asarray(anchors), jnp.asarray(gt_pad), jnp.asarray(valid),
        T.nearest_iou_similarity, 0.6, 0.45,
        anchors_mask=None if mask is None else jnp.asarray(mask))

    np.testing.assert_array_equal(np.asarray(out.labels), ref_labels)
    np.testing.assert_allclose(np.asarray(out.bbox_targets), ref_targets,
                               atol=1e-5)


def test_assignment_matches_reference():
    for seed in range(5):
        check_case(seed, n_gt_valid=7)


def test_assignment_no_mask():
    check_case(10, n_gt_valid=5, with_mask=False)


def test_assignment_zero_gts():
    check_case(11, n_gt_valid=0)


def test_force_match_low_iou():
    """A GT whose best anchor IoU is below matched_threshold must still get a
    positive via force-matching (the core SSD recall guarantee)."""
    anchors = np.zeros((4, 7), np.float32)
    anchors[:, :2] = [[0, 0], [5, 5], [50, 50], [80, 80]]
    anchors[:, 3:6] = [1.6, 3.9, 1.56]
    gt = np.zeros((1, 7), np.float32)
    gt[0] = [1.5, 1.5, 0, 1.6, 3.9, 1.56, 0.0]  # weak overlap with anchor 0
    out = T.create_targets(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray([True]),
        T.nearest_iou_similarity, 0.6, 0.45)
    labels = np.asarray(out.labels)
    assert labels[0] == 1            # force-matched despite IoU < 0.6
    assert np.all(labels[1:] == 0)


def test_multiclass_labels():
    anchors, gt, _ = make_case(12, n_gt=6, with_mask=False)
    gt_classes = np.array([1, 2, 3, 1, 2, 3], np.int64)
    gt[:, :2] = anchors[:6, :2]  # ensure strong overlaps
    gt[:, 3:6] = [1.6, 3.9, 1.56]
    gt[:, 6] = anchors[:6, 6]
    out = T.create_targets(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.ones(6, bool),
        T.nearest_iou_similarity, 0.6, 0.45,
        gt_classes=jnp.asarray(gt_classes, dtype=jnp.int32))
    labels = np.asarray(out.labels)
    for i in range(6):
        assert labels[i] == gt_classes[i]
