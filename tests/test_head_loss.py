"""SSD head loss parity vs a torch transcription of the reference math
(ssd_rotate_head.py:127-305: sin-difference, focal/smooth-L1/dir-CE with
NormByNumPositives weighting and the x2.0/x1.0/x0.2 loss scales)."""
import numpy as np
import torch
import jax.numpy as jnp

from sassd_tpu.core import targets as T
from sassd_tpu.models import ssd_head


def torch_reference_loss(box_preds, cls_preds, dir_preds, labels, targets,
                         anchors, num_class=1):
    """Literal transcription of SSDRotateHead.loss given assigned targets."""
    box_preds = torch.tensor(box_preds)
    cls_preds = torch.tensor(cls_preds)
    dir_preds = torch.tensor(dir_preds)
    labels = torch.tensor(labels)
    targets = torch.tensor(targets)
    anchors = torch.tensor(anchors)
    batch = box_preds.shape[0]

    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (negatives | positives).float()
    reg_weights = positives.float()
    pos_norm = positives.float().sum(1, keepdim=True).clamp(min=1.0)
    cls_weights = cls_weights / pos_norm
    reg_weights = reg_weights / pos_norm

    cls_targets = labels * cared.long()
    one_hot = torch.nn.functional.one_hot(
        cls_targets, num_class + 1).float()[..., 1:]

    # sin difference on the angle channel
    rad_p = torch.sin(box_preds[..., -1:]) * torch.cos(targets[..., -1:])
    rad_t = torch.cos(box_preds[..., -1:]) * torch.sin(targets[..., -1:])
    bp = torch.cat([box_preds[..., :-1], rad_p], -1)
    tg = torch.cat([targets[..., :-1], rad_t], -1)

    beta = 1 / 9.0
    diff = torch.abs(bp - tg)
    sml1 = torch.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
    loc = (sml1 * reg_weights[..., None]).sum()

    p = cls_preds.sigmoid()
    pt = (1 - p) * one_hot + p * (1 - one_hot)
    w = (0.25 * one_hot + 0.75 * (1 - one_hot)) * pt.pow(2.0)
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        cls_preds, one_hot, reduction="none")
    cls = (bce * w * cls_weights[..., None]).sum()

    rot_gt = targets[..., -1] + anchors[None, :, -1]
    dir_t = (rot_gt > 0).long()
    dw = positives.float()
    dw = dw / dw.sum(-1, keepdim=True).clamp(min=1.0)
    ce = torch.nn.functional.cross_entropy(
        dir_preds.reshape(-1, 2), dir_t.reshape(-1), reduction="none")
    dirl = (ce * dw.reshape(-1)).sum()

    return (float(loc / batch * 2.0), float(cls / batch * 1.0),
            float(dirl / batch * 0.2))


def test_head_loss_matches_reference_math():
    rng = np.random.default_rng(0)
    b, a = 2, 300
    anchors = np.zeros((a, 7), np.float32)
    anchors[:, :2] = rng.uniform(-20, 20, (a, 2))
    anchors[:, 2] = -1.78
    anchors[:, 3:6] = [1.6, 3.9, 1.56]
    anchors[:, 6] = rng.choice([0.0, 1.57], a)
    g = 8
    gt = np.zeros((b, g, 7), np.float32)
    gt[..., :2] = anchors[rng.integers(0, a, (b, g)), :2] + rng.normal(0, 0.3, (b, g, 2))
    gt[..., 2] = -1.7
    gt[..., 3:6] = [1.55, 3.8, 1.5]
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (b, g))
    gt_valid = np.ones((b, g), bool)
    gt_classes = np.ones((b, g), np.int32)

    box_preds = rng.normal(0, 0.5, (b, a, 7)).astype(np.float32)
    cls_preds = rng.normal(0, 2.0, (b, a, 1)).astype(np.float32)
    dir_preds = rng.normal(0, 1.0, (b, a, 2)).astype(np.float32)
    mask = np.ones((b, a), bool)

    outs = ssd_head.HeadOutputs(jnp.asarray(box_preds), jnp.asarray(cls_preds),
                                jnp.asarray(dir_preds))
    losses = ssd_head.head_loss(
        outs, jnp.asarray(anchors), jnp.asarray(mask), jnp.asarray(gt),
        jnp.asarray(gt_classes), jnp.asarray(gt_valid), num_class=1,
        matched_thresholds=(0.6,), unmatched_thresholds=(0.45,))

    # assigned labels/targets from the (already reference-validated) assigner
    import jax
    assigns = [T.create_targets(jnp.asarray(anchors), jnp.asarray(gt[i]),
                                jnp.asarray(gt_valid[i]),
                                T.nearest_iou_similarity, 0.6, 0.45,
                                anchors_mask=jnp.asarray(mask[i]),
                                gt_classes=jnp.asarray(gt_classes[i]))
               for i in range(b)]
    labels = np.stack([np.asarray(x.labels) for x in assigns])
    targets = np.stack([np.asarray(x.bbox_targets) for x in assigns])
    assert (labels > 0).sum() > 0, "test needs positives"

    loc_t, cls_t, dir_t = torch_reference_loss(
        box_preds, cls_preds, dir_preds, labels, targets, anchors)
    np.testing.assert_allclose(float(losses["rpn_loc_loss"]), loc_t, rtol=2e-4)
    np.testing.assert_allclose(float(losses["rpn_cls_loss"]), cls_t, rtol=2e-4)
    np.testing.assert_allclose(float(losses["rpn_dir_loss"]), dir_t, rtol=2e-4)


def test_fold_head_parity():
    """The fused single-conv head (model.fold_head) is numerically identical
    to the three separate 1x1 convs — conv is linear per output channel, so
    concat-weights-then-slice computes the same dot products."""
    import jax
    for num_class, apl in ((1, 2), (3, 2)):
        key = jax.random.PRNGKey(num_class)
        params = ssd_head.head_init(key, 16, num_class, apl)
        x = jax.random.normal(jax.random.PRNGKey(99), (2, 5, 6, 16))
        a = ssd_head.head_apply(params, x, num_class, 7, apl, fold=True)
        b = ssd_head.head_apply(params, x, num_class, 7, apl, fold=False)
        for name in ("box_preds", "cls_preds", "dir_preds"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
                atol=1e-6, err_msg=name)
