"""Parity vs the reference's OWN executed code (not transcriptions).

Every other parity test in this suite compares sassd_tpu against a hand
transcription of the reference math, which would hide a shared misreading.
Here the oracles are the reference's actual source, imported from
/root/reference via tests/ref_oracle.py (numba identity-stubbed — all the
decorated code is plain Python underneath):

  * box coders        mmdet/core/bbox3d/box_coders.py
  * similarity fns    mmdet/core/bbox3d/{geometry,region_similarity}.py
  * rotated IoU       mmdet/core/post_processing/rotate_nms_gpu.py:537-549
                      (the CUDA *device* functions, looped on host)
  * target assign     mmdet/core/bbox3d/target_ops.py:139-277
  * losses            mmdet/core/loss/losses.py + SSDRotateHead.create_loss
  * KITTI AP protocol mmdet/core/evaluation/kitti_eval.py (eval_class_v3)

plus a torch-dense oracle for the sparse conv engine (forward AND gradients
vs torch.nn.functional.conv3d autograd — an oracle with no XLA in common
with the implementation under test).

Bugs found by these tests when first written (and fixed):
  * corner coder used a different corner ordering than the reference's
    center_to_corner_box3d (max elementwise delta 10.0)
  * ops.sparse.stride_conv used the symmetric-plan VJP, which is invalid
    for stride plans (d_feats max delta 20.2 vs torch autograd)
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import ref_oracle as R
from sassd_tpu.core import boxes as B
from sassd_tpu.core import losses as L
from sassd_tpu.core import riou as RI
from sassd_tpu.core import targets as T
from sassd_tpu.eval import kitti_eval as KE
from sassd_tpu.models import ssd_head
from sassd_tpu.ops import sparse as S

from test_eval import messy_anno_pair
from test_sparse import random_level


def rand_boxes7(rng, n, car_like=False, yaw_grid=False):
    b = np.zeros((n, 7), np.float64)
    b[:, 0] = rng.uniform(0, 69, n)
    b[:, 1] = rng.uniform(-40, 40, n)
    b[:, 2] = rng.uniform(-3, 1, n)
    if car_like:
        b[:, 3:6] = [1.6, 3.9, 1.56]
        b[:, 3:6] += rng.uniform(-0.2, 0.2, (n, 3))
    else:
        b[:, 3] = rng.uniform(0.4, 2.5, n)
        b[:, 4] = rng.uniform(0.4, 5.0, n)
        b[:, 5] = rng.uniform(0.5, 2.2, n)
    b[:, 6] = (rng.choice([0.0, np.pi / 2], n) if yaw_grid
               else rng.uniform(-np.pi, np.pi, n))
    return b


# ---------------------------------------------------------------------------
# box coders
# ---------------------------------------------------------------------------

def test_ground_box3d_coder_oracle():
    bc = R.load_box_coders()
    rng = np.random.default_rng(0)
    boxes, anchors = rand_boxes7(rng, 128), rand_boxes7(rng, 128)
    coder = bc.GroundBox3dCoder()
    enc_ref = coder.encode(boxes, anchors)                      # np path
    enc_me = np.asarray(B.second_box_encode(jnp.asarray(boxes),
                                            jnp.asarray(anchors)))
    np.testing.assert_allclose(enc_me, enc_ref, atol=1e-5)
    dec_ref = np.asarray(coder.decode(torch.from_numpy(enc_ref),
                                      torch.from_numpy(anchors)))
    dec_me = np.asarray(B.second_box_decode(jnp.asarray(enc_ref),
                                            jnp.asarray(anchors)))
    np.testing.assert_allclose(dec_me, dec_ref, atol=1e-4)


def test_bev_box_coder_oracle():
    bc = R.load_box_coders()
    rng = np.random.default_rng(1)
    boxes, anchors = rand_boxes7(rng, 128), rand_boxes7(rng, 128)
    enc_ref = bc.bev_box_encode(boxes[:, [0, 1, 3, 4, 6]],
                                anchors[:, [0, 1, 3, 4, 6]])
    enc_me = np.asarray(B.bev_box_encode(jnp.asarray(boxes),
                                         jnp.asarray(anchors)))
    np.testing.assert_allclose(enc_me, enc_ref, atol=1e-5)
    dec_ref = bc.bev_box_decode(enc_ref, anchors[:, [0, 1, 3, 4, 6]])
    dec_me = np.asarray(B.bev_box_decode(jnp.asarray(enc_ref),
                                         jnp.asarray(anchors)))
    np.testing.assert_allclose(dec_me, dec_ref, atol=1e-4)


def test_corner_coder_oracle():
    """BoxCornerCoder: 24-dim corner offsets with the reference's exact
    corner enumeration (geometry.py corners_nd [0,1,3,2,4,5,7,6] order)."""
    bc = R.load_box_coders()
    rng = np.random.default_rng(2)
    boxes, anchors = rand_boxes7(rng, 96), rand_boxes7(rng, 96)
    enc_ref = bc.BoxCornerCoder().encode(boxes, anchors)
    enc_me = np.asarray(B.corner_box_encode(jnp.asarray(boxes),
                                            jnp.asarray(anchors)))
    np.testing.assert_allclose(enc_me, enc_ref, atol=1e-4)
    # reference leaves _decode unimplemented; ours must invert its encode
    dec = np.asarray(B.corner_box_decode(jnp.asarray(enc_ref),
                                         jnp.asarray(anchors)))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-4)
    dyaw = np.asarray(B.limit_period(dec[:, 6] - boxes[:, 6], 0.5,
                                     2 * np.pi))
    np.testing.assert_allclose(dyaw, 0, atol=1e-4)


# ---------------------------------------------------------------------------
# similarity / rotated IoU
# ---------------------------------------------------------------------------

def test_nearest_iou_similarity_oracle():
    rs = R.load_region_similarity()
    rng = np.random.default_rng(3)
    boxes, anchors = rand_boxes7(rng, 80), rand_boxes7(rng, 60)
    ref = rs.NearestIouSimilarity()(boxes, anchors)
    me = np.asarray(B.nearest_iou_similarity(jnp.asarray(boxes),
                                             jnp.asarray(anchors)))
    np.testing.assert_allclose(me, ref, atol=1e-5)


def test_distance_similarity_oracle():
    """vs the reference's DistanceSimilarity (region_similarity.py:98-128,
    geometry.py:460-483 distance_similarity), both flavors."""
    rs = R.load_region_similarity()
    rng = np.random.default_rng(13)
    boxes, anchors = rand_boxes7(rng, 60), rand_boxes7(rng, 50)
    anchors[:30, :2] = boxes[:30, :2] + rng.normal(0, 0.5, (30, 2))
    for with_rot in (False, True):
        ref = rs.DistanceSimilarity(distance_norm=1.0,
                                    with_rotation=with_rot,
                                    rotation_alpha=0.5)(boxes, anchors)
        sim = T.make_distance_similarity(1.0, with_rotation=with_rot,
                                         rot_alpha=0.5)
        me = np.asarray(sim(jnp.asarray(boxes), jnp.asarray(anchors)))
        np.testing.assert_allclose(me, ref, atol=1e-5)


def test_rotate_iou2d_similarity_oracle():
    """vs the BEV IoU RotateIou2dSimilarity computes
    (region_similarity.py:51-58 — rotate_iou_gpu is a kernel launcher, so
    the oracle is the same devRotateIoUEval device math at criterion=-1)."""
    rng = np.random.default_rng(14)
    boxes, gts = rand_boxes7(rng, 24), rand_boxes7(rng, 18)
    gts[:10, :2] = boxes[:10, :2] + rng.normal(0, 1.0, (10, 2))
    ref = R.ref_rotate_iou_eval(boxes[:, [0, 1, 3, 4, 6]],
                                gts[:, [0, 1, 3, 4, 6]], -1)
    me = np.asarray(T.rotate_iou2d_similarity(jnp.asarray(boxes),
                                              jnp.asarray(gts)))
    np.testing.assert_allclose(me, ref, atol=2e-4)


@pytest.mark.parametrize("criterion", [-1, 0, 1, 2])
def test_rotated_iou_eval_oracle(criterion):
    """vs the reference's devRotateIoUEval CUDA device function (scalar
    Sutherland-Hodgman math, rotate_nms_gpu.py:537-549) run as python."""
    rng = np.random.default_rng(4)
    b5 = rand_boxes7(rng, 24)[:, [0, 1, 3, 4, 6]]
    q5 = rand_boxes7(rng, 20)[:, [0, 1, 3, 4, 6]]
    # overlapping pairs too, not just far-apart ones
    q5[:12, :2] = b5[:12, :2] + rng.normal(0, 1.0, (12, 2))
    ref = R.ref_rotate_iou_eval(b5, q5, criterion)
    me = RI.rotate_iou_eval_np(b5, q5, criterion)
    np.testing.assert_allclose(me, ref, atol=2e-4)


def test_rotate_iou_3d_similarity_oracle():
    """vs the reference's ACTIVE 3D-IoU: iou3d_utils.boxes_iou3d_gpu
    (iou3d_utils.py:79-111, the similarity the PSWarp 'extra' assigner
    config selects) = rotated BEV overlap x z-extent [z, z+h] over the
    union volume. The BEV overlap term is the reference's own
    devRotateIoUEval(criterion=2) device function; the height/volume
    combination follows :93-109 verbatim.

    NOTE the reference ALSO ships region_similarity.RotateIou3dSimilarity
    (region_similarity.py:63-74) whose d3_box_overlap_kernel computes the
    z-extent as [z-h, z] (z treated as TOP) — inconsistent with the
    reference's own box coder (second_box_encode: z is bottom) and with the
    iou3d_utils version its configs actually use. sassd_tpu matches the
    active path; this divergence was found by running both as oracles."""
    rng = np.random.default_rng(5)
    boxes = rand_boxes7(rng, 24, car_like=True)
    gts = rand_boxes7(rng, 16, car_like=True)
    gts[:10, :3] = boxes[:10, :3] + rng.normal(0, 0.4, (10, 3))
    inter_bev = R.ref_rotate_iou_eval(boxes[:, [0, 1, 3, 4, 6]],
                                      gts[:, [0, 1, 3, 4, 6]], 2
                                      ).astype(np.float64)
    zmin = np.maximum(boxes[:, None, 2], gts[None, :, 2])
    zmax = np.minimum(boxes[:, None, 2] + boxes[:, None, 5],
                      gts[None, :, 2] + gts[None, :, 5])
    inter3d = inter_bev * np.clip(zmax - zmin, 0, None)
    vol_a = np.prod(boxes[:, 3:6], axis=1)[:, None]
    vol_b = np.prod(gts[:, 3:6], axis=1)[None, :]
    ref = inter3d / np.clip(vol_a + vol_b - inter3d, 1e-7, None)
    me = np.asarray(RI.rotate_iou_3d(jnp.asarray(boxes), jnp.asarray(gts)))
    np.testing.assert_allclose(me, ref, atol=2e-3)


# ---------------------------------------------------------------------------
# target assignment
# ---------------------------------------------------------------------------

def _oracle_similarity_and_encode():
    rs = R.load_region_similarity()
    bc = R.load_box_coders()
    nsim = rs.NearestIouSimilarity()

    def sim_torch(a, g):
        return torch.from_numpy(np.asarray(
            nsim(a.numpy().astype(np.float64), g.numpy().astype(np.float64)),
            dtype=np.float32))

    def enc_torch(b, a):
        return torch.from_numpy(np.asarray(
            bc.second_box_encode(b.numpy().astype(np.float64),
                                 a.numpy().astype(np.float64)),
            dtype=np.float32))

    return sim_torch, enc_torch


def test_create_target_torch_oracle():
    """create_targets vs the reference's create_target_torch executed on
    randomized anchors/GTs/masks — labels bit-equal, targets/overlaps to
    float32 tolerance. Covers 0-GT scenes, partial masks, multi-class ids,
    and force-match ties (duplicate anchors)."""
    to = R.load_target_ops()
    sim_torch, enc_torch = _oracle_similarity_and_encode()
    rng = np.random.default_rng(6)
    for trial in range(8):
        a = 300
        anchors = rand_boxes7(rng, a, car_like=True, yaw_grid=True)
        anchors[1] = anchors[0]        # exact duplicate: force-match tie
        ng = int(rng.integers(0, 10))
        gts = rand_boxes7(rng, max(ng, 1), car_like=True)[:ng]
        if ng:
            pick = rng.choice(a, ng, replace=False)
            gts[:, :3] = anchors[pick, :3] + rng.normal(0, 0.3, (ng, 3))
        mask = rng.random(a) < 0.8
        classes = rng.integers(1, 4, max(ng, 1))[:ng]

        labels_r, targets_r, max_r = to.create_target_torch(
            torch.from_numpy(anchors.astype(np.float32)),
            torch.from_numpy(mask),
            torch.from_numpy(gts.astype(np.float32)),
            torch.from_numpy(classes.astype(np.int64)), None,
            similarity_fn=sim_torch, box_encoding_fn=enc_torch,
            matched_threshold=0.6, unmatched_threshold=0.45)

        g = 12                          # padded-GT layout on our side
        gtp = np.zeros((g, 7), np.float32)
        gtp[:ng] = gts
        gvalid = np.zeros(g, bool)
        gvalid[:ng] = True
        gcls = np.ones(g, np.int32)
        gcls[:ng] = classes
        out = T.create_targets(
            jnp.asarray(anchors, dtype=jnp.float32), jnp.asarray(gtp),
            jnp.asarray(gvalid), T.nearest_iou_similarity, 0.6, 0.45,
            anchors_mask=jnp.asarray(mask), gt_classes=jnp.asarray(gcls))

        np.testing.assert_array_equal(np.asarray(out.labels),
                                      labels_r.numpy(), err_msg=f"t{trial}")
        np.testing.assert_allclose(np.asarray(out.bbox_targets),
                                   targets_r.numpy(), atol=1e-5)
        if ng:
            # reference returns max overlap for inside anchors only, and
            # never clamps (ours clamps at 0 — identical for IoU >= 0)
            np.testing.assert_allclose(
                np.asarray(out.max_overlap)[mask],
                np.maximum(max_r.numpy(), 0.0), atol=1e-5)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def test_weighted_losses_oracle():
    ls = R.load_losses()
    rng = np.random.default_rng(7)
    pred = rng.normal(0, 1, (2, 64, 7)).astype(np.float32)
    tgt = rng.normal(0, 1, (2, 64, 7)).astype(np.float32)
    w = (rng.random((2, 64, 1)) < 0.3).astype(np.float32)
    ref = float(ls.weighted_smoothl1(torch.tensor(pred), torch.tensor(tgt),
                                     torch.tensor(w), beta=1 / 9.,
                                     avg_factor=1.))
    me = float(L.smooth_l1_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                jnp.asarray(w), beta=1 / 9.))
    np.testing.assert_allclose(me, ref, rtol=1e-5)

    cp = rng.normal(0, 2, (2, 64, 1)).astype(np.float32)
    oh = (rng.random((2, 64, 1)) < 0.2).astype(np.float32)
    cw = rng.random((2, 64, 1)).astype(np.float32)
    ref = float(ls.weighted_sigmoid_focal_loss(
        torch.tensor(cp), torch.tensor(oh), torch.tensor(cw), avg_factor=1.))
    me = float(L.sigmoid_focal_loss(jnp.asarray(cp), jnp.asarray(oh),
                                    jnp.asarray(cw)))
    np.testing.assert_allclose(me, ref, rtol=1e-5)

    logits = rng.normal(0, 1, (128, 2)).astype(np.float32)
    lab = rng.integers(0, 2, 128)
    wc = rng.random(128).astype(np.float32)
    ref = float(ls.weighted_cross_entropy(torch.tensor(logits),
                                          torch.tensor(lab),
                                          torch.tensor(wc), avg_factor=1.))
    me = float(L.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(lab),
                                       jnp.asarray(wc)))
    np.testing.assert_allclose(me, ref, rtol=1e-5)


def test_head_loss_oracle():
    """Full RPN loss vs the reference SSDRotateHead's own methods
    (prepare_loss_weights / create_loss / get_direction_target +
    weighted_cross_entropy) with the .loss() reductions and the 2.0/1.0/0.2
    scales (ssd_rotate_head.py:284-305)."""
    hd = R.load_ssd_rotate_head()
    ls = R.load_losses()
    head = hd.SSDRotateHead(num_class=1, num_output_filters=8)

    rng = np.random.default_rng(8)
    b, a = 2, 300
    anchors = rand_boxes7(rng, a, car_like=True, yaw_grid=True
                          ).astype(np.float32)
    g = 8
    gt = np.stack([rand_boxes7(rng, g, car_like=True) for _ in range(b)]
                  ).astype(np.float32)
    for i in range(b):
        pick = rng.integers(0, a, g)
        gt[i, :, :2] = anchors[pick, :2] + rng.normal(0, 0.3, (g, 2))
        gt[i, :, 2] = -1.7
    gt_valid = np.ones((b, g), bool)
    gt_classes = np.ones((b, g), np.int32)
    box_preds = rng.normal(0, 0.5, (b, a, 7)).astype(np.float32)
    cls_preds = rng.normal(0, 2.0, (b, a, 1)).astype(np.float32)
    dir_preds = rng.normal(0, 1.0, (b, a, 2)).astype(np.float32)
    mask = np.ones((b, a), bool)

    outs = ssd_head.HeadOutputs(jnp.asarray(box_preds),
                                jnp.asarray(cls_preds),
                                jnp.asarray(dir_preds))
    losses = ssd_head.head_loss(
        outs, jnp.asarray(anchors), jnp.asarray(mask), jnp.asarray(gt),
        jnp.asarray(gt_classes), jnp.asarray(gt_valid), num_class=1,
        matched_thresholds=(0.6,), unmatched_thresholds=(0.45,))

    # identical label/target inputs from the (oracle-validated) assigner
    assigns = [T.create_targets(jnp.asarray(anchors), jnp.asarray(gt[i]),
                                jnp.asarray(gt_valid[i]),
                                T.nearest_iou_similarity, 0.6, 0.45,
                                anchors_mask=jnp.asarray(mask[i]),
                                gt_classes=jnp.asarray(gt_classes[i]))
               for i in range(b)]
    labels = torch.tensor(np.stack([np.asarray(x.labels) for x in assigns],
                                   dtype=np.int64))
    targets = torch.tensor(np.stack([np.asarray(x.bbox_targets)
                                     for x in assigns]))
    assert int((labels > 0).sum()) > 0, "test needs positives"

    cls_w, reg_w, cared = head.prepare_loss_weights(labels)
    cls_t = labels * cared.type_as(labels)
    loc_loss, cls_loss = head.create_loss(
        box_preds=torch.tensor(box_preds), cls_preds=torch.tensor(cls_preds),
        cls_targets=cls_t, cls_weights=cls_w, reg_targets=targets,
        reg_weights=reg_w, num_class=1)
    anchors_t = torch.tensor(np.broadcast_to(anchors, (b, a, 7)).copy())
    dir_labels = head.get_direction_target(anchors_t, targets,
                                           use_one_hot=False).view(-1)
    weights = (labels > 0).float()
    weights = weights / torch.clamp(weights.sum(-1, keepdim=True), min=1.0)
    dir_loss = ls.weighted_cross_entropy(
        torch.tensor(dir_preds).view(-1, 2), dir_labels,
        weight=weights.view(-1), avg_factor=1.)

    np.testing.assert_allclose(float(losses["rpn_loc_loss"]),
                               float(loc_loss / b * 2.0), rtol=2e-4)
    np.testing.assert_allclose(float(losses["rpn_cls_loss"]),
                               float(cls_loss / b * 1.0), rtol=2e-4)
    np.testing.assert_allclose(float(losses["rpn_dir_loss"]),
                               float(dir_loss / b * 0.2), rtol=2e-4)


def test_multiclass_head_layout_oracle():
    """The reference's MULTI-CLASS head layout factorizes onto ours with a
    plain weight transpose: run SSDRotateHead(num_class=3).forward and its
    loss-side view(batch, -1, d) regrouping, vs our head_apply on the same
    conv weights mapped [Co,Ci,1,1] -> [1,1,Ci,Co]. Rows must be equal —
    this is the executable refutation of the round-2 claim that the
    view(N, num_class, -1, H, W) algebra does not factorize, and the
    correctness proof for multi-class reference-checkpoint import."""
    hd = R.load_ssd_rotate_head()
    c, f, h, w = 3, 8, 4, 5
    torch.manual_seed(0)
    head = hd.SSDRotateHead(num_class=c, num_output_filters=f)
    x = torch.randn(2, f, h, w)
    with torch.no_grad():
        box_p, cls_p, dir_p = head.forward(x)
    ref_rows = (box_p.reshape(2, -1, 7), cls_p.reshape(2, -1, c),
                dir_p.reshape(2, -1, 2))

    params = {}
    for name, mod in (("conv_cls", head.conv_cls),
                      ("conv_box", head.conv_box),
                      ("conv_dir", head.conv_dir_cls)):
        params[name] = {
            "w": jnp.asarray(mod.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "b": jnp.asarray(mod.bias.detach().numpy())}
    xm = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    outs = ssd_head.head_apply(params, xm, num_class=c)
    for name, ref, me in (("box", ref_rows[0], outs.box_preds),
                          ("cls", ref_rows[1], outs.cls_preds),
                          ("dir", ref_rows[2], outs.dir_preds)):
        np.testing.assert_allclose(np.asarray(me), ref.numpy(), atol=1e-5,
                                   err_msg=name)


# ---------------------------------------------------------------------------
# KITTI evaluation protocol
# ---------------------------------------------------------------------------

def _messy_dataset(seed=7, n_img=12):
    rng = np.random.default_rng(seed)
    gts, dts = [], []
    for _ in range(n_img):
        g, d = messy_anno_pair(rng, n_gt=int(rng.integers(3, 9)),
                               n_dt=int(rng.integers(3, 11)))
        gts.append(g)
        dts.append(d)
    return gts, dts


def test_get_thresholds_oracle():
    ke = R.load_kitti_eval()
    rng = np.random.default_rng(9)
    for n, num_gt in ((1, 3), (37, 40), (80, 70), (200, 180)):
        scores = rng.random(n)
        ref = np.array(ke.get_thresholds(scores.copy(), num_gt))
        me = np.array(KE.get_thresholds(scores.copy(), num_gt))
        np.testing.assert_allclose(me, ref)


def test_clean_data_oracle():
    ke = R.load_kitti_eval()
    gts, dts = _messy_dataset()
    for cls in (0, 1):
        for diff in range(3):
            for g, d in zip(gts, dts):
                nv_r, ig_gt_r, ig_dt_r, dc_r = ke.clean_data(g, d, cls, diff)
                nv_m, ig_gt_m, ig_dt_m, dc_m = KE.clean_data(g, d, cls, diff)
                assert nv_m == nv_r
                np.testing.assert_array_equal(ig_gt_m, ig_gt_r)
                np.testing.assert_array_equal(ig_dt_m, ig_dt_r)
                assert len(dc_m) == len(dc_r)
                if len(dc_r):
                    np.testing.assert_allclose(np.asarray(dc_m),
                                               np.asarray(dc_r))


def test_full_eval_protocol_oracle():
    """get_official_eval_result vs the reference's eval_class_v3 pipeline on
    messy canned annos: every metric x difficulty x strict/loose block,
    including AOS, must agree (the reference's rotated IoU is its own
    devRotateIoUEval device function)."""
    ke = R.load_kitti_eval()
    gts, dts = _messy_dataset()
    mo = np.zeros((2, 3, 1))
    mo[0, :, 0] = [0.7, 0.7, 0.7]
    mo[1, :, 0] = [0.7, 0.5, 0.5]
    rb = ke.eval_class_v3(gts, dts, [0], [0, 1, 2], 0, mo, True, num_parts=1)
    bev = ke.eval_class_v3(gts, dts, [0], [0, 1, 2], 1, mo, num_parts=1)
    d3 = ke.eval_class_v3(gts, dts, [0], [0, 1, 2], 2, mo, num_parts=1)
    ref = {"bbox": ke.get_mAP_v2(rb["precision"]),
           "bev": ke.get_mAP_v2(bev["precision"]),
           "3d": ke.get_mAP_v2(d3["precision"]),
           "aos": ke.get_mAP_v2(rb["orientation"])}

    res, _ = KE.get_official_eval_result(gts, dts, ["Car"])
    for i, block in enumerate(("strict", "loose")):
        blk = res["Car"] if block == "strict" else res["Car"]["loose"]
        for name in ("bbox", "bev", "3d", "aos"):
            for d in range(3):
                np.testing.assert_allclose(
                    blk[name]["R11"][d], ref[name][0, d, i], atol=1e-9,
                    err_msg=f"{block}/{name}/diff{d}")


# ---------------------------------------------------------------------------
# sparse conv vs torch-dense autograd
# ---------------------------------------------------------------------------

def _torch_dense_conv(keys, feats, weight, shape, stride):
    cin, cout = weight.shape[1], weight.shape[2]
    x = torch.tensor(np.asarray(S.to_dense(keys, feats, shape)).copy(),
                     requires_grad=True)                       # [D,H,W,C]
    w = torch.tensor(np.asarray(weight).copy(), requires_grad=True)
    y = torch.nn.functional.conv3d(
        x.permute(3, 0, 1, 2)[None],
        w.reshape(3, 3, 3, cin, cout).permute(4, 3, 0, 1, 2),
        stride=stride, padding=1)[0].permute(1, 2, 3, 0)
    return x, w, y


def test_subm_conv_torch_oracle():
    rng = np.random.default_rng(11)
    shape = (5, 10, 12)
    nact, cap, cin, cout = 80, 112, 6, 5
    keys, feats = random_level(rng, shape, nact, cin, cap=cap)
    weight = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
    coords = np.asarray(S.keys_to_coords(keys, shape))[:nact]

    plan = S.build_subm_plan(keys, shape)
    out = np.asarray(S.subm_conv(feats, weight, plan))
    x, w, y = _torch_dense_conv(keys, feats, weight, shape, 1)
    ref_rows = y[coords[:, 0], coords[:, 1], coords[:, 2]].detach().numpy()
    np.testing.assert_allclose(out[:nact], ref_rows, atol=1e-4)

    cot = rng.normal(size=(cap, cout)).astype(np.float32)
    cot[np.asarray(keys) == S.INVALID_KEY] = 0
    cotj = jnp.asarray(cot)
    for symmetric in (True, False):
        gf, gw = jax.grad(
            lambda f, w_: jnp.vdot(
                S.subm_conv(f, w_, plan, symmetric=symmetric), cotj),
            argnums=(0, 1))(feats, weight)
        if x.grad is None:
            dcot = torch.zeros_like(y)
            dcot[coords[:, 0], coords[:, 1], coords[:, 2]] = \
                torch.tensor(cot[:nact].copy())
            (y * dcot).sum().backward()
        gx_rows = x.grad[coords[:, 0], coords[:, 1],
                         coords[:, 2]].numpy()
        np.testing.assert_allclose(np.asarray(gf)[:nact], gx_rows, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), w.grad.numpy(), atol=1e-4)


def test_stride_conv_torch_oracle():
    """Stride-2 sparse conv forward + VJP vs torch conv3d autograd. The VJP
    direction caught stride_conv using the symmetric-plan backward (invalid
    across different in/out active sets)."""
    rng = np.random.default_rng(12)
    shape = (5, 10, 12)
    nact, cap, cin, cout = 80, 112, 6, 5
    keys, feats = random_level(rng, shape, nact, cin, cap=cap)
    weight = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
    in_coords = np.asarray(S.keys_to_coords(keys, shape))[:nact]

    out_keys, out_feats, out_sh = S.stride_conv(keys, feats, weight, shape,
                                                256)
    n = int(np.sum(np.asarray(out_keys) != S.INVALID_KEY))
    oc = np.asarray(S.keys_to_coords(out_keys, out_sh))[:n]
    x, w, y = _torch_dense_conv(keys, feats, weight, shape, 2)
    ref_rows = y[oc[:, 0], oc[:, 1], oc[:, 2]].detach().numpy()
    np.testing.assert_allclose(np.asarray(out_feats)[:n], ref_rows,
                               atol=1e-4)

    cot = rng.normal(size=(256, cout)).astype(np.float32)
    cot[n:] = 0
    gf, gw = jax.grad(
        lambda f, w_: jnp.vdot(S.stride_conv(keys, f, w_, shape, 256)[1],
                               jnp.asarray(cot)),
        argnums=(0, 1))(feats, weight)
    dcot = torch.zeros_like(y)
    dcot[oc[:, 0], oc[:, 1], oc[:, 2]] = torch.tensor(cot[:n].copy())
    (y * dcot).sum().backward()
    gx_rows = x.grad[in_coords[:, 0], in_coords[:, 1],
                     in_coords[:, 2]].numpy()
    np.testing.assert_allclose(np.asarray(gf)[:nact], gx_rows, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), w.grad.numpy(), atol=1e-4)
