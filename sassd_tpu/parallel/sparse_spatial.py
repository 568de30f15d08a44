"""Banded sharding of the SPARSE stage — spatial parallelism for the whole
detector, not just the dense BEV trunk.

`parallel/spatial.py` shards the dense BEV canvas along H and lets XLA
insert conv halo exchanges; the sparse ladder (the dominant cost of the
long-range config: 80k active voxels, SURVEY §2.7/§5) stayed replicated.
This module partitions the level-0 active set into S y-bands, each padded
with a static halo ring, and runs the UNCHANGED sparse engine per band on a
band-local grid:

  * A y-band is just a smaller grid [D, band_h + 2*halo, W]: rebasing y
    keeps keys sorted (bands cut on y, so x-runs — the packed triple
    gathers' invariant — survive), and every existing plan builder /
    gather-GEMM / downsample works as-is at band shapes.
  * Halo cells are RECOMPUTED per band instead of exchanged mid-ladder
    (static-shape-friendly; no collectives inside the ladder). The halo is
    sized so every band-owned output is exact: a level-3 cell depends on
    level-0 cells within +-25 y (2+1 convs at L0, 2+1 at L1, 3+1 at L2),
    the dense level-3 tail adds 3 more L3 convs, and the aux branch's ring
    3-NN reaches ONE level-3 cell beyond the owned range ->
    25 + 8*(3+1) = 57, rounded to HALO = 64 (multiple of 8 keeps stride
    parity aligned: band starts are divisible by 2^3).
  * BatchNorm statistics count every active cell ONCE globally: the banded
    ladder passes `bn_owned_y` (backbone.vxnet_apply) so halo duplicates
    are excluded from the stats — banded loss == replicated loss exactly,
    not approximately.
  * Each band densifies only its OWNED y rows, so the assembled BEV canvas
    comes out already sharded along H over the same 'spatial' mesh axis the
    dense trunk uses — the two spatial shardings compose with no resharding.
  * The aux branch runs per band with the device ring plans
    (sparse.build_aux_plan on band-local cells); owned-query masking keeps
    the aux loss normalization global. (aux_interp='exact' is not supported
    banded: brute-force 3-NN is not a local operation.)

No reference analog (SURVEY §2.7: the reference is data-parallel only);
this fills the sequence-parallel slot for the voxel-count scaling axis.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sassd_tpu.config import SASSDConfig
from sassd_tpu.core import losses as loss_ops  # noqa: F401  (re-export site)
from sassd_tpu.models import backbone, bev, detector, pswarp, ssd_head
from sassd_tpu.models import layers as L
from sassd_tpu.ops import interpolate, sparse as sp

HALO = 64   # level-0 y cells; see module docstring for the radius accounting


class BandSpec(NamedTuple):
    s: int                    # bands == mesh 'spatial' size
    band_h: int               # owned level-0 y cells per band (mult of 8)
    halo: int                 # halo cells each side (mult of 8)
    caps: Tuple[int, ...]     # per-band per-level row caps


def _mult8(x: int) -> int:
    return ((x + 7) // 8) * 8


def make_band_spec(cfg: SASSDConfig, s: int, cap_margin: float = 1.5,
                   halo: int = HALO) -> BandSpec:
    """Size the bands for `s` shards. Caps scale with the band's covered
    fraction of the grid (owned + halo) times a safety margin — static, like
    every other cap in the framework."""
    h = cfg.sparse_shape[1]
    if h % (8 * s):
        raise ValueError(f"grid H={h} not divisible by 8*s={8 * s}")
    if halo % 8:
        raise ValueError("halo must be a multiple of 8 (stride parity)")
    band_h = h // s
    cover = min(band_h + 2 * halo, h) / h
    caps = tuple(min(c, _mult8(int(c * cover * cap_margin)) + 8)
                 for c in cfg.caps.level_caps)
    return BandSpec(s, band_h, halo, caps)


def band_shape(cfg: SASSDConfig, spec: BandSpec) -> Tuple[int, int, int]:
    d, _h, w = cfg.sparse_shape
    return (d, spec.band_h + 2 * spec.halo, w)


def partition(coords: jnp.ndarray, rows: List[jnp.ndarray], spec: BandSpec
              ) -> Tuple[jnp.ndarray, List[jnp.ndarray], jnp.ndarray]:
    """Split [B, M, ...] row arrays into per-band arrays [S, B, cap0, ...].

    coords: [B, M, 3] global zyx (-1 padding). Band b owns y in
    [b*band_h, (b+1)*band_h) and also carries [lo, hi) = owned +- halo.
    Returned coords are BAND-LOCAL (y -= lo); row order — hence key
    sortedness — is preserved (compaction by running rank).

    Also returns overflow [S, B] int32: members beyond the per-band level-0
    cap, which partition silently truncates. A nonzero overflow means the
    banded==replicated guarantee is broken by an undersized cap_margin —
    forward_train_banded surfaces the batch total as the `band_overflow`
    metric (the banded analog of `guided_truncated`).
    """
    cb = spec.caps[0]

    def one(c, ex, lo, hi):
        y = c[:, 1]
        valid = c[:, 0] >= 0
        mem = valid & (y >= lo) & (y < hi)
        rank = jnp.cumsum(mem.astype(jnp.int32)) - 1
        dst = jnp.where(mem, rank, cb)
        cl = jnp.where(valid[:, None], c.at[:, 1].add(-lo), -1)
        bc = jnp.full((cb, 3), -1, jnp.int32).at[dst].set(cl, mode="drop")
        bex = [jnp.zeros((cb,) + e.shape[1:], e.dtype
                         ).at[dst].set(e, mode="drop") for e in ex]
        over = jnp.maximum(jnp.sum(mem.astype(jnp.int32)) - cb, 0)
        return bc, bex, over

    bcs, bexs, bovs = [], [], []
    for b in range(spec.s):
        lo = b * spec.band_h - spec.halo
        hi = (b + 1) * spec.band_h + spec.halo
        bc, bex, bov = jax.vmap(lambda c, *e: one(c, list(e), lo, hi)
                                )(coords, *rows)
        bcs.append(bc)
        bexs.append(bex)
        bovs.append(bov)
    bcoords = jnp.stack(bcs, axis=0)                       # [S, B, cb, 3]
    brows = [jnp.stack([bexs[b][i] for b in range(spec.s)], axis=0)
             for i in range(len(rows))]
    return bcoords, brows, jnp.stack(bovs, axis=0)         # [S, B]


def _y_top_rows(cfg: SASSDConfig, spec: BandSpec, b: int) -> jnp.ndarray:
    """[S*B] exclusive band-local y bound of the GLOBAL grid top: band b's
    local grid runs past the real grid for the top band(s); the downsample
    must clip its round-up candidates at H_global - lo (backbone y_top)."""
    h = cfg.sparse_shape[1]
    lo = np.arange(spec.s) * spec.band_h - spec.halo
    return jnp.asarray(np.repeat((h - lo).astype(np.int32), b))


def _banded_aux(params, middles, points_mean, cell0, aux_plans, cfg,
                spec: BandSpec):
    """detector.aux_forward over band-local cells: the candidate-center
    arithmetic needs each band's grid origin (pc_min shifted by the band's
    y offset), threaded per row."""
    pcr0 = np.asarray(cfg.voxel.point_cloud_range[:3], np.float32)
    vs0 = np.asarray(cfg.voxel.voxel_size, np.float32)
    sb = points_mean.shape[0]
    b = sb // spec.s
    band_lo = (np.arange(spec.s) * spec.band_h - spec.halo).astype(np.float32)
    pcr_rows = jnp.asarray(
        np.repeat(pcr0[None], spec.s, 0)
        + np.stack([np.zeros(spec.s), band_lo * vs0[1], np.zeros(spec.s)], 1)
    )                                                      # [S, 3]
    pcr_rows = jnp.repeat(pcr_rows, b, axis=0)             # [S*B, 3]

    feats_per_level = []
    for lvl, ((keys, feats, shape), mult) in enumerate(
            zip(middles, detector._LEVEL_VOXEL_MULT), start=1):
        vs = vs0 * mult
        interp = jax.vmap(
            lambda q, c0, f, pl, pr, _l=lvl: interpolate
            .neighborhood_interpolate_cells(q, c0, _l, f, pl, vs, pr)
        )(points_mean, cell0, feats, aux_plans[f"aux{lvl}"], pcr_rows)
        feats_per_level.append(interp)
    pointwise = L.linear(params["aux"]["point_fc"],
                         jnp.concatenate(feats_per_level, axis=-1))
    point_cls = L.linear(params["aux"]["point_cls"], pointwise)[..., 0]
    point_reg = L.linear(params["aux"]["point_reg"], pointwise)
    return point_cls, point_reg


class _BandedSpine(NamedTuple):
    bev_map: jnp.ndarray
    conv6: jnp.ndarray
    middles: list
    aux_plans: dict            # {} at inference
    flat_c: jnp.ndarray        # [S*B, cap0, 3] band-local coords
    flat_f: jnp.ndarray        # [S*B, cap0, F] VFE features
    band_over: jnp.ndarray     # [S, B] level-0 cap overflow counts
    vx_state: dict
    bev_state: dict
    s: int
    b: int


def _banded_spine(params, state, batch, cfg: SASSDConfig, spec: BandSpec,
                  mesh: Mesh, *, train: bool) -> _BandedSpine:
    """Shared banded trunk: partition -> per-band sparse ladder (halo
    recompute, owned-masked BN, y_top clipping) -> H-sharded BEV trunk."""
    cd = detector._compute_dtype(cfg)
    vfe = backbone.vfe_mean(batch["voxels"], batch["num_points"])   # [B,M,F]
    bcoords, (bvfe,), band_over = partition(batch["coords"], [vfe], spec)
    s, b = bcoords.shape[:2]
    bshape = band_shape(cfg, spec)
    flat_c = bcoords.reshape(s * b, *bcoords.shape[2:])
    flat_f = bvfe.reshape(s * b, *bvfe.shape[2:])
    if mesh is not None:
        sh_rows = NamedSharding(mesh, P(("spatial", "data")))
        flat_c = jax.lax.with_sharding_constraint(flat_c, sh_rows)
        flat_f = jax.lax.with_sharding_constraint(flat_f, sh_rows)
    keys0 = jax.vmap(lambda c: sp.coords_to_keys(c, bshape))(flat_c)

    want_aux = train
    if want_aux and cfg.model.aux_interp != "ring":
        raise ValueError("banded sharding requires aux_interp='ring' "
                         "(exact 3-NN is not band-local)")
    res = backbone.vxnet_apply(
        params["vxnet"], state["vxnet"], keys0, flat_f,
        sparse_shape=bshape, level_caps=spec.caps, train=train,
        compute_dtype=cd, dense_index=True, host_plans=None,
        dense_tail=cfg.model.dense_tail,
        triple_gather=cfg.model.triple_gather,
        store_im2col=cfg.model.store_im2col, flat_batch=False,
        sorted_device_levels=cfg.model.sorted_device_levels,
        plan_lookup=cfg.model.plan_lookup,
        want_aux_plans=want_aux,
        bn_owned_y=(spec.halo, spec.halo + spec.band_h),
        y_top=_y_top_rows(cfg, spec, b))
    if want_aux:
        out_keys, out_feats, out_shape, middles, vx_state, aux_plans = res
    else:
        out_keys, out_feats, out_shape, middles, vx_state = res
        aux_plans = {}

    # ---- assemble the H-sharded BEV canvas from owned band rows ----
    lo3, bh3 = spec.halo >> 3, spec.band_h >> 3
    if out_keys is None:                                   # dense-tail output
        od = out_feats[:, :, lo3:lo3 + bh3]                # [S*B,D3,bh3,W3,C]
    else:
        dense = jax.vmap(lambda k, f: sp.to_dense(k, f, out_shape)
                         )(out_keys, out_feats)
        od = dense[:, :, lo3:lo3 + bh3]
    d3, w3, c3 = od.shape[1], od.shape[3], od.shape[4]
    od = od.reshape(s, b, d3, bh3, w3, c3)
    od = jnp.transpose(od, (1, 0, 3, 4, 2, 5))             # [B,S,bh3,W3,D3,C]
    bev_in = od.reshape(b, s * bh3, w3, d3 * c3)
    bev_sh = None
    if mesh is not None:
        bev_sh = NamedSharding(mesh, P(None, "spatial", None, None))
        bev_in = jax.lax.with_sharding_constraint(bev_in, bev_sh)
    bev_map, conv6, bev_state = bev.bevnet_apply(
        params["bevnet"], state["bevnet"], bev_in, train=train,
        compute_dtype=cd)
    if bev_sh is not None:
        bev_map = jax.lax.with_sharding_constraint(bev_map, bev_sh)
        conv6 = jax.lax.with_sharding_constraint(conv6, bev_sh)
    return _BandedSpine(bev_map, conv6, middles, aux_plans, flat_c, flat_f,
                        band_over, vx_state, bev_state, s, b)


def forward_train_banded(params, state, batch, anchors, cfg: SASSDConfig,
                         spec: BandSpec, mesh: Mesh = None):
    """detector.forward_train with the sparse stage banded over 'spatial'.

    Same losses as the replicated step (asserted in tests/test_spatial.py
    and the multichip dryrun): aux runs per band on owned queries, the BEV
    canvas is assembled H-sharded, heads are unchanged.
    """
    cd = detector._compute_dtype(cfg)
    sp_out = _banded_spine(params, state, batch, cfg, spec, mesh, train=True)
    s, b = sp_out.s, sp_out.b
    bev_map, conv6 = sp_out.bev_map, sp_out.conv6
    middles, aux_plans = sp_out.middles, sp_out.aux_plans
    flat_c, flat_f, band_over = sp_out.flat_c, sp_out.flat_f, sp_out.band_over

    # ---- aux branch on owned band queries ----
    points_mean = flat_f[..., :3]
    owned0 = ((flat_c[:, :, 0] >= 0)
              & (flat_c[:, :, 1] >= spec.halo)
              & (flat_c[:, :, 1] < spec.halo + spec.band_h))
    point_cls, point_reg = _banded_aux(params, middles, points_mean, flat_c,
                                       aux_plans, cfg, spec)
    tile = lambda x: jnp.concatenate([x] * s, axis=0)      # [B,...]->[S*B,...]
    spine_like = detector.SpineOut(
        bev_map, conv6, middles, points_mean, owned0, {}, aux_plans, flat_c)
    losses = detector.aux_loss(
        point_cls, point_reg, spine_like,
        dict(gt_boxes=tile(batch["gt_boxes"]),
             gt_valid=tile(batch["gt_valid"])),
        denom=b)

    # ---- heads (identical to detector.forward_train) ----
    outs = ssd_head.head_apply(params["head"], bev_map,
                               cfg.model.num_class, cfg.model.box_code_size,
                               cfg.model.num_anchor_per_loc,
                               fold=cfg.model.fold_head)
    matched, unmatched = detector._assigner_thresholds(cfg)
    from sassd_tpu.core import targets as target_ops
    losses.update(ssd_head.head_loss(
        outs, anchors, batch["anchors_mask"], batch["gt_boxes"],
        batch["gt_classes"], batch["gt_valid"],
        num_class=cfg.model.num_class, matched_thresholds=matched,
        unmatched_thresholds=unmatched,
        similarity_fn=target_ops.SIMILARITY_FNS[cfg.train.rpn_similarity]))
    ga = ssd_head.get_guided_anchors(
        outs, anchors, batch["anchors_mask"], num_class=cfg.model.num_class,
        thr=cfg.train.anchor_thr, cap=cfg.caps.guided_train,
        gt_boxes=batch["gt_boxes"], gt_labels=batch["gt_classes"],
        gt_valid=batch["gt_valid"])
    scores, warp_state = pswarp.pswarp_apply(
        params["pswarp"], state["pswarp"], conv6, ga.boxes, ga.valid,
        window_size=cfg.model.window_size,
        grid_offsets=cfg.model.grid_offsets,
        featmap_stride=cfg.model.featmap_stride, train=True,
        compute_dtype=cd, packed=cfg.model.packed_warp)
    losses.update(pswarp.pswarp_loss(
        scores, ga.boxes, ga.valid, batch["gt_boxes"], batch["gt_valid"],
        pos_iou_thr=cfg.train.extra_pos_iou,
        neg_iou_thr=cfg.train.extra_neg_iou))
    losses["guided_truncated"] = jnp.mean(ga.truncated.astype(jnp.float32))
    # metric, not a loss (no 'loss' in key): level-0 actives silently
    # truncated by an undersized per-band cap — nonzero breaks the
    # banded==replicated guarantee (see partition)
    losses["band_overflow"] = jnp.sum(band_over.astype(jnp.float32))

    new_state = dict(state)
    new_state["vxnet"] = sp_out.vx_state
    new_state["bevnet"] = sp_out.bev_state
    new_state["pswarp"] = warp_state
    return losses, new_state


def forward_test_banded(params, state, batch, anchors, cfg: SASSDConfig,
                        spec: BandSpec, mesh: Mesh = None):
    """detector.forward_test with the sparse stage banded over 'spatial' —
    long-range INFERENCE on the same spatial mesh its training uses.

    The heads (guided anchors, PSWarp rescoring, NMS) are identical to the
    replicated path; only the spine is banded, so detections equal the
    replicated run's up to float reduction order (tests/test_spatial.py).
    No aux branch at inference (detector.forward_test:324-350).
    """
    cd = detector._compute_dtype(cfg)
    sp_out = _banded_spine(params, state, batch, cfg, spec, mesh, train=False)
    outs = ssd_head.head_apply(params["head"], sp_out.bev_map,
                               cfg.model.num_class, cfg.model.box_code_size,
                               cfg.model.num_anchor_per_loc,
                               fold=cfg.model.fold_head)
    ga = ssd_head.get_guided_anchors(
        outs, anchors, batch["anchors_mask"], num_class=cfg.model.num_class,
        thr=cfg.test.anchor_thr, cap=cfg.caps.guided_test)
    scores, _ = pswarp.pswarp_apply(
        params["pswarp"], state["pswarp"], sp_out.conv6, ga.boxes, ga.valid,
        window_size=cfg.model.window_size,
        grid_offsets=cfg.model.grid_offsets,
        featmap_stride=cfg.model.featmap_stride, train=False,
        compute_dtype=cd, packed=cfg.model.packed_warp)
    db, ds, dl, dv = pswarp.rescore_and_nms(
        ga.boxes, scores, ga.labels, ga.valid,
        score_thr=cfg.test.score_thr, nms_iou_thr=cfg.test.nms_iou_thr,
        max_det=cfg.caps.max_det, nms_pre=cfg.test.nms_pre)
    return dict(boxes=db, scores=ds, labels=dl, valid=dv,
                guided_truncated=ga.truncated)


def make_banded_test_step(cfg: SASSDConfig, anchors, mesh: Mesh,
                          spec: BandSpec, packed_layout=None):
    """Jitted banded inference step (params/state/batch replicated in; the
    banding itself shards the spine over 'spatial')."""
    from sassd_tpu.train.loop import unpack_batch
    repl = NamedSharding(mesh, P())

    def step(params, state, batch):
        if packed_layout is not None:
            batch = unpack_batch(batch, packed_layout)
        return forward_test_banded(params, state, batch, anchors, cfg,
                                   spec, mesh=mesh)

    return jax.jit(step, in_shardings=(repl, repl, repl), out_shardings=repl)


def make_banded_train_step(cfg: SASSDConfig, anchors, tx, mesh: Mesh,
                           spec: BandSpec, packed_layout=None):
    """Jitted train step with sparse+dense spatial sharding — shares the
    step body (non-finite guard, packed h2d, donation) with
    train/loop.py::make_train_step via its forward_fn hook."""
    from sassd_tpu.train.loop import make_train_step

    def fwd(params, state, batch, anchors_, cfg_, bev_sharding=None):
        return forward_train_banded(params, state, batch, anchors_, cfg_,
                                    spec, mesh=mesh)

    return make_train_step(cfg, anchors, tx, mesh=mesh,
                           packed_layout=packed_layout, forward_fn=fwd)
