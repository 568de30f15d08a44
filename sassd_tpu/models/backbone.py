"""Voxel feature encoding + sparse 3D backbone (VxNet).

TPU re-design of SimpleVoxel (/root/reference/mmdet/models/backbones/
vxnet.py:99-116) and VxNet/SpMiddleFHD (/root/reference/mmdet/models/necks/
cmn.py:102-231): the same submanifold/strided conv ladder

    double(Cin->16) -> /2 -> double(32) [mid0] -> /2 -> triple(64) [mid1]
    -> /2 -> triple(64) [mid2] -> 1x1x1 conv(64) -> densify

but expressed over per-sample fixed-capacity sorted-key voxel sets, with one
neighbor gather plan built per resolution level and shared by all submanifold
convs at that level (the spconv `indice_key` reuse, cmn.py:140-173).
BatchNorm statistics are computed over valid voxels of the whole batch,
matching spconv's dense packing of actives.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sassd_tpu.ops import sparse as sp
from . import layers as L


def vfe_mean(voxels: jnp.ndarray, num_points: jnp.ndarray) -> jnp.ndarray:
    """Mean-of-points VFE (vxnet.py:110-116): [B,V,T,F], [B,V] -> [B,V,F]."""
    denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
    return jnp.sum(voxels, axis=-2) / denom


# -- PointNet-style VFE (the reference's VFELayer/VoxelFeatNet,
#    vxnet.py:7-97 — registered but unused by its configs; provided for
#    capability parity as an opt-in encoder) --------------------------------

def vfe_pointnet_init(key, num_input_features: int, units=(32, 64),
                      out_features: int = 4):
    """Per-point MLP + masked max-pool VFE (VFELayer semantics). The final
    linear maps back to the backbone's input width so the sparse ladder is
    unchanged."""
    ks = jax.random.split(key, len(units) + 1)
    params, state = {}, {}
    cin = num_input_features + 3          # + centroid-relative offsets
    for i, u in enumerate(units):
        params[f"fc{i}"] = L.linear_init(ks[i], cin, u)
        params[f"bn{i}"], state[f"bn{i}"] = L.bn_init(u)
        cin = 2 * u                       # concat(point, pooled)
    params["out"] = L.linear_init(ks[-1], cin, out_features)
    return params, state


def vfe_pointnet_apply(params, state, voxels, num_points, *, train: bool):
    """[B,V,T,F] -> ([B,V,out], new_state): pointwise MLP with masked
    max-pooling over the point slots (VFELayer, vxnet.py:7-42: linear ->
    BN over points -> ReLU -> masked max, concat pooled back per point)."""
    t = voxels.shape[-2]
    denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
    mean_xyz = jnp.sum(voxels[..., :3], axis=-2) / denom       # [B,V,3]
    rel = voxels[..., :3] - mean_xyz[..., None, :]
    x = jnp.concatenate([voxels, rel], axis=-1)
    slot_valid = jnp.arange(t)[None, None, :] < num_points[..., None]

    def masked_max(y):
        m = jnp.max(jnp.where(slot_valid[..., None], y, -jnp.inf), axis=-2)
        return jnp.where(jnp.isfinite(m), m, 0.0)

    new_state = {}
    i = 0
    while f"fc{i}" in params:
        x = L.linear(params[f"fc{i}"], x)
        x, new_state[f"bn{i}"] = L.batch_norm(
            params[f"bn{i}"], state[f"bn{i}"], x, train=train,
            mask=slot_valid)
        x = L.relu(x)
        pooled = masked_max(x)
        x = jnp.concatenate(
            [x, jnp.broadcast_to(pooled[..., None, :], x.shape)], axis=-1)
        i += 1
    return L.linear(params["out"], masked_max(x)), new_state


# ---------------------------------------------------------------------------
# VxNet
# ---------------------------------------------------------------------------

_CHANNELS = dict(conv0=(None, 16), conv1=(16, 32), conv2=(32, 64),
                 conv3=(64, 64))


def vxnet_init(key, num_input_features: int = 4):
    ks = jax.random.split(key, 16)
    params, state = {}, {}

    def block(prefix, kit, cins, couts):
        bp, bs = {}, {}
        for i, (ci, co) in enumerate(zip(cins, couts)):
            bp[f"conv{i}"] = L.sparse_conv3_init(next(kit), ci, co)
            bp[f"bn{i}"], bs[f"bn{i}"] = L.bn_init(co)
        params[prefix], state[prefix] = bp, bs

    kit = iter(ks)
    block("conv0", kit, (num_input_features, 16), (16, 16))
    block("down0", kit, (16,), (32,))
    block("conv1", kit, (32, 32), (32, 32))
    block("down1", kit, (32,), (64,))
    block("conv2", kit, (64, 64, 64), (64, 64, 64))
    block("down2", kit, (64,), (64,))
    block("conv3", kit, (64, 64, 64), (64, 64, 64))
    params["extra"] = {"conv0": {"w": L.uniform_fan_in(next(kit), (64, 64), 64)},
                       "bn0": None}
    params["extra"]["bn0"], state["extra"] = L.bn_init(64)
    state["extra"] = {"bn0": state["extra"]}
    return params, state


def _subm_block(p, s, feats, plan, mask, train, cd, triple=False,
                store_col=False, flat=True):
    """n x (subm conv + masked BN + ReLU) sharing one gather plan."""
    new_s = {}
    n = sum(1 for k in p if k.startswith("conv"))
    for i in range(n):
        if flat:
            feats = sp.subm_conv_batched(feats, p[f"conv{i}"]["w"], plan, cd,
                                         triple=triple, store_col=store_col)
        else:
            feats = jax.vmap(lambda f, pl: sp.subm_conv(
                f, p[f"conv{i}"]["w"], pl, cd, triple=triple,
                store_col=store_col))(feats, plan)
        feats, new_s[f"bn{i}"] = L.batch_norm(
            p[f"bn{i}"], s[f"bn{i}"], feats, train=train, mask=mask)
        feats = L.relu(feats)
    return feats, new_s


def _host_plan(arr):
    """[B, 27, cap] int (-1 = missing; possibly int16 on the wire) -> SubmPlan."""
    found = arr >= 0
    return sp.SubmPlan(jnp.maximum(arr, 0).astype(jnp.int32), found)


def vxnet_apply(params, state, keys0, feats0, *, sparse_shape, level_caps,
                train: bool, compute_dtype=jnp.float32,
                dense_index: bool = True, host_plans=None,
                dense_tail: bool = True, triple_gather: bool = True,
                store_im2col: bool = True, flat_batch: bool = True,
                sorted_device_levels: bool = True,
                plan_lookup: str = "dense",
                want_aux_plans: bool = False,
                bn_owned_y: Tuple[int, int] = None,
                y_top=None):
    """Run the sparse ladder.

    Args:
      keys0:  [B, M0] voxel keys (INVALID padded) at full resolution
        (sorted when dense_index=False).
      feats0: [B, M0, F] VFE features.
      dense_index: resolve neighbors through per-level dense index maps
        (one scatter + one gather; the TPU-fast path) instead of binary
        search over sorted keys.
      plan_lookup: on-device plan resolution backend. "dense" (default)
        = per-level dense index maps + windowed slice-3 gathers. "sorted"
        = windowed binary search over the level's sorted keys — no
        [D*H*W] map materialized, but MEASURED 4x SLOWER on v5e
        (searchsorted serializes ~15 gather rounds; PERF.md round-5
        refutation ledger) — kept for grids too large to materialize.
        Ignored with host plans; "sorted" needs sorted levels
        (sorted_device_levels=True).
      host_plans: optional dict of C++-built gather plans (ops/native.py
        build_plans_cpp, batched): subm0..3 [B,27,capL], stride1..3,
        coords1..3 [B,capL,3]. When given, no active-set or neighbor work
        happens on device at all — the spconv-rulebook division of labor,
        with the host rulebook pipelined by the data loader.
      flat_batch: run every sparse conv over ONE concatenated level array
        with batch-offset plan indices (the reference's merge_second_batch
        adapted to sorted keys; see ops/sparse.py flat-batch section)
        instead of vmapping per sample — same numerics, no batched gathers.
      sorted_device_levels: with ON-DEVICE plans, compute downsampled
        active sets as sort+unique (key-sorted levels) instead of the
        sort-free scatter-max dedup, so the packed triple gathers apply
        (3x fewer gather rows on every conv) at the cost of one XLA sort
        per downsample. Requires keys0 to be key-sorted — both voxelizers
        guarantee it. Ignored when host_plans is given (those levels are
        sorted by construction).
      want_aux_plans: with ON-DEVICE plans at train time, also build the
        aux-branch ring 3-NN plans (sparse.build_aux_plan) from the
        per-level dense index maps and return them as a SIXTH element
        {aux1,aux2,aux3: [B,27,M0]} — the device analog of the host
        rulebook's aux plans.
      bn_owned_y: optional (lo, hi) level-0 y-cell range (in THIS grid's
        coordinates): BatchNorm statistics are computed only over active
        cells with y in [lo >> L, hi >> L) at each level. Used by the
        banded spatial sharding (parallel/sparse_spatial.py) so halo
        cells — duplicated across bands — are counted once globally;
        features and gathers are unaffected.
      y_top: optional [B] int32 — exclusive level-0 y bound of the REAL
        (global) grid in this grid's coordinates, per sample. Downsampling
        clips its round-up candidates there, so a banded grid that extends
        past the global top edge keeps the replicated run's boundary
        semantics (sparse._downsample_candidates).
    Returns:
      (out_keys [B,M3], out_feats [B,M3,64], out_shape,
       middles: list of (keys, feats, shape) per level, new_state
       [, aux_plans when want_aux_plans])
    """
    cd = compute_dtype
    new_state = {}
    shape0 = sparse_shape
    m0 = keys0 != sp.INVALID_KEY

    def bn_mask(base, keys, shape, shift):
        """Restrict a BN statistics mask to band-owned y cells (no-op when
        bn_owned_y is unset)."""
        if bn_owned_y is None:
            return base
        lo, hi = bn_owned_y[0] >> shift, bn_owned_y[1] >> shift
        y = (keys // shape[2]) % shape[1]
        return base & (y >= lo) & (y < hi)
    # packed triple gathers need key-sorted level arrays — guaranteed by the
    # host rulebook (csrc sorts levels; the voxelizer sorts level 0) and,
    # when sorted_device_levels is set, by the on-device sort+unique
    # downsampler (the voxelizers keep level 0 sorted)
    sorted_dev = sorted_device_levels and host_plans is None
    tg = triple_gather and (host_plans is not None or sorted_dev)
    # windowed-binary-search plan resolution needs sorted level keys
    sorted_plans = (plan_lookup == "sorted" and host_plans is None
                    and dense_index and sorted_dev)
    # keep forward im2col matrices for the backward dW only when training
    # (inference never differentiates; saves the residual memory)
    sc = store_im2col and train
    fb = flat_batch

    def index_map(keys, shape, srt=False):
        if host_plans is not None or not dense_index or sorted_plans:
            return None
        if srt and sp.USE_DIRECT_TABLES and sp.USE_WINDOW_PLANS:
            # key-sorted levels: build the lookup_dense3 window TABLE
            # directly (one patch scatter) — the [D*H*W] dense map is
            # never materialized (sparse.build_window_table)
            if keys.shape[0] == 1:
                # B=1 (serving): un-vmapped scatters lower faster on v5e
                # (PERF.md round 5, like the de-vmapped downsample)
                return sp.WindowTable(
                    sp.build_window_table(keys[0], shape).tab[None])
            return jax.vmap(lambda k: sp.build_window_table(k, shape))(keys)
        return jax.vmap(lambda k: sp.build_index_map(
            k, shape, keys_sorted=srt))(keys)

    def subm_plan(level, keys, shape, imap):
        if host_plans is not None:
            return _host_plan(host_plans[f"subm{level}"])
        if sorted_plans:
            return jax.vmap(lambda k: sp.build_subm_plan(
                k, shape, sorted_lookup=True))(keys)
        if imap is None:
            return jax.vmap(lambda k: sp.build_subm_plan(k, shape))(keys)
        return jax.vmap(lambda k, im: sp.build_subm_plan(k, shape,
                                                         index_map=im)
                        )(keys, imap)

    imap0 = index_map(keys0, shape0, srt=True)   # both voxelizers sort L0
    plan0 = subm_plan(0, keys0, shape0, imap0)
    x, new_state["conv0"] = _subm_block(
        params["conv0"], state["conv0"], feats0, plan0,
        bn_mask(m0, keys0, shape0, 0), train, cd,
        triple=tg, store_col=sc, flat=fb)

    def down(level, pfx, keys, x, shape, cap, mask, imap):
        out_shape = sp.out_shape_stride2(shape)
        imap_out = None
        if host_plans is not None and f"strideT{level}" in host_plans:
            # gather-based backward via the host transpose plan
            out_keys = jax.vmap(lambda c: sp.coords_to_keys(c, out_shape)
                                )(host_plans[f"coords{level}"])
            plan = _host_plan(host_plans[f"stride{level}"])
            planT = _host_plan(host_plans[f"strideT{level}"])
        elif host_plans is not None:
            out_keys = jax.vmap(lambda c: sp.coords_to_keys(c, out_shape)
                                )(host_plans[f"coords{level}"])
            plan = _host_plan(host_plans[f"stride{level}"])
            planT = None
        else:
            ds = (sp.downsample_keys_dense if dense_index and not sorted_dev
                  else sp.downsample_keys)
            if y_top is None:
                if keys.shape[0] == 1:
                    # B=1 (serving): the un-vmapped sort measures ~1 ms/level
                    # faster than its B=1 vmap on v5e (PERF.md round 5)
                    out_keys = ds(keys[0], shape, cap)[None]
                else:
                    out_keys = jax.vmap(lambda k: ds(k, shape, cap))(keys)
            else:
                out_keys = jax.vmap(
                    lambda k, yt: ds(k, shape, cap,
                                     y_limit_out=yt >> level)
                )(keys, y_top)
            if sorted_plans:
                plan = jax.vmap(lambda ik, ok: sp.build_stride_plan(
                    ik, ok, shape, sorted_lookup=True))(keys, out_keys)
                # device TRANSPOSE plan: only the backward consumes it
                planT = None
                if train:
                    planT = jax.vmap(lambda ik, ok: sp.build_stride_plan_T(
                        ik, shape, out_sorted_keys=ok))(keys, out_keys)
            elif imap is None:
                plan = jax.vmap(lambda ik, ok: sp.build_stride_plan(
                    ik, ok, shape))(keys, out_keys)
                planT = None
            else:
                plan = jax.vmap(lambda ik, ok, im: sp.build_stride_plan(
                    ik, ok, shape, index_map=im))(keys, out_keys, imap)
                imap_out = index_map(out_keys, out_shape, srt=sorted_dev)
                # device TRANSPOSE plan: only the backward consumes it, so
                # inference graphs skip the build entirely
                planT = None
                if train:
                    planT = jax.vmap(lambda ik, om: sp.build_stride_plan_T(
                        ik, shape, om,
                        out_rows_cap=cap))(keys, imap_out)
        if planT is not None:
            if fb:
                y = sp.stride_conv_hostT_batched(
                    cd, tg, sc, x, params[pfx]["conv0"]["w"], plan, planT)
            else:
                y = jax.vmap(lambda f, i, fo, iT, foT: sp.stride_conv_hostT(
                    cd, tg, sc, f, params[pfx]["conv0"]["w"], i, fo, iT, foT)
                    )(x, plan.idx, plan.found, planT.idx, planT.found)
        elif fb:
            y = sp.subm_conv_batched(
                x, params[pfx]["conv0"]["w"], plan, cd, symmetric=False,
                triple=tg)
        else:
            y = jax.vmap(lambda f, pl: sp.subm_conv(
                f, params[pfx]["conv0"]["w"], pl, cd, symmetric=False,
                triple=tg))(x, plan)
        omask = out_keys != sp.INVALID_KEY
        y, bs = L.batch_norm(params[pfx]["bn0"], state[pfx]["bn0"], y,
                             train=train,
                             mask=bn_mask(omask, out_keys, out_shape, level))
        y = L.relu(y) * omask[..., None]
        new_state[pfx] = {"bn0": bs}
        return out_keys, y, out_shape, omask, imap_out

    keys1, x, shape1, m1, imap1 = down(1, "down0", keys0, x, shape0,
                                       level_caps[1], m0, imap0)
    if imap1 is None:
        imap1 = index_map(keys1, shape1)
    plan1 = subm_plan(1, keys1, shape1, imap1)
    x, new_state["conv1"] = _subm_block(
        params["conv1"], state["conv1"], x, plan1,
        bn_mask(m1, keys1, shape1, 1), train, cd, triple=tg,
        store_col=sc, flat=fb)
    mid0 = (keys1, x, shape1)

    keys2, x, shape2, m2, imap2 = down(2, "down1", keys1, x, shape1,
                                       level_caps[2], m1, imap1)
    if imap2 is None:
        imap2 = index_map(keys2, shape2)
    plan2 = subm_plan(2, keys2, shape2, imap2)
    x, new_state["conv2"] = _subm_block(
        params["conv2"], state["conv2"], x, plan2,
        bn_mask(m2, keys2, shape2, 2), train, cd, triple=tg,
        store_col=sc, flat=fb)
    mid1 = (keys2, x, shape2)

    keys3, x, shape3, m3, imap3 = down(3, "down2", keys2, x, shape2,
                                       level_caps[3], m2, imap2)

    aux_plans = {}
    if want_aux_plans and train and host_plans is None:
        if sorted_plans:
            coords0 = jax.vmap(
                lambda k: sp.keys_to_coords(k, sparse_shape))(keys0)
            for lvl, (ks, shp) in enumerate(
                    [(keys1, shape1), (keys2, shape2), (keys3, shape3)],
                    start=1):
                aux_plans[f"aux{lvl}"] = jax.vmap(
                    lambda c, k, _s=shp, _l=lvl: sp.build_aux_plan(
                        c, _l, None, _s, level_sorted_keys=k))(coords0, ks)
        else:
            if imap3 is None:
                imap3 = index_map(keys3, shape3)
            if imap1 is not None:
                coords0 = jax.vmap(
                    lambda k: sp.keys_to_coords(k, sparse_shape))(keys0)
                for lvl, (im, shp, ks) in enumerate(
                        [(imap1, shape1, keys1), (imap2, shape2, keys2),
                         (imap3, shape3, keys3)], start=1):
                    aux_plans[f"aux{lvl}"] = jax.vmap(
                        lambda c, m, _s=shp, _l=lvl,
                        _cap=ks.shape[1]: sp.build_aux_plan(
                            c, _l, m, _s, level_rows_cap=_cap))(coords0, im)

    def _ret(*core):
        return core + ((aux_plans,) if want_aux_plans else ())

    if dense_tail:
        # Level 3 as MASKED DENSE convs. The grid is tiny ([5,200,176] for
        # the car config) and D=5 folds into channels, so each 3x3x3 subm
        # conv becomes ONE fused 2D MXU conv over [B,H,W,D*C] with z-banded
        # weights — far faster than gathering ~276k rows per layer.
        # conv -> multiply by the occupancy mask IS submanifold semantics,
        # and masked BN sees exactly the active rows, so this is numerically
        # the sparse path (modulo reduction order).
        d3 = shape3[0]
        lv_sorted = host_plans is not None or sorted_dev
        xd = jax.vmap(lambda k, f: sp.to_dense(
            k, f, shape3, keys_sorted=lv_sorted))(keys3, x)
        occ3 = jax.vmap(lambda k: sp.to_dense(
            k, jnp.ones((k.shape[0], 1), jnp.float32), shape3,
            keys_sorted=lv_sorted))(keys3)
        occ3 = occ3[..., 0] > 0                                # [B,D,H,W]
        b = xd.shape[0]
        # [B,D,H,W,C] -> [B,H,W,D*C]
        xf = jnp.transpose(xd, (0, 2, 3, 1, 4)).reshape(
            b, shape3[1], shape3[2], -1)
        occ_f = jnp.transpose(occ3, (0, 2, 3, 1))              # [B,H,W,D]
        occ_bn = occ_f
        if bn_owned_y is not None:
            yr = jnp.arange(shape3[1])
            own3 = (yr >= (bn_owned_y[0] >> 3)) & (yr < (bn_owned_y[1] >> 3))
            occ_bn = occ_f & own3[None, :, None, None]

        def zbanded(w27):                                      # -> [3,3,DC,DC]
            k, cin, cout = w27.shape
            w = w27.reshape(3, 3, 3, cin, cout)                # (dz,dy,dx)
            cols = []
            for zo in range(d3):
                rows = []
                for zi in range(d3):
                    dz = zi - zo
                    if -1 <= dz <= 1:
                        rows.append(w[dz + 1])                 # [3,3,cin,cout]
                    else:
                        rows.append(jnp.zeros((3, 3, cin, cout), w.dtype))
                cols.append(jnp.concatenate(rows, axis=2))     # [3,3,D*cin,cout]
            return jnp.concatenate(cols, axis=3)               # [3,3,DC,DC]

        def dense_l3_block(prefix, xf):
            p, s = params[prefix], state[prefix]
            bs = {}
            n = sum(1 for k in p if k.startswith("conv"))
            for i in range(n):
                cdim = p[f"conv{i}"]["w"].shape[2]
                xf = L.conv2d({"w": zbanded(p[f"conv{i}"]["w"])}, xf,
                              compute_dtype=cd)
                # BN per true channel with the per-(z,y,x) mask
                x5 = xf.reshape(b, shape3[1], shape3[2], d3, cdim)
                x5 = x5 * occ_f[..., None]
                x5, bs[f"bn{i}"] = L.batch_norm(
                    p[f"bn{i}"], s[f"bn{i}"], x5, train=train, mask=occ_bn)
                x5 = L.relu(x5) * occ_f[..., None]
                xf = x5.reshape(b, shape3[1], shape3[2], -1)
            new_state[prefix] = bs
            return xf

        xf = dense_l3_block("conv3", xf)

        # extra 1x1x1 conv = per-z channel matmul + BN + ReLU
        x5 = xf.reshape(b, shape3[1], shape3[2], d3, 64)
        x5 = jnp.dot(x5.astype(cd), params["extra"]["conv0"]["w"].astype(cd),
                     preferred_element_type=jnp.float32)
        x5 = x5 * occ_f[..., None]
        x5, bs = L.batch_norm(params["extra"]["bn0"], state["extra"]["bn0"],
                              x5, train=train, mask=occ_bn)
        x5 = L.relu(x5) * occ_f[..., None]
        new_state["extra"] = {"bn0": bs}
        out_dense = jnp.transpose(x5, (0, 3, 1, 2, 4))         # [B,D,H,W,C]

        if train:
            # mid2 = conv3-block output (pre-extra), like the sparse path
            conv3_dense = jnp.transpose(
                xf.reshape(b, shape3[1], shape3[2], d3, 64), (0, 3, 1, 2, 4))
            mid2 = _gather_mid(keys3, conv3_dense, shape3)
        else:
            mid2 = None
        middles = [mid0, mid1, mid2] if train else [mid0, mid1, None]
        return _ret(None, out_dense, shape3, middles, new_state)

    if imap3 is None:
        imap3 = index_map(keys3, shape3)
    plan3 = subm_plan(3, keys3, shape3, imap3)
    x, new_state["conv3"] = _subm_block(
        params["conv3"], state["conv3"], x, plan3,
        bn_mask(m3, keys3, shape3, 3), train, cd, triple=tg,
        store_col=sc, flat=fb)
    mid2 = (keys3, x, shape3)

    # extra_conv: 1x1x1 SparseConv3d + BN + ReLU (cmn.py:208-212)
    x = jax.vmap(lambda f: sp.conv1x1(f, params["extra"]["conv0"]["w"], cd))(x)
    x, bs = L.batch_norm(params["extra"]["bn0"], state["extra"]["bn0"], x,
                         train=train, mask=bn_mask(m3, keys3, shape3, 3))
    x = L.relu(x) * m3[..., None]
    new_state["extra"] = {"bn0": bs}

    return _ret(keys3, x, shape3, [mid0, mid1, mid2], new_state)


def _gather_mid(keys, dense, shape):
    """Extract sparse (keys, feats) rows from a dense level (aux branch)."""
    def one(k, xd):
        c = sp.keys_to_coords(k, shape)
        z = jnp.where(c[:, 0] >= 0, c[:, 0], 0)
        f = xd[z, jnp.maximum(c[:, 1], 0), jnp.maximum(c[:, 2], 0)]
        return jnp.where((c[:, 0] >= 0)[:, None], f, 0.0)
    return keys, jax.vmap(one)(keys, dense), shape


def _occ_keys(host_plans, level, keys_prev, shape_prev, cap, dense_index):
    """Active-key list for a dense level (train-time aux needs rows)."""
    if host_plans is not None:
        out_shape = sp.out_shape_stride2(shape_prev)
        return jax.vmap(lambda c: sp.coords_to_keys(c, out_shape)
                        )(host_plans[f"coords{level}"])
    ds = sp.downsample_keys_dense if dense_index else sp.downsample_keys
    return jax.vmap(lambda k: ds(k, shape_prev, cap))(keys_prev)


def densify_bev(keys: jnp.ndarray, feats: jnp.ndarray,
                shape: Tuple[int, int, int]) -> jnp.ndarray:
    """[B,M] keys + [B,M,C] feats -> [B, H, W, D*C] BEV canvas.

    The reference reshapes [N,C,D,H,W] -> [N, C*D, H, W] (cmn.py:112-114);
    channel order differs here (d-major) which is equivalent for a model
    trained from scratch.
    """
    dense = jax.vmap(lambda k, f: sp.to_dense(k, f, shape))(keys, feats)
    b, d, h, w, c = dense.shape
    return jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
