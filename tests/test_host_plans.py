"""C++ host rulebook parity vs the on-device sparse-conv path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sassd_tpu.models import backbone
from sassd_tpu.ops import native
from sassd_tpu.ops import sparse as sp
from tiny_config import tiny_config

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def make_inputs(seed=0):
    cfg = tiny_config()
    rng = np.random.default_rng(seed)
    # random active voxels in the tiny grid
    d, h, w = cfg.sparse_shape
    n = 40
    lin = np.sort(rng.choice(d * h * w, n, replace=False))
    cap = cfg.voxel.max_voxels
    coords = np.full((cap, 3), -1, np.int32)
    coords[:n, 0] = lin // (h * w)
    coords[:n, 1] = (lin // w) % h
    coords[:n, 2] = lin % w
    return cfg, coords, n


def test_plans_match_device_active_sets():
    cfg, coords, n = make_inputs()
    plans = native.build_plans_cpp(coords, cfg.sparse_shape,
                                   cfg.caps.level_caps)
    keys0 = sp.coords_to_keys(jnp.asarray(coords), cfg.sparse_shape)
    # level-1 active set must equal the device computation (as a set)
    dev_keys1 = np.asarray(sp.downsample_keys(
        keys0, cfg.sparse_shape, cfg.caps.level_caps[1]))
    shape1 = sp.out_shape_stride2(cfg.sparse_shape)
    cpp_keys1 = np.asarray(sp.coords_to_keys(
        jnp.asarray(plans["coords1"]), shape1))
    assert (set(dev_keys1[dev_keys1 != sp.INVALID_KEY].tolist())
            == set(cpp_keys1[cpp_keys1 != sp.INVALID_KEY].tolist()))


def test_subm_plan_matches_device():
    cfg, coords, n = make_inputs(1)
    plans = native.build_plans_cpp(coords, cfg.sparse_shape,
                                   cfg.caps.level_caps)
    keys0 = sp.coords_to_keys(jnp.asarray(coords), cfg.sparse_shape)
    dev = sp.build_subm_plan(keys0, cfg.sparse_shape)
    # same rows (level-0 order is identical: input scan order)
    got_idx = plans["subm0"]
    got_found = got_idx >= 0
    np.testing.assert_array_equal(np.asarray(dev.found)[:, :n],
                                  got_found[:, :n])
    di = np.asarray(dev.idx)
    for k in range(27):
        f = got_found[k, :n]
        np.testing.assert_array_equal(di[k, :n][f], got_idx[k, :n][f])


def test_vxnet_host_plans_match_device_path():
    """Full ladder: host-plan outputs == device-path outputs as key->feature
    maps (row order differs between the two active-set computations)."""
    cfg, coords, n = make_inputs(2)
    rng = np.random.default_rng(3)
    params, state = backbone.vxnet_init(jax.random.PRNGKey(0), 4)
    feats = rng.normal(size=(1, coords.shape[0], 4)).astype(np.float32)
    feats[0, n:] = 0
    keys0 = sp.coords_to_keys(jnp.asarray(coords), cfg.sparse_shape)[None]

    out_dev = backbone.vxnet_apply(
        params, state, keys0, jnp.asarray(feats),
        sparse_shape=cfg.sparse_shape, level_caps=cfg.caps.level_caps,
        train=False, dense_index=True, dense_tail=False)

    plans = native.build_plans_cpp(coords, cfg.sparse_shape,
                                   cfg.caps.level_caps)
    host_plans = {k: jnp.asarray(v[None]) for k, v in plans.items()
                  if k != "n_active"}
    out_host = backbone.vxnet_apply(
        params, state, keys0, jnp.asarray(feats),
        sparse_shape=cfg.sparse_shape, level_caps=cfg.caps.level_caps,
        train=False, host_plans=host_plans, dense_tail=False)

    def as_map(keys, feats):
        keys = np.asarray(keys)[0]
        feats = np.asarray(feats)[0]
        return {int(k): feats[i] for i, k in enumerate(keys)
                if k != sp.INVALID_KEY}

    m_dev = as_map(out_dev[0], out_dev[1])
    m_host = as_map(out_host[0], out_host[1])
    assert m_dev.keys() == m_host.keys()
    for k in m_dev:
        np.testing.assert_allclose(m_dev[k], m_host[k], atol=2e-4)


def test_dense_tail_matches_sparse_path():
    """Masked-dense levels 2-3 must reproduce the sparse path exactly."""
    cfg, coords, n = make_inputs(5)
    rng = np.random.default_rng(7)
    params, state = backbone.vxnet_init(jax.random.PRNGKey(1), 4)
    feats = rng.normal(size=(1, coords.shape[0], 4)).astype(np.float32)
    feats[0, n:] = 0
    keys0 = sp.coords_to_keys(jnp.asarray(coords), cfg.sparse_shape)[None]

    def run(dense_tail, train):
        return backbone.vxnet_apply(
            params, state, keys0, jnp.asarray(feats),
            sparse_shape=cfg.sparse_shape, level_caps=cfg.caps.level_caps,
            train=train, dense_index=True, dense_tail=dense_tail)

    ks, fs, shape3, mids_s, _ = run(False, True)
    kd, fd, shape3d, mids_d, _ = run(True, True)
    assert kd is None and shape3 == shape3d
    # sparse output densified == dense-tail output
    dense_from_sparse = np.asarray(
        jax.vmap(lambda k, f: sp.to_dense(k, f, shape3))(ks, fs))
    np.testing.assert_allclose(np.asarray(fd), dense_from_sparse, atol=3e-4)
    # middles (aux branch inputs) match as key->feature maps
    for (mk_s, mf_s, msh_s), (mk_d, mf_d, msh_d) in zip(mids_s[1:], mids_d[1:]):
        assert msh_s == msh_d
        m_s = {int(k): np.asarray(mf_s)[0][i]
               for i, k in enumerate(np.asarray(mk_s)[0])
               if k != sp.INVALID_KEY}
        m_d = {int(k): np.asarray(mf_d)[0][i]
               for i, k in enumerate(np.asarray(mk_d)[0])
               if k != sp.INVALID_KEY}
        assert m_s.keys() == m_d.keys()
        for k in m_s:
            np.testing.assert_allclose(m_s[k], m_d[k], atol=3e-4)


def test_stride_hostT_grad_matches_autodiff():
    """Transpose-plan backward == autodiff of the plain gather stride conv."""
    import jax
    cfg, coords, n = make_inputs(9)
    plans = native.build_plans_cpp(coords, cfg.sparse_shape,
                                   cfg.caps.level_caps)
    rng = np.random.default_rng(4)
    cin, cout = 8, 6
    feats = jnp.asarray(rng.normal(size=(coords.shape[0], cin))
                        .astype(np.float32))
    # zero padded rows
    feats = feats * (jnp.asarray(coords[:, 0]) >= 0)[:, None]
    weight = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
    idx = jnp.maximum(jnp.asarray(plans["stride1"]), 0)
    found = jnp.asarray(plans["stride1"]) >= 0
    idxT = jnp.maximum(jnp.asarray(plans["strideT1"]), 0)
    foundT = jnp.asarray(plans["strideT1"]) >= 0
    cot = jnp.asarray(rng.normal(size=(idx.shape[1], cout)).astype(np.float32))
    cot = cot * (jnp.asarray(plans["coords1"][:, 0]) >= 0)[:, None]

    def f_raw(f, w):
        return jnp.vdot(sp.subm_conv(f, w, sp.SubmPlan(idx, found),
                                     symmetric=False), cot)

    gf_r, gw_r = jax.grad(f_raw, argnums=(0, 1))(feats, weight)
    for triple in (False, True):
        for store_col in (False, True):
            def f_custom(f, w):
                return jnp.vdot(sp.stride_conv_hostT(
                    jnp.float32, triple, store_col, f, w,
                    idx, found, idxT, foundT), cot)

            tag = f"triple={triple} store={store_col}"
            gf_c, gw_c = jax.grad(f_custom, argnums=(0, 1))(feats, weight)
            np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r),
                                       rtol=1e-4, atol=1e-4, err_msg=tag)
            np.testing.assert_allclose(np.asarray(gf_c), np.asarray(gf_r),
                                       rtol=1e-4, atol=1e-4, err_msg=tag)


def test_triple_gather_matches_standard():
    """Packed x-run gather == plain 27-row gather on key-sorted host plans."""
    cfg, coords, n = make_inputs(11)
    plans = native.build_plans_cpp(coords, cfg.sparse_shape,
                                   cfg.caps.level_caps)
    rng = np.random.default_rng(12)

    def feats_for(cap):
        return jnp.asarray(rng.normal(size=(cap, 5)).astype(np.float32))

    def as_plan(arr):
        return sp.SubmPlan(jnp.maximum(jnp.asarray(arr), 0),
                           jnp.asarray(arr) >= 0)

    f0 = feats_for(coords.shape[0])
    f1 = feats_for(plans["coords1"].shape[0])
    f2 = feats_for(plans["coords2"].shape[0])
    cases = [("subm0", f0), ("subm1", f1), ("subm2", f2),
             ("stride1", f0), ("stride2", f1)]
    for name, feats in cases:
        plan = as_plan(plans[name])
        a = np.asarray(sp.gather_im2col(feats, plan))
        b = np.asarray(sp.gather_im2col_triple(feats, plan))
        np.testing.assert_allclose(b, a, atol=0, err_msg=name)
    for name, feats in [("strideT1", f1), ("strideT2", f2)]:
        plan = as_plan(plans[name])
        a = np.asarray(sp.gather_im2col(feats, plan))
        b = np.asarray(sp.gather_im2col_strideT3(feats, plan))
        np.testing.assert_allclose(b, a, atol=0, err_msg=name)


def test_subm_sym_triple_grad_matches_autodiff():
    """Symmetric custom VJP with triple gather == autodiff on host subm plan."""
    import jax
    cfg, coords, n = make_inputs(13)
    plans = native.build_plans_cpp(coords, cfg.sparse_shape,
                                   cfg.caps.level_caps)
    rng = np.random.default_rng(14)
    feats = jnp.asarray(rng.normal(size=(coords.shape[0], 6))
                        .astype(np.float32))
    feats = feats * (jnp.asarray(coords[:, 0]) >= 0)[:, None]
    weight = jnp.asarray(rng.normal(size=(27, 6, 5)).astype(np.float32))
    idx = jnp.maximum(jnp.asarray(plans["subm0"]), 0)
    found = jnp.asarray(plans["subm0"]) >= 0
    cot = jnp.asarray(rng.normal(size=(coords.shape[0], 5)).astype(np.float32))
    cot = cot * (jnp.asarray(coords[:, 0]) >= 0)[:, None]

    def f_ref(f, w):
        return jnp.vdot(sp._subm_conv_raw(f, w, sp.SubmPlan(idx, found),
                                          jnp.float32), cot)

    gf_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(feats, weight)
    for triple in (False, True):
        def f_c(f, w):
            return jnp.vdot(sp.subm_conv(f, w, sp.SubmPlan(idx, found),
                                         triple=triple), cot)

        gf, gw = jax.grad(f_c, argnums=(0, 1))(feats, weight)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r),
                                   rtol=1e-4, atol=1e-4, err_msg=f"{triple}")
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                                   rtol=1e-4, atol=1e-4, err_msg=f"{triple}")


def test_inference_mode_skips_train_plans():
    """train=False must drop aux/strideT and leave every other plan
    byte-identical (the inference-serving fast path)."""
    cfg, coords, n = make_inputs(seed=3)
    full = native.build_plans_cpp(coords, cfg.sparse_shape,
                                  cfg.caps.level_caps, train=True)
    infer = native.build_plans_cpp(coords, cfg.sparse_shape,
                                   cfg.caps.level_caps, train=False)
    assert not any(k.startswith(("aux", "strideT")) for k in infer)
    for k in infer:
        np.testing.assert_array_equal(infer[k], full[k], err_msg=k)
    for l in range(1, 4):
        assert f"aux{l}" in full and f"strideT{l}" in full
