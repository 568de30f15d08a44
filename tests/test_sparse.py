"""Sparse conv engine tests against dense XLA convolution oracles."""
import numpy as np
import jax
import jax.numpy as jnp

from sassd_tpu.ops import sparse as S


def random_level(rng, shape, n_active, cin, cap=None):
    d, h, w = shape
    cap = cap or n_active
    lin = rng.choice(d * h * w, size=n_active, replace=False)
    keys = np.sort(lin).astype(np.int32)
    feats = rng.normal(size=(n_active, cin)).astype(np.float32)
    if cap > n_active:
        keys = np.concatenate([keys, np.full(cap - n_active, S.INVALID_KEY)])
        feats = np.concatenate([feats, np.zeros((cap - n_active, cin), np.float32)])
    return jnp.asarray(keys.astype(np.int32)), jnp.asarray(feats)


def dense_conv(keys, feats, weight, shape, stride):
    """Oracle: densify, run lax.conv (pad=1, given stride), return dense out."""
    x = S.to_dense(keys, feats, shape)[None]                  # [1,D,H,W,C]
    k = weight.shape[0]
    ks = round(k ** (1 / 3))
    w = weight.reshape(ks, ks, ks, weight.shape[1], weight.shape[2])
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3, padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]


def test_keys_coords_roundtrip():
    shape = (6, 10, 14)
    rng = np.random.default_rng(0)
    keys, _ = random_level(rng, shape, 50, 1)
    coords = S.keys_to_coords(keys, shape)
    back = S.coords_to_keys(coords, shape)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(keys))


def test_lookup():
    keys = jnp.asarray(np.array([3, 7, 11, 20, S.INVALID_KEY], np.int32))
    idx, found = S.lookup(keys, jnp.asarray(np.array([7, 8, 3, 20, 99], np.int32)))
    np.testing.assert_array_equal(np.asarray(found), [True, False, True, True, False])
    assert np.asarray(idx)[0] == 1 and np.asarray(idx)[2] == 0


def test_subm_conv_matches_dense():
    rng = np.random.default_rng(1)
    shape = (5, 12, 16)
    keys, feats = random_level(rng, shape, 120, 8, cap=160)
    weight = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32))
    plan = S.build_subm_plan(keys, shape)
    out = np.asarray(S.subm_conv(feats, weight, plan))
    dense = np.asarray(dense_conv(keys, feats, weight, shape, 1))
    coords = np.asarray(S.keys_to_coords(keys, shape))
    for i in range(120):
        z, y, x = coords[i]
        np.testing.assert_allclose(out[i], dense[z, y, x], atol=1e-4)


def test_downsample_keys_match_dense_active_set():
    rng = np.random.default_rng(2)
    shape = (6, 12, 16)
    keys, feats = random_level(rng, shape, 100, 4, cap=128)
    out_keys = np.asarray(S.downsample_keys(keys, shape, 512))
    # oracle: occupancy conv with all-ones kernel, stride 2
    occ = jnp.ones((100, 1))
    occ = jnp.concatenate([occ, jnp.zeros((28, 1))])
    ones_w = jnp.ones((27, 1, 1))
    dense = np.asarray(dense_conv(keys, occ, ones_w, shape, 2))[..., 0]
    active = np.stack(np.nonzero(dense > 0), -1)              # [Mo, 3] zyx
    osh = S.out_shape_stride2(shape)
    expect = np.sort((active[:, 0] * osh[1] + active[:, 1]) * osh[2] + active[:, 2])
    got = out_keys[out_keys != S.INVALID_KEY]
    np.testing.assert_array_equal(got, expect)


def test_stride_conv_matches_dense():
    rng = np.random.default_rng(3)
    shape = (6, 12, 16)
    keys, feats = random_level(rng, shape, 100, 8, cap=128)
    weight = jnp.asarray(rng.normal(size=(27, 8, 10)).astype(np.float32))
    out_keys, out_feats, out_sh = S.stride_conv(keys, feats, weight, shape, 256)
    dense = np.asarray(dense_conv(keys, feats, weight, shape, 2))
    coords = np.asarray(S.keys_to_coords(out_keys, out_sh))
    n = int(np.sum(np.asarray(out_keys) != S.INVALID_KEY))
    for i in range(n):
        z, y, x = coords[i]
        np.testing.assert_allclose(np.asarray(out_feats)[i], dense[z, y, x],
                                   atol=1e-4)


def test_stride_conv_cap_overflow_drops():
    """With a cap smaller than the true active set, outputs are dropped but
    the op still runs with static shapes (documented overflow behavior)."""
    rng = np.random.default_rng(4)
    shape = (6, 12, 16)
    keys, feats = random_level(rng, shape, 100, 4, cap=128)
    out_keys = np.asarray(S.downsample_keys(keys, shape, 16))
    assert np.all(out_keys[:16] != S.INVALID_KEY) or len(out_keys) == 16


def test_to_dense_roundtrip():
    rng = np.random.default_rng(5)
    shape = (4, 8, 8)
    keys, feats = random_level(rng, shape, 30, 5, cap=40)
    dense = np.asarray(S.to_dense(keys, feats, shape))
    coords = np.asarray(S.keys_to_coords(keys, shape))
    for i in range(30):
        z, y, x = coords[i]
        np.testing.assert_allclose(dense[z, y, x], np.asarray(feats)[i])
    assert np.count_nonzero(np.abs(dense).sum(-1)) == 30


def test_conv1x1():
    rng = np.random.default_rng(6)
    feats = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(S.conv1x1(feats, w)),
                               np.asarray(feats) @ np.asarray(w), rtol=1e-4,
                               atol=1e-4)


def test_vmap_batch():
    """The whole engine vmaps over a batch dimension."""
    rng = np.random.default_rng(7)
    shape = (5, 10, 12)
    ks, fs = [], []
    for b in range(3):
        k, f = random_level(rng, shape, 60 + b * 10, 8, cap=96)
        ks.append(k)
        fs.append(f)
    keys = jnp.stack(ks)
    feats = jnp.stack(fs)
    weight = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32))

    def one(k, f):
        plan = S.build_subm_plan(k, shape)
        return S.subm_conv(f, weight, plan)

    batched = jax.vmap(one)(keys, feats)
    for b in range(3):
        np.testing.assert_allclose(np.asarray(batched[b]),
                                   np.asarray(one(keys[b], feats[b])), atol=1e-5)


def test_subm_conv_custom_vjp_matches_autodiff():
    """The mirrored-plan backward must equal autodiff of the raw gather."""
    rng = np.random.default_rng(9)
    shape = (5, 12, 16)
    keys, feats = random_level(rng, shape, 120, 8, cap=160)
    weight = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32))
    plan = S.build_subm_plan(keys, shape)
    cot = jnp.asarray(rng.normal(size=(160, 6)).astype(np.float32))
    # zero the cotangent at padded rows (as real losses do via masks)
    cot = cot * (np.asarray(keys) != S.INVALID_KEY)[:, None]

    def f_sym(f, w):
        return jnp.vdot(S.subm_conv(f, w, plan, symmetric=True), cot)

    def f_raw(f, w):
        return jnp.vdot(S.subm_conv(f, w, plan, symmetric=False), cot)

    gf_s, gw_s = jax.grad(f_sym, argnums=(0, 1))(feats, weight)
    gf_r, gw_r = jax.grad(f_raw, argnums=(0, 1))(feats, weight)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_s), np.asarray(gf_r),
                               rtol=1e-4, atol=1e-4)


def test_subm_conv_store_col_grads_identical():
    """store_col=True (im2col kept as a VJP residual) must be numerically
    identical to the recompute-gather backward — same ops, same order."""
    rng = np.random.default_rng(13)
    shape = (5, 12, 16)
    keys, feats = random_level(rng, shape, 120, 8, cap=160)
    weight = jnp.asarray(rng.normal(size=(27, 8, 6)).astype(np.float32))
    plan = S.build_subm_plan(keys, shape)
    cot = jnp.asarray(rng.normal(size=(160, 6)).astype(np.float32))
    cot = cot * (np.asarray(keys) != S.INVALID_KEY)[:, None]

    def make(store):
        def f(f_, w_):
            return jnp.vdot(
                S.subm_conv(f_, w_, plan, store_col=store), cot)
        return f

    out_a = S.subm_conv(feats, weight, plan, store_col=False)
    out_b = S.subm_conv(feats, weight, plan, store_col=True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a), atol=0)
    gf_a, gw_a = jax.grad(make(False), argnums=(0, 1))(feats, weight)
    gf_b, gw_b = jax.grad(make(True), argnums=(0, 1))(feats, weight)
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_a), atol=0)
    np.testing.assert_allclose(np.asarray(gf_b), np.asarray(gf_a), atol=0)


def test_flat_batch_equals_vmap_subm():
    """subm_conv_batched (one flat gather-GEMM for the whole batch) must
    equal the vmapped per-sample path, forward and gradients."""
    rng = np.random.default_rng(21)
    shape = (5, 12, 16)
    b, cap, cin, cout = 3, 160, 8, 6
    keys, feats, plans = [], [], []
    for i in range(b):
        k, f = random_level(rng, shape, 100 + 10 * i, cin, cap=cap)
        keys.append(k)
        feats.append(f)
        plans.append(S.build_subm_plan(k, shape))
    feats = jnp.stack(feats)
    plan = S.SubmPlan(jnp.stack([p.idx for p in plans]),
                      jnp.stack([p.found for p in plans]))
    weight = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(b, cap, cout)).astype(np.float32))

    def loss_flat(f, w):
        return jnp.vdot(S.subm_conv_batched(f, w, plan), cot)

    def loss_vmap(f, w):
        return jnp.vdot(jax.vmap(
            lambda ff, i, fo: S.subm_conv(ff, w, S.SubmPlan(i, fo)))(
                f, plan.idx, plan.found), cot)

    out_f = S.subm_conv_batched(feats, weight, plan)
    out_v = jax.vmap(lambda ff, i, fo: S.subm_conv(
        ff, weight, S.SubmPlan(i, fo)))(feats, plan.idx, plan.found)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_v),
                               atol=1e-5)
    gf_f, gw_f = jax.grad(loss_flat, argnums=(0, 1))(feats, weight)
    gf_v, gw_v = jax.grad(loss_vmap, argnums=(0, 1))(feats, weight)
    np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_v), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_v), atol=1e-4)


def test_flat_batch_equals_vmap_stride():
    """Flat-batch stride conv (symmetric=False) vs vmapped per-sample."""
    rng = np.random.default_rng(22)
    shape = (6, 12, 16)
    b, cap, out_cap, cin, cout = 2, 128, 256, 4, 5
    keys, feats = [], []
    plan_i, plan_f, out_keys = [], [], []
    for i in range(b):
        k, f = random_level(rng, shape, 90 + 10 * i, cin, cap=cap)
        ok = S.downsample_keys(k, shape, out_cap)
        pl = S.build_stride_plan(k, ok, shape)
        keys.append(k)
        feats.append(f)
        out_keys.append(ok)
        plan_i.append(pl.idx)
        plan_f.append(pl.found)
    feats = jnp.stack(feats)
    plan = S.SubmPlan(jnp.stack(plan_i), jnp.stack(plan_f))
    weight = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))

    out_f = S.subm_conv_batched(feats, weight, plan, symmetric=False)
    out_v = jax.vmap(lambda ff, i, fo: S.subm_conv(
        ff, weight, S.SubmPlan(i, fo), symmetric=False))(
        feats, plan.idx, plan.found)
    assert out_f.shape == (b, out_cap, cout)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_v),
                               atol=1e-5)
