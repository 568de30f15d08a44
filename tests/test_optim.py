"""Optimizer recipe tests: weight-decay masking + schedules.

The reference's fastai optimizer stack groups BatchNorm parameters and
biases away from true weight decay (`split_bn_bias`,
/root/reference/tools/train_utils/optimization/fastai_optim.py:13-24,
applied in the true_wd step :135-145); sassd_tpu reproduces that grouping
with an optax mask keyed on the parameter-tree leaf names
(train/optim.py::weight_decay_mask).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sassd_tpu.config import TrainConfig, tiny_config
from sassd_tpu.models import detector
from sassd_tpu.train import optim as optim_lib


def _flatten_with_path(tree):
    return jax.tree_util.tree_flatten_with_path(tree)[0]


def test_weight_decay_mask_excludes_bn_and_bias():
    """Every BN scale/bias and every linear/conv bias is excluded from
    decay; every kernel ('w') is included — checked over the REAL detector
    parameter tree, not a toy."""
    cfg = tiny_config()
    params, _ = detector.detector_init(jax.random.PRNGKey(0), cfg)
    mask = optim_lib.weight_decay_mask(params)
    n_decay = n_skip = 0
    for path, decayed in _flatten_with_path(mask):
        leaf_key = path[-1].key
        if leaf_key == "w":
            assert decayed, f"kernel not decayed: {path}"
            n_decay += 1
        else:
            assert leaf_key in ("b", "scale", "bias"), path
            assert not decayed, f"non-kernel decayed: {path}"
            n_skip += 1
    assert n_decay > 10 and n_skip > 10   # both groups are non-trivial


def test_adamw_mask_applies_zero_decay():
    """With zero gradients, one AdamW step changes ONLY decayed leaves:
    masked leaves (BN scale/bias, biases) must come back bit-identical."""
    cfg = TrainConfig(lr=0.1, weight_decay=0.5,
                      weight_decay_mode="exclude_bn_bias")
    params = {
        "conv": {"w": jnp.ones((3, 3)), "b": jnp.ones((3,))},
        "bn": {"scale": jnp.ones((3,)), "bias": jnp.full((3,), 0.7)},
    }
    tx = optim_lib.make_optimizer(cfg, total_steps=10, kind="adam")
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    # decayed kernel moved; masked leaves untouched
    assert float(jnp.max(jnp.abs(new["conv"]["w"] - 1.0))) > 1e-4
    np.testing.assert_array_equal(np.asarray(new["conv"]["b"]),
                                  np.asarray(params["conv"]["b"]))
    np.testing.assert_array_equal(np.asarray(new["bn"]["scale"]),
                                  np.asarray(params["bn"]["scale"]))
    np.testing.assert_array_equal(np.asarray(new["bn"]["bias"]),
                                  np.asarray(params["bn"]["bias"]))


def test_weight_decay_mode_all_decays_everything():
    cfg = TrainConfig(lr=0.1, weight_decay=0.5, weight_decay_mode="all")
    params = {"conv": {"w": jnp.ones((3, 3)), "b": jnp.ones((3,))}}
    tx = optim_lib.make_optimizer(cfg, total_steps=10, kind="adam")
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert float(jnp.max(jnp.abs(new["conv"]["b"] - 1.0))) > 1e-4


def test_cosine_warmup_schedule():
    """CosineWarmupLR semantics (learning_schedules_fastai.py:84-87):
    eta_min at t=0, half-cosine rise, base lr from warmup_iters on."""
    sched = optim_lib.cosine_warmup(
        base_lr=1.0, warmup_iters=100, warmup_ratio=0.1,
        after_schedule=lambda c: jnp.asarray(1.0))
    t = np.asarray([sched(c) for c in [0, 50, 100, 200]], np.float64)
    ref = [0.1 + 0.9 * (1 - np.cos(np.pi * c / 100)) / 2 for c in (0, 50)]
    np.testing.assert_allclose(t[:2], ref, rtol=1e-6)
    np.testing.assert_allclose(t[2:], 1.0, rtol=1e-6)
    # monotone non-decreasing through warmup
    fine = np.asarray([sched(c) for c in range(0, 101, 5)])
    assert np.all(np.diff(fine) >= -1e-7)


def test_adam_cosine_kind_builds_and_steps():
    cfg = TrainConfig(lr=0.01, warmup_iters=5, warmup_ratio=0.1)
    tx = optim_lib.make_optimizer(cfg, total_steps=20, kind="adam_cosine")
    params = {"lin": {"w": jnp.ones((2, 2))}}
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):
        upd, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    lr, _ = optim_lib.current_hyperparams(state)
    assert 0.0 < lr <= 0.01


def test_current_hyperparams_onecycle():
    """The logging helper reads the injected hyperparams through the chain
    indexing in ONE place (ADVICE r3: loop.py used to duplicate it)."""
    cfg = TrainConfig(lr=0.003)
    tx = optim_lib.make_optimizer(cfg, total_steps=100)
    params = {"lin": {"w": jnp.ones((2, 2))}}
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    _, state = tx.update(g, state, params)
    lr, mom = optim_lib.current_hyperparams(state)
    assert abs(lr - 0.003 / 10.0) < 1e-5      # step 0 = lr_max/div_factor
    assert abs(mom - 0.95) < 1e-3
