"""Minimal functional layer library.

Models in this framework are pure functions over explicit (params, state)
pytrees — no module framework, no mutable collections. `params` holds
trainable leaves; `state` holds BatchNorm running statistics with the same
nesting, so both thread transparently through jit/pjit/vmap and shard as
plain pytrees.

Initializers follow torch defaults (kaiming-uniform with a=sqrt(5), i.e.
bound = 1/sqrt(fan_in)) so that training dynamics match the reference;
BatchNorm uses eps=1e-3, momentum=0.01 as in every BN of the reference
(/root/reference/mmdet/models/necks/cmn.py:141,237).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3
BN_MOMENTUM = 0.01


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def uniform_fan_in(key, shape, fan_in: int, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(key, cin: int, cout: int, bias: bool = True):
    kw, kb = jax.random.split(key)
    p = {"w": uniform_fan_in(kw, (cin, cout), cin)}
    if bias:
        p["b"] = uniform_fan_in(kb, (cout,), cin)
    return p


def conv2d_init(key, ksize: int, cin: int, cout: int, bias: bool = False):
    kw, kb = jax.random.split(key)
    fan_in = cin * ksize * ksize
    p = {"w": uniform_fan_in(kw, (ksize, ksize, cin, cout), fan_in)}
    if bias:
        p["b"] = uniform_fan_in(kb, (cout,), fan_in)
    return p


def sparse_conv3_init(key, cin: int, cout: int, ksize: int = 3):
    """[K, Cin, Cout] weights for the sparse gather-GEMM conv (K = ksize^3)."""
    k = ksize ** 3
    return {"w": uniform_fan_in(key, (k, cin, cout), cin * k)}


def bn_init(c: int):
    params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return params, state


# ---------------------------------------------------------------------------
# apply fns
# ---------------------------------------------------------------------------

def linear(p, x):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


def conv2d(p, x, stride: int = 1, compute_dtype=None):
    """NHWC 2D conv, SAME padding."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


def batch_norm(p, s, x, *, train: bool, mask: Optional[jnp.ndarray] = None,
               eps: float = BN_EPS, momentum: float = BN_MOMENTUM
               ) -> Tuple[jnp.ndarray, dict]:
    """BatchNorm over all axes but the last; optional row validity mask.

    With `mask` (bool, broadcastable to x.shape[:-1]) the batch statistics are
    computed over valid rows only — this is what makes padded sparse-voxel
    slots invisible to normalization, which spconv gets for free by packing
    actives densely.

    Torch parity: normalize with biased batch variance, update running var
    with the unbiased estimate, running = (1-m)*running + m*batch.
    """
    x32 = x.astype(jnp.float32)
    if train:
        if mask is not None:
            m = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x32 * m, axis=tuple(range(x.ndim - 1))) / n
            diff = (x32 - mean) * m
            var = jnp.sum(diff * diff, axis=tuple(range(x.ndim - 1))) / n
        else:
            n = jnp.float32(np.prod(x.shape[:-1]))
            mean = jnp.mean(x32, axis=tuple(range(x.ndim - 1)))
            var = jnp.var(x32, axis=tuple(range(x.ndim - 1)))
        unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + eps)
    y = (x32 - mean) * (inv * p["scale"]) + p["bias"]
    return y.astype(x.dtype), new_s


def relu(x):
    return jnp.maximum(x, 0.0)
