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
    """NHWC 2D conv, SAME padding.

    In reduced precision the conv runs fully in compute_dtype and the output
    is cast back to f32 (instead of preferred_element_type=f32): the MXU
    still accumulates in f32 internally, and a homogeneous-dtype conv keeps
    the autodiff transpose well-typed (an f32 cotangent against bf16 weights
    is rejected by lax.conv_general_dilated).

    NUMERICS NOTE (round-4 change, flagged in ADVICE r4): per-element
    outputs are therefore rounded to bf16 BEFORE the bias add, a one-ulp
    (bf16) change vs the previous preferred_element_type=f32 form. bf16
    configs should expect eval-metric drift at that tolerance; fp32
    configs (the default — bf16 measured speed-neutral, PERF.md round 5)
    are unaffected.
    """
    w = p["w"]
    mixed = compute_dtype is not None and compute_dtype != jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=None if mixed else jnp.float32)
    if mixed:
        y = y.astype(jnp.float32)
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


def conv3d(weight_27: jnp.ndarray, x: jnp.ndarray, stride: int = 1,
           compute_dtype=None):
    """Dense 3D conv (NDHWC, pad 1) sharing the sparse [27,Cin,Cout] weights.

    The sparse engine's kernel-offset order (dz,dy,dx row-major over {-1,0,1},
    ops/sparse.py _offsets) is exactly the DHWIO spatial raveling, so the
    same parameters drive both the gather-GEMM and the dense formulation.

    Implemented as a z-decomposition into three 2D convs (XLA's native 3D
    conv path materializes huge im2col buffers on TPU; the folded
    [B*D, H, W, C] 2D convs ride the standard MXU conv lane).
    """
    k, cin, cout = weight_27.shape
    w = weight_27.reshape(3, 3, 3, cin, cout)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    b, d, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    d_out = (d - 1) // stride + 1
    out = None
    for kz in range(3):
        xs = xp[:, kz::stride][:, :d_out]                 # [B, D_out, H, W, C]
        y = jax.lax.conv_general_dilated(
            xs.reshape(b * d_out, h, wd, c), w[kz],
            window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    ho, wo = out.shape[1], out.shape[2]
    return out.reshape(b, d_out, ho, wo, cout)


def maxpool3d_stride2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 / stride 2 / pad 1 max-pool over NDHWC (bool or float)."""
    was_bool = x.dtype == jnp.bool_
    if was_bool:
        x = x.astype(jnp.float32)
    y = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    return y > 0 if was_bool else y
