"""Dense BEV convolution trunk.

Equivalent of BEVNet (/root/reference/mmdet/models/necks/cmn.py:233-282):
7 x [3x3 conv(256) + BN + ReLU] followed by a 1x1 conv + BN + ReLU; returns
both the final map (SSD head input) and the pre-1x1 `conv6` map (PSWarp
input). NHWC layout — the dense hot path, left to XLA to tile onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L

N_CONV = 7


def bevnet_init(key, in_features: int, num_filters: int = 256):
    ks = jax.random.split(key, N_CONV + 1)
    params, state = {}, {}
    cin = in_features
    for i in range(N_CONV):
        params[f"conv{i}"] = L.conv2d_init(ks[i], 3, cin, num_filters)
        params[f"bn{i}"], state[f"bn{i}"] = L.bn_init(num_filters)
        cin = num_filters
    params["conv7"] = L.conv2d_init(ks[N_CONV], 1, cin, num_filters)
    params["bn7"], state["bn7"] = L.bn_init(num_filters)
    return params, state


def bevnet_apply(params, state, x, *, train: bool, compute_dtype=jnp.float32):
    """[B, H, W, Cin] -> (final [B,H,W,F], conv6 [B,H,W,F], new_state)."""
    new_state = {}
    for i in range(N_CONV):
        x = L.conv2d(params[f"conv{i}"], x, compute_dtype=compute_dtype)
        x, new_state[f"bn{i}"] = L.batch_norm(
            params[f"bn{i}"], state[f"bn{i}"], x, train=train)
        x = L.relu(x)
    conv6 = x
    x = L.conv2d(params["conv7"], x, compute_dtype=compute_dtype)
    x, new_state["bn7"] = L.batch_norm(
        params["bn7"], state["bn7"], x, train=train)
    x = L.relu(x)
    return x, conv6, new_state
