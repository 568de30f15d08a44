"""Convert a reference SA-SSD torch checkpoint into a sassd_tpu checkpoint.

Usage:
    python tools/import_reference_checkpoint.py ref.pth configs/car.py out.msgpack

Reads a torch ``.pth`` file holding the reference model's ``state_dict``
(either raw or under a ``state_dict`` key, with or without DDP ``module.``
prefixes) and emits a msgpack checkpoint loadable by ``tools/test.py`` and
``tools/train.py --load_from``.

Name/axis mapping (reference module tree -> sassd_tpu param tree):

  * ``neck.backbone.*`` (VxNet, /root/reference/mmdet/models/necks/cmn.py:194-228)
    -> ``params["vxnet"]``. spconv v1.0 stores conv weights
    ``[kz, ky, kx, Cin, Cout]``; flattened row-major that is exactly this
    repo's ``[K=27, Cin, Cout]`` tap order ((dz, dy, dx) row-major over
    {-1,0,1}, ops/sparse.py::_offsets). Sequential indices inside each
    block: convs at 0/3/6, BNs at 1/4/7 (conv,BN,ReLU repeats,
    cmn.py:138-174).
  * ``neck.fcn.*`` (BEVNet, cmn.py:233-262) -> ``params["bevnet"]``;
    torch Conv2d ``[Cout, Cin, kh, kw]`` -> ``[kh, kw, Cin, Cout]``.
  * ``neck.point_fc/point_cls/point_reg`` (cmn.py:27-29) ->
    ``params["aux"]``; torch Linear ``[out, in]`` -> ``[in, out]``.
  * ``bbox_head.conv_{cls,box,dir_cls}`` (ssd_rotate_head.py:120-125) ->
    ``params["head"]["conv_{cls,box,dir}"]``.
  * ``extra_head.convs.{0,1,3}`` (PSWarpHead, ssd_rotate_head.py:424-429)
    -> ``params["pswarp"]``.
  * BatchNorm: ``weight/bias`` -> params ``scale/bias``;
    ``running_mean/running_var`` -> state ``mean/var``;
    ``num_batches_tracked`` dropped.

Multi-class checkpoints convert with the SAME head mapping as num_class=1.
Working the reference's ``view(N, num_class, -1, H, W)`` + permute algebra
(ssd_rotate_head.py:218-235) through ``create_loss``'s
``view(batch, -1, d)`` regrouping shows its conv channel layout is
``[class][anchor(2)][d]`` per location and its prediction-row order is
``(class, y, x, anchor)`` — exactly this repo's ``_flatten`` layout — so
the plain ``[Co,Ci,1,1] -> [1,1,Ci,Co]`` transpose is the whole mapping.
(Round 2 documented this as non-factorizing; that was a misreading, now
refuted by executing the reference head itself:
tests/test_reference_oracle.py::test_multiclass_head_layout_oracle.) The
PSWarp head is class-agnostic in the reference's multi config too
(configs/multi_cfg.py:26-33, num_class=1), so it is unchanged.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _spconv_w(t: np.ndarray) -> np.ndarray:
    """[kz,ky,kx,Ci,Co] -> [K,Ci,Co] (row-major tap order matches ours)."""
    if t.ndim != 5:
        raise ValueError(f"expected 5D spconv weight, got {t.shape}")
    return np.ascontiguousarray(t.reshape(-1, t.shape[3], t.shape[4]))


def _conv2d_w(t: np.ndarray) -> np.ndarray:
    """torch [Co,Ci,kh,kw] -> [kh,kw,Ci,Co]."""
    if t.ndim != 4:
        raise ValueError(f"expected 4D conv weight, got {t.shape}")
    return np.ascontiguousarray(t.transpose(2, 3, 1, 0))


def _linear_w(t: np.ndarray) -> np.ndarray:
    """torch [out,in] -> [in,out]."""
    return np.ascontiguousarray(t.T)


def _vxnet_entries():
    """(ref_prefix, seq_idx_per_conv, our_block) for every VxNet block."""
    return [
        ("neck.backbone.conv0", (0, 3), "conv0"),
        ("neck.backbone.down0", (0,), "down0"),
        ("neck.backbone.conv1", (0, 3), "conv1"),
        ("neck.backbone.down1", (0,), "down1"),
        ("neck.backbone.conv2", (0, 3, 6), "conv2"),
        ("neck.backbone.down2", (0,), "down2"),
        ("neck.backbone.conv3", (0, 3, 6), "conv3"),
    ]


def convert(sd: dict) -> tuple[dict, dict, list]:
    """Torch state_dict (name -> np.ndarray) -> (params, state, unused)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    used = set()

    def take(name):
        if name not in sd:
            raise KeyError(f"reference checkpoint is missing '{name}'")
        used.add(name)
        return np.asarray(sd[name], dtype=np.float32)

    def bn(prefix):
        p = {"scale": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}
        s = {"mean": take(f"{prefix}.running_mean"),
             "var": take(f"{prefix}.running_var")}
        if f"{prefix}.num_batches_tracked" in sd:
            used.add(f"{prefix}.num_batches_tracked")
        return p, s

    params, state = {}, {}

    # ---- VxNet sparse ladder -------------------------------------------
    vx_p, vx_s = {}, {}
    for ref, idxs, ours in _vxnet_entries():
        bp, bs = {}, {}
        for i, j in enumerate(idxs):
            bp[f"conv{i}"] = {"w": _spconv_w(take(f"{ref}.{j}.weight"))}
            bp[f"bn{i}"], bs[f"bn{i}"] = bn(f"{ref}.{j + 1}")
        vx_p[ours], vx_s[ours] = bp, bs
    w = take("neck.backbone.extra_conv.0.weight")  # [1,1,1,64,64]
    vx_p["extra"] = {"conv0": {"w": np.ascontiguousarray(w.reshape(w.shape[3], w.shape[4]))}}
    vx_p["extra"]["bn0"], ebs = bn("neck.backbone.extra_conv.1")
    vx_s["extra"] = {"bn0": ebs}
    params["vxnet"], state["vxnet"] = vx_p, vx_s

    # ---- BEVNet dense trunk --------------------------------------------
    bev_p, bev_s = {}, {}
    for i in range(8):
        bev_p[f"conv{i}"] = {"w": _conv2d_w(take(f"neck.fcn.conv{i}.weight"))}
        bev_p[f"bn{i}"], bev_s[f"bn{i}"] = bn(f"neck.fcn.bn{i}")
    params["bevnet"], state["bevnet"] = bev_p, bev_s

    # ---- SSD rotate head -----------------------------------------------
    params["head"] = {
        "conv_cls": {"w": _conv2d_w(take("bbox_head.conv_cls.weight")),
                     "b": take("bbox_head.conv_cls.bias")},
        "conv_box": {"w": _conv2d_w(take("bbox_head.conv_box.weight")),
                     "b": take("bbox_head.conv_box.bias")},
        "conv_dir": {"w": _conv2d_w(take("bbox_head.conv_dir_cls.weight")),
                     "b": take("bbox_head.conv_dir_cls.bias")},
    }

    # ---- PSWarp head ----------------------------------------------------
    psw = {"conv0": {"w": _conv2d_w(take("extra_head.convs.0.weight"))},
           "conv1": {"w": _conv2d_w(take("extra_head.convs.3.weight"))}}
    psw["bn0"], psw_bn_s = bn("extra_head.convs.1")
    params["pswarp"], state["pswarp"] = psw, {"bn0": psw_bn_s}

    # ---- aux point branch ----------------------------------------------
    params["aux"] = {
        "point_fc": {"w": _linear_w(take("neck.point_fc.weight"))},
        "point_cls": {"w": _linear_w(take("neck.point_cls.weight"))},
        "point_reg": {"w": _linear_w(take("neck.point_reg.weight"))},
    }

    unused = sorted(set(sd) - used)
    return params, state, unused


def check_against_config(params, state, cfg):
    """Validate the converted tree leaf-by-leaf against detector_init(cfg)."""
    import jax
    from sassd_tpu.models import detector

    ref_p, ref_s = detector.detector_init(jax.random.PRNGKey(0), cfg)
    for name, ours, init in (("params", params, ref_p),
                             ("state", state, ref_s)):
        flat_a = jax.tree_util.tree_flatten_with_path(ours)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(init)[0])
        if len(flat_a) != len(flat_b):
            a = {jax.tree_util.keystr(k) for k, _ in flat_a}
            b = {jax.tree_util.keystr(k) for k in flat_b}
            raise SystemExit(f"{name} tree mismatch: only-in-import="
                             f"{sorted(a - b)} only-in-init={sorted(b - a)}")
        for path, leaf in flat_a:
            want = flat_b[path].shape
            if tuple(leaf.shape) != tuple(want):
                raise SystemExit(
                    f"{name}{jax.tree_util.keystr(path)}: imported shape "
                    f"{leaf.shape} != model shape {want}")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("torch_checkpoint", help=".pth file (state_dict)")
    ap.add_argument("config", help="sassd_tpu config file (shape check)")
    ap.add_argument("out", help="output .msgpack checkpoint path")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")   # host-side tool; never
    # touch an accelerator (the axon sitecustomize overrides JAX_PLATFORMS)
    import torch
    from flax import serialization
    from sassd_tpu.config import load_config

    blob = torch.load(args.torch_checkpoint, map_location="cpu",
                      weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    params, state, unused = convert(sd)
    check_against_config(params, state, load_config(args.config))

    payload = dict(params=params, state=state, opt_state={},
                   epoch=int(blob.get("epoch", 0)) if isinstance(blob, dict) else 0,
                   step=int(blob.get("it", 0)) if isinstance(blob, dict) else 0,
                   batch_idx=-1)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(f"wrote {args.out}")
    if unused:
        print(f"ignored {len(unused)} reference entries (legacy/aux): "
              + ", ".join(unused[:8]) + ("..." if len(unused) > 8 else ""))


if __name__ == "__main__":
    main()
