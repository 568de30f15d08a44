"""Reference-checkpoint importer: torch state_dict -> sassd_tpu pytrees.

The fake state_dict below is hand-built from the reference module
definitions (shapes transcribed from /root/reference/mmdet/models/necks/
cmn.py:194-262 and single_stage_heads/ssd_rotate_head.py:120-125,424-429),
NOT derived from our init tree — so the test fails if either the mapping
or our model's parameter layout drifts from the reference architecture.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from import_reference_checkpoint import convert, check_against_config
from sassd_tpu.config import car_config, multi_config


def _rng_sd(num_class=1, bev_channels=256, bev_in=320, num_parts=28):
    """Reference-layout state_dict with random weights. bev_channels/bev_in/
    num_parts parameterize the BEV widths so the end-to-end import drill
    (test_import_drill.py) can run at tiny-config scale; the defaults are
    the real reference widths (cmn.py:233-262)."""
    r = np.random.RandomState(0)

    sd = {}

    def add(name, *shape):
        sd[name] = r.randn(*shape).astype(np.float32)

    def bn(prefix, c):
        add(f"{prefix}.weight", c)
        add(f"{prefix}.bias", c)
        add(f"{prefix}.running_mean", c)
        add(f"{prefix}.running_var", c)
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(7)

    # VxNet (cmn.py:194-217): double/stride/triple blocks, convs at seq
    # indices 0/3/6, BN right after each conv
    def spconv_block(prefix, idxs, cios):
        for j, (ci, co) in zip(idxs, cios):
            add(f"{prefix}.{j}.weight", 3, 3, 3, ci, co)
            bn(f"{prefix}.{j + 1}", co)

    spconv_block("neck.backbone.conv0", (0, 3), ((4, 16), (16, 16)))
    spconv_block("neck.backbone.down0", (0,), ((16, 32),))
    spconv_block("neck.backbone.conv1", (0, 3), ((32, 32), (32, 32)))
    spconv_block("neck.backbone.down1", (0,), ((32, 64),))
    spconv_block("neck.backbone.conv2", (0, 3, 6),
                 ((64, 64), (64, 64), (64, 64)))
    spconv_block("neck.backbone.down2", (0,), ((64, 64),))
    spconv_block("neck.backbone.conv3", (0, 3, 6),
                 ((64, 64), (64, 64), (64, 64)))
    add("neck.backbone.extra_conv.0.weight", 1, 1, 1, 64, 64)
    bn("neck.backbone.extra_conv.1", 64)

    # BEVNet (cmn.py:233-262): in = 64 channels * D=5 after z-fold
    c = bev_channels
    add("neck.fcn.conv0.weight", c, bev_in, 3, 3)
    bn("neck.fcn.bn0", c)
    for i in range(1, 7):
        add(f"neck.fcn.conv{i}.weight", c, c, 3, 3)
        bn(f"neck.fcn.bn{i}", c)
    add("neck.fcn.conv7.weight", c, c, 1, 1)
    bn("neck.fcn.bn7", c)

    # aux point branch (cmn.py:27-29), torch Linear [out, in], bias-free
    add("neck.point_fc.weight", 64, 160)
    add("neck.point_cls.weight", 1, 64)
    add("neck.point_reg.weight", 3, 64)

    # SSDRotateHead: num_anchor_per_loc = 2 * num_class
    # (ssd_rotate_head.py:104,120-125): cls = npl*C, box = npl*7, dir = npl*2
    npl = 2 * num_class
    add("bbox_head.conv_cls.weight", npl * num_class, c, 1, 1)
    add("bbox_head.conv_cls.bias", npl * num_class)
    add("bbox_head.conv_box.weight", npl * 7, c, 1, 1)
    add("bbox_head.conv_box.bias", npl * 7)
    add("bbox_head.conv_dir_cls.weight", npl * 2, c, 1, 1)
    add("bbox_head.conv_dir_cls.bias", npl * 2)

    # PSWarpHead convs: Conv3x3 / BN / ReLU / Conv1x1, 28 parts
    add("extra_head.convs.0.weight", num_parts, c, 3, 3)
    bn("extra_head.convs.1", num_parts)
    add("extra_head.convs.3.weight", num_parts, num_parts, 1, 1)

    return sd


def test_convert_matches_car_config_shapes():
    sd = _rng_sd()
    params, state, unused = convert(sd)
    assert unused == []
    # validates structure + every leaf shape against init_params(car)
    check_against_config(params, state, car_config())


def test_convert_matches_multi_config_shapes():
    """Multi-class import: same mapping, bigger head channels (the layout
    factorization is proven against the reference head's own forward in
    test_reference_oracle.py::test_multiclass_head_layout_oracle)."""
    sd = _rng_sd(num_class=3)
    params, state, unused = convert(sd)
    assert unused == []
    check_against_config(params, state, multi_config())


def test_axis_transposes():
    sd = _rng_sd()
    params, state, _ = convert(sd)

    # spconv [kz,ky,kx,Ci,Co] row-major == our [27,Ci,Co] tap order
    w = sd["neck.backbone.conv0.0.weight"]
    ours = params["vxnet"]["conv0"]["conv0"]["w"]
    np.testing.assert_array_equal(ours[0], w[0, 0, 0])       # tap (-1,-1,-1)
    np.testing.assert_array_equal(ours[13], w[1, 1, 1])      # center tap
    np.testing.assert_array_equal(ours[26], w[2, 2, 2])

    # torch Conv2d [Co,Ci,kh,kw] -> [kh,kw,Ci,Co]
    w = sd["neck.fcn.conv0.weight"]
    np.testing.assert_array_equal(params["bevnet"]["conv0"]["w"][1, 2, 3, 4],
                                  w[4, 3, 1, 2])

    # torch Linear [out,in] -> [in,out]
    np.testing.assert_array_equal(params["aux"]["point_fc"]["w"],
                                  sd["neck.point_fc.weight"].T)

    # BN naming
    np.testing.assert_array_equal(state["bevnet"]["bn3"]["mean"],
                                  sd["neck.fcn.bn3.running_mean"])
    np.testing.assert_array_equal(params["pswarp"]["bn0"]["scale"],
                                  sd["extra_head.convs.1.weight"])


def test_module_prefix_and_missing_key():
    sd = {f"module.{k}": v for k, v in _rng_sd().items()}
    params, _, _ = convert(sd)
    assert "vxnet" in params

    sd2 = _rng_sd()
    del sd2["bbox_head.conv_box.bias"]
    with pytest.raises(KeyError):
        convert(sd2)
