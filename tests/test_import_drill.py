"""Real-KITTI readiness drill (VERDICT r4 item 7): the day-one path for a
reference user — torch ``.pth`` state_dict -> tools/import_reference_
checkpoint.py -> tools/test.py inference + AP — must execute end-to-end
with zero code changes, and the CLI-imported checkpoint must produce
EXACTLY the detections of the same weights loaded natively.

Runs at tiny-config widths (the reference-width conversion is shape-checked
in test_import.py; CPU can't compile the 256-channel BEV trunk in test
time) with a real torch-serialized file and real subprocess CLI runs.
"""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from import_reference_checkpoint import convert  # noqa: E402
from test_import import _rng_sd  # noqa: E402
from tiny_config import tiny_config  # noqa: E402


def _tiny_sd():
    cfg = tiny_config()
    d = cfg.sparse_shape[0]
    for _ in range(3):
        d = (d - 1) // 2 + 1
    return _rng_sd(num_class=1, bev_channels=cfg.model.bev_channels,
                   bev_in=d * 64, num_parts=cfg.model.num_parts)


def _write_cfg(path, data_root):
    path.write_text(
        "import dataclasses, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from tiny_config import tiny_config\n"
        "_c = tiny_config()\n"
        "config = dataclasses.replace(\n"
        f"    _c, data=dataclasses.replace(_c.data, root={str(data_root)!r}),\n"
        "    test=dataclasses.replace(_c.test, score_thr=0.05))\n")


def test_import_drill_cli_roundtrip(tmp_path):
    sd = _tiny_sd()
    pth = tmp_path / "ref.pth"
    # the reference saves {'state_dict': ..., 'meta': ...}
    # (mmcv checkpoint format, tools/train_utils/__init__.py:154-180)
    torch.save({"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()},
                "meta": {"epoch": 50}}, pth)

    cfg_py = tmp_path / "cfg.py"
    from sassd_tpu.data.synthetic import write_synthetic_kitti
    root = tmp_path / "kitti"
    write_synthetic_kitti(root, n_train=2, n_val=2, seed=0)
    _write_cfg(cfg_py, root)

    env = dict(os.environ, PYTHONPATH=str(REPO / "tests"))
    out_ck = tmp_path / "imported.msgpack"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools/import_reference_checkpoint.py"),
         str(pth), str(cfg_py), str(out_ck)],
        capture_output=True, text=True, env=env, cwd=str(REPO))
    assert r.returncode == 0, r.stderr[-2000:]
    assert out_ck.exists()

    out_dir = tmp_path / "results"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools/test.py"), str(cfg_py),
         str(out_ck), "--out", str(out_dir)],
        capture_output=True, text=True, env=env, cwd=str(REPO))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bbox AP" in r.stdout        # the official AP table printed
    result_files = sorted(out_dir.glob("*.txt"))
    assert len(result_files) == 2       # one KITTI result file per val scan

    # natively-loaded weights must give EXACTLY the same detections
    import jax
    import flax.serialization as ser
    from sassd_tpu.config import load_config
    from sassd_tpu.data.kitti import KittiDataset
    from sassd_tpu.inference import run_inference
    from sassd_tpu.models import detector
    from sassd_tpu.train import checkpoint as ckpt_lib
    from sassd_tpu.eval.kitti_eval import label_file_to_anno

    sys.path.insert(0, str(REPO / "tests"))
    cfg = load_config(str(cfg_py))
    params_n, state_n, _ = convert(sd)
    p0, s0 = detector.detector_init(jax.random.PRNGKey(0), cfg)
    # the CLI-imported checkpoint holds the identical tree (.pth -> convert)
    p_ck = ckpt_lib.load_params_only(str(out_ck), p0)
    with open(out_ck, "rb") as f:
        payload = ser.msgpack_restore(f.read())
    s_ck = ser.from_state_dict(s0, payload["state"])
    flat_n = dict(jax.tree_util.tree_flatten_with_path(params_n)[0])
    for path, leaf in jax.tree_util.tree_flatten_with_path(p_ck)[0]:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_n[path]),
                                      err_msg=jax.tree_util.keystr(path))

    ds = KittiDataset(cfg, root / "training", root / "ImageSets" / "val.txt",
                      test_mode=True)
    annos, ids = run_inference(cfg, ds, p_ck, s_ck)
    for anno, sid in zip(annos, ids):
        file_anno = label_file_to_anno(out_dir / f"{sid:06d}.txt")
        assert len(file_anno["name"]) == len(anno["name"])
        if len(anno["name"]):
            np.testing.assert_allclose(file_anno["score"], anno["score"],
                                       atol=1e-4)
