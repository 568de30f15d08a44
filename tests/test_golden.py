"""Golden-output regression test: a fixed scene through the full jitted
forward must keep producing the same detections across refactors.

Regenerate (after an INTENDED semantic change) with:
    python tests/test_golden.py regen
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden_detections.npz")


def compute():
    from sassd_tpu.config import tiny_config
    from sassd_tpu.data.kitti import build_anchors
    from sassd_tpu.data.synthetic import make_random_batch
    from sassd_tpu.models import detector

    cfg = tiny_config()
    params, state = detector.detector_init(jax.random.PRNGKey(7), cfg)
    anchors = jnp.asarray(build_anchors(cfg)[0])
    batch = {k: jnp.asarray(v) for k, v in make_random_batch(
        cfg, np.random.default_rng(7), batch_size=2).items()}
    import dataclasses
    cfg_t = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, score_thr=0.45))
    dets = detector.forward_test(params, state, batch, anchors, cfg_t)
    # also capture an intermediate: BEV feature statistics
    spine = detector.forward_spine(params, state, batch, cfg, train=False)
    return dict(boxes=np.asarray(dets["boxes"]),
                scores=np.asarray(dets["scores"]),
                valid=np.asarray(dets["valid"]),
                bev_mean=np.asarray(jnp.mean(spine.bev_map, axis=(1, 2))),
                bev_std=np.asarray(jnp.std(spine.bev_map)))


def test_golden_outputs_stable():
    got = compute()
    if not os.path.exists(GOLDEN):
        np.savez(GOLDEN, **got)
        raise AssertionError("golden file created; rerun the test")
    ref = np.load(GOLDEN)
    np.testing.assert_array_equal(got["valid"], ref["valid"])
    np.testing.assert_allclose(got["scores"], ref["scores"], atol=1e-3)
    np.testing.assert_allclose(got["boxes"], ref["boxes"], atol=1e-2)
    np.testing.assert_allclose(got["bev_mean"], ref["bev_mean"], atol=1e-3)
    np.testing.assert_allclose(got["bev_std"], ref["bev_std"], atol=1e-3)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
        np.savez(GOLDEN, **compute())
        print("regenerated", GOLDEN)
