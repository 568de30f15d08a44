"""Device-graph train-step benchmark at several batch sizes.

The bench.py protocol (rotating pre-staged device-resident batches, 30+
async dispatches, one final block) applied to the TRAIN step — measures
the jitted fwd+bwd+optimizer graph alone, independent of the h2d path
(which crashes this environment's remote TPU worker at bs=2; the graph
itself is what batch scaling is about).

    python tools/train_bench.py --batch_sizes 1,2,4 [--flat_batch 0]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--batch_sizes", default="1,2,4")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--flat_batch", type=int, default=1)
    ap.add_argument("--host_plans", type=int, default=1,
                    help="0 = build sparse-conv plans in the XLA graph")
    ap.add_argument("--config", default="car", choices=["car", "multi"])
    ap.add_argument("--aux_interp", default=None, choices=["ring", "exact"])
    ap.add_argument("--compute_dtype", default=None,
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/sassd_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from sassd_tpu.config import car_config, multi_config
    from sassd_tpu.data.kitti import build_anchors
    from sassd_tpu.data.synthetic import make_random_batch
    from sassd_tpu.models import detector
    from sassd_tpu.train import loop, optim

    print(jax.devices(), flush=True)
    cfg = car_config() if args.config == "car" else multi_config()
    model_updates = {}
    if not args.flat_batch:
        model_updates["flat_batch"] = False
    if not args.host_plans:
        model_updates["host_plans"] = False
    if args.aux_interp:
        model_updates["aux_interp"] = args.aux_interp
    if args.compute_dtype:
        model_updates["compute_dtype"] = args.compute_dtype
    if model_updates:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_updates))
    anchors = jnp.asarray(build_anchors(cfg)[0])
    params, state = detector.detector_init(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train, total_steps=1000)
    opt_state0 = tx.init(params)

    rng = np.random.default_rng(0)
    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        batches = [{k: jnp.asarray(v) for k, v in make_random_batch(
            cfg, rng, batch_size=bs, n_points=16000).items()}
            for _ in range(4)]
        step = loop.make_train_step(cfg, anchors, tx)
        # non-donating warm copies so rotation can reuse trees
        p = jax.tree_util.tree_map(jnp.copy, params)
        s = jax.tree_util.tree_map(jnp.copy, state)
        o = jax.tree_util.tree_map(jnp.copy, opt_state0)
        p, s, o, m = step(p, s, o, batches[0])
        jax.block_until_ready(m["loss"])
        for b in batches[1:3]:
            p, s, o, m = step(p, s, o, b)
        jax.block_until_ready(m["loss"])
        iters = max(8, args.iters // bs)
        t0 = time.perf_counter()
        for i in range(iters):
            p, s, o, m = step(p, s, o, batches[i % len(batches)])
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"bs={bs}: {dt * 1000:.1f} ms/step "
              f"({bs / dt:.1f} train scans/s)", flush=True)


if __name__ == "__main__":
    main()
