"""Benchmark: frames/sec/chip for flagship inference at nuScenes scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no speed numbers (SURVEY.md §6); BASELINE.json's
target is ≥2× an A100's frames/sec on FSF nuScenes inference. We use 10 fps
as the working A100 estimate for `vs_baseline` (FSD-class detectors run
~60-100 ms/frame on A100-class GPUs) until a measured baseline lands.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

A100_FPS_ESTIMATE = 10.0


def build_bench_model():
    import jax
    from fullysparsefusion_tpu.config import (
        FSDConfig, VoteSegmentorConfig, HeadConfig, Capacities,
    )
    from fullysparsefusion_tpu.models.fsd import SingleStageFSD

    # nuScenes-scale single-frame inference (batch 1): ~150k points (the
    # 10-sweep pipeline yields 200-300k raw; after range filtering and
    # static bucketing 150k is representative), full UNet channels.
    caps = Capacities(
        points=131072, voxels=65536, prevox=65536,
        fg_per_group=4096, cluster_voxels_per_group=1024, clusters=1024,
        max_gt=128,
    )
    cfg = FSDConfig(caps=caps)

    from fixtures import make_scene

    pb, gt = make_scene(
        seed=0, batch_size=1, boxes_per_sample=32, pts_per_box=200,
        bg_points=100000, n_cap=caps.points, max_gt=caps.max_gt, extent=45.0,
    )
    model = SingleStageFSD(cfg=cfg)
    # Init on the host CPU (eager init over the axon tunnel is one RPC per
    # op — minutes), then transfer the pytree to the TPU once.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pb_cpu = jax.device_put(pb, cpu)
        vars_ = jax.jit(
            lambda k, p: SingleStageFSD(cfg=cfg).init(
                k, p, 1, None, False, method=lambda m, *a, **k_: m(*a, **k_)
            )
        )(jax.random.key(0), pb_cpu)
    dev = jax.devices()[0]
    vars_ = jax.device_put(vars_, dev)
    pb = jax.device_put(pb, dev)
    return cfg, model, vars_, pb


def main():
    import jax

    cfg, model, vars_, pb = build_bench_model()

    @jax.jit
    def fwd(pb):
        out = model.apply(vars_, pb, 1, None, False)
        return out["cls_logits"], out["reg_preds"], out["cluster_xyz"], out["cluster_valid"]

    t0 = time.time()
    jax.block_until_ready(fwd(pb))
    compile_s = time.time() - t0

    # steady state
    n_iter = 20
    t0 = time.time()
    for _ in range(n_iter):
        out = fwd(pb)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_iter
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "frames/sec/chip FSF nuScenes val inference (synthetic scene, LiDAR branch)",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / A100_FPS_ESTIMATE, 3),
                "detail": {
                    "ms_per_frame": round(dt * 1000, 1),
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                    "points_capacity": 131072,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
