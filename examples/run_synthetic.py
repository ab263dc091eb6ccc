"""End-to-end FSF inference demo on a synthetic scene (no dataset needed).

Builds the full fusion detector (tiny config), runs inference with synthetic
camera masks, and prints the detections.

    python examples/run_synthetic.py [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from fullysparsefusion_tpu.config import tiny_fsf_config
    from fullysparsefusion_tpu.models.fsf import FSF
    from fixtures import make_scene, make_camera_data, with_noaug_channels

    cfg = tiny_fsf_config()
    pb, gt = make_scene(seed=42, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
    cam = make_camera_data(pb, gt, num_classes=cfg.num_classes)
    pb = with_noaug_channels(pb)
    model = FSF(cfg=cfg)
    print("initializing FSF (tiny config)...")
    vars_ = jax.jit(
        lambda k: model.init(
            k, pb, cam, 2, None, None, False, method=lambda m, *a, **kw: m(*a, **kw)
        )
    )(jax.random.key(0))

    fwd = jax.jit(lambda v, pb, cam: model.apply(v, pb, cam, 2, None, None, False))
    t0 = time.time()
    out = fwd(vars_, pb, cam)
    jax.block_until_ready(out["final"]["cls_logits"])
    print(f"forward (compile+run): {time.time() - t0:.1f}s")

    res = model.apply(vars_, out, 2, method=FSF.get_bboxes)
    for b in range(2):
        v = np.asarray(res.valid[b])
        boxes = np.asarray(res.boxes[b])[v]
        scores = np.asarray(res.scores[b])[v]
        labels = np.asarray(res.labels[b])[v]
        print(f"sample {b}: {v.sum()} detections")
        for i in range(min(5, len(boxes))):
            x, y, z = boxes[i, :3]
            print(
                f"  cls={cfg.fsd.class_names[labels[i]]:<20s} "
                f"score={scores[i]:.3f} xyz=({x:+.1f},{y:+.1f},{z:+.1f})"
            )
    print(
        f"camera queries: {int(np.asarray(out['frustum']['obj_valid']).sum())}, "
        f"lidar queries: {int(np.asarray(out['fsd']['cluster_valid']).sum())}"
    )


if __name__ == "__main__":
    main()
