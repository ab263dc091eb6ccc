"""Full-FSF training descent at bench capacities (VERDICT r2 #8).

Runs N full-fusion training steps of the flagship FSF model at the exact
bench.py capacities (131k points, 57k voxels, 6 cams with 450x800 masks)
on whatever backend JAX selects (the real TPU under axon), cycling through
a small pool of synthetic scenes, and writes a loss-curve artifact to
docs/tpu_fsf_training_descent.json.

Run with FSF_DEBUG_PAIR_BUDGET=1 to arm the pair-budget overflow probe
(prints loudly if any compact rulebook truncates; the shipped config keeps
the compact path off, so a clean run is expected and silent).

    FSF_DEBUG_PAIR_BUDGET=1 python tools/train_descent.py --steps 120
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "tpu_fsf_training_descent.json"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from bench import build_bench_model, _wait_for_backend
    if not args.cpu:
        _wait_for_backend()
    import jax
    import jax.numpy as jnp
    from fixtures import make_lidar_scene, make_camera_data, with_noaug_channels
    from fullysparsefusion_tpu.parallel import (
        TrainState, make_optimizer, make_generic_train_step, fsf_forward_fn,
    )
    from fullysparsefusion_tpu.utils.containers import PointBatch

    cfg, model, vars_, _, _ = build_bench_model()
    batch = int(os.environ.get("FSF_BENCH_BATCH", 1))
    caps = cfg.fsd.caps
    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    # scene pool: same generator as bench.py, but keeping the GT this time
    scenes = []
    with jax.default_device(cpu):
        for s in range(args.scenes):
            pbs, gts = [], []
            for b in range(batch):
                pb_b, gt_b = make_lidar_scene(
                    seed=101 + s * 17 + b, n_cap=131072, max_gt=caps.max_gt,
                    n_boxes=32, extent=48.0)
                pbs.append(pb_b)
                gts.append(gt_b)
            pb = PointBatch(
                points=jnp.concatenate([p.points for p in pbs]),
                batch_idx=jnp.concatenate(
                    [p.batch_idx + b for b, p in enumerate(pbs)]),
                valid=jnp.concatenate([p.valid for p in pbs]),
            )
            gt = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *gts)
            cam = make_camera_data(
                pb, gt, batch_size=batch, num_cams=cfg.num_cams,
                num_classes=cfg.num_classes, img_h=450, img_w=800,
                max_anno=250, fx=400.0)
            pb = with_noaug_channels(pb)
            scenes.append(jax.device_put((pb, cam, gt), dev))

    tx = make_optimizer(base_lr=1e-4, total_steps=args.steps)
    with jax.default_device(cpu):
        opt_state = tx.init(jax.device_put(vars_["params"], cpu))
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=vars_["params"], batch_stats=vars_["batch_stats"],
        opt_state=jax.device_put(opt_state, dev),
    )
    step_fn = make_generic_train_step(fsf_forward_fn(model, batch), tx)

    log, first_loss, last_loss = [], None, None
    t_compile = None
    t0 = time.time()
    for i in range(args.steps):
        pb, cam, gt = scenes[i % len(scenes)]
        state, loss, losses = step_fn(state, pb, cam, gt, gt)
        if i == 0:
            l0 = float(np.asarray(loss))
            t_compile = time.time() - t0
            first_loss = l0
            print(f"step 1: loss {l0:.4f} (compile+layout {t_compile:.0f}s)",
                  flush=True)
            t0 = time.time()
        elif (i + 1) % args.log_every == 0:
            lv = float(np.asarray(loss))
            dt = (time.time() - t0) / args.log_every
            entry = {"step": i + 1, "loss": round(lv, 4),
                     "sec_per_step": round(dt, 3)}
            entry.update({
                k: round(float(np.asarray(v)), 4)
                for k, v in sorted(losses.items())
                if "loss" in k or k.endswith("num_pos")})
            log.append(entry)
            last_loss = lv
            print(json.dumps(entry), flush=True)
            t0 = time.time()

    artifact = {
        "device": str(dev),
        "config": (f"bench capacities (131k pts, {caps.voxels} voxels, "
                   f"{cfg.num_cams} cams 450x800 masks), "
                   f"{args.scenes}-scene pool, batch {batch}"),
        "steps": args.steps,
        "sec_per_step_steady": log[-1]["sec_per_step"] if log else None,
        "loss_first": first_loss,
        "loss_last": last_loss,
        "pair_budget_probe": (
            "armed" if os.environ.get("FSF_DEBUG_PAIR_BUDGET") else "off"),
        "log": log,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
