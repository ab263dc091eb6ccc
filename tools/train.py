"""Training CLI.

TPU-native counterpart of the reference launch stack (tools/train.py +
dist_train.sh): no torch.distributed.launch — one process drives a
data-parallel mesh over all local devices; gradients/normalizers/BN stats
sync through GSPMD collectives inside the jitted step.

Usage:
  python tools/train.py --config /path/to/FSF_nuScenes_config.py \
      --info-pkl data/nuscenes_infos_train.pkl --data-root data/nuscenes \
      --work-dir work_dirs/fsf
  python tools/train.py --synthetic   # smoke-train on the synthetic scene
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", help="reference-style config file")
    p.add_argument("--info-pkl")
    p.add_argument("--data-root")
    p.add_argument("--work-dir", default="work_dirs/default")
    p.add_argument("--max-steps", type=int, default=0, help="0 = epochs from config")
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--batch-size", type=int, default=0, help="0 = one per device")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic", action="store_true", help="synthetic-scene smoke run")
    p.add_argument("--tiny", action="store_true",
                   help="use the tiny test config instead of the file config (CI)")
    p.add_argument("--model", default="fsd", choices=["fsd", "fsf"],
                   help="fsd = LiDAR-only; fsf = full fusion (synthetic masks in --synthetic mode)")
    p.add_argument("--log-interval", type=int, default=20)
    p.add_argument("--ckpt-interval", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrain-steps", type=int, default=0,
                   help="segmentor-only warmup: detection losses gated off")
    p.add_argument("--threshold-buffer", type=float, default=0.0,
                   help="initial fg-threshold buffer, decays to 0 by 2x pretrain steps")
    p.add_argument("--cpu", action="store_true", help="force host CPU backend")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fullysparsefusion_tpu.config import tiny_fsd_config
    from fullysparsefusion_tpu.models.fsd import SingleStageFSD
    from fullysparsefusion_tpu.parallel import (
        TrainState, make_optimizer, make_train_step,
    )
    from fullysparsefusion_tpu.train import (
        save_checkpoint, load_checkpoint, latest_checkpoint, RuntimeSchedule,
    )
    from fullysparsefusion_tpu.utils.containers import PointBatch, GroundTruth

    os.makedirs(args.work_dir, exist_ok=True)

    use_fsf = args.model == "fsf"
    if args.synthetic:
        from fixtures import make_scene, make_camera_data, with_noaug_channels

        if use_fsf:
            from fullysparsefusion_tpu.config import tiny_fsf_config
            from fullysparsefusion_tpu.models.fsf import FSF

            fcfg = tiny_fsf_config()
            cfg = fcfg.fsd
            model = FSF(cfg=fcfg)
        else:
            cfg = tiny_fsd_config()
            model = SingleStageFSD(cfg=cfg)
        batch_size = 2

        def batch_iter():
            i = 0
            while True:
                pb, gt = make_scene(
                    seed=i, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt
                )
                if use_fsf:
                    cam = make_camera_data(
                        pb, gt, num_cams=fcfg.num_cams, num_classes=fcfg.num_classes
                    )
                    yield with_noaug_channels(pb), cam, gt, gt
                else:
                    yield pb, gt
                i += 1

        total_steps = args.max_steps or 50
    else:
        assert (args.config or args.tiny) and args.info_pkl and args.data_root, (
            "--config/--info-pkl/--data-root required (or use --synthetic)"
        )
        from fullysparsefusion_tpu.config_compat import load_fsf_config
        from fullysparsefusion_tpu.data.nuscenes import NuScenesReader

        if args.tiny:
            from fullysparsefusion_tpu.config import tiny_fsf_config

            fsf_cfg = tiny_fsf_config()
        else:
            fsf_cfg = load_fsf_config(args.config)
        cfg = fsf_cfg.fsd
        model = SingleStageFSD(cfg=cfg)  # LiDAR branch; FSF train lands with mask data
        batch_size = args.batch_size or jax.device_count()
        reader = NuScenesReader(
            info_path=args.info_pkl, data_root=args.data_root,
            class_names=cfg.class_names, seed=args.seed,
        )
        steps_per_epoch = len(reader) // batch_size
        total_steps = args.max_steps or steps_per_epoch * args.epochs

        def batch_iter():
            while True:
                for batch, _ in reader.batches(
                    batch_size, cfg.caps.points, cfg.caps.max_gt
                ):
                    pb = PointBatch(
                        points=jnp.asarray(batch["points"]),
                        batch_idx=jnp.asarray(batch["batch_idx"]),
                        valid=jnp.asarray(batch["valid"]),
                    )
                    gt = GroundTruth(
                        boxes=jnp.asarray(batch["gt_boxes"]),
                        labels=jnp.asarray(batch["gt_labels"]),
                        valid=jnp.asarray(batch["gt_valid"]),
                    )
                    yield pb, gt

    it = batch_iter()
    batch0 = next(it)
    if use_fsf:
        pb0, cam0, gt0, nogt0 = batch0
        vars_ = jax.jit(
            lambda k: model.init(
                k, pb0, cam0, batch_size, gt0, nogt0, False,
                method=lambda m, *a, **kw: m(*a, **kw),
            )
        )(jax.random.key(args.seed))
    else:
        pb0, gt0 = batch0
        vars_ = jax.jit(
            lambda k: model.init(
                k, pb0, batch_size, gt0, False, method=lambda m, *a, **kw: m(*a, **kw)
            )
        )(jax.random.key(args.seed))

    tx = make_optimizer(
        base_lr=args.lr, total_steps=total_steps,
        lr_mult_rules={"segmentor.SegmentorCore_0": 0.2},
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=vars_["params"],
        batch_stats=vars_["batch_stats"], opt_state=tx.init(vars_["params"]),
    )
    if args.resume:
        path = latest_checkpoint(args.work_dir)
        if path:
            state = load_checkpoint(path, state)
            print(f"resumed from {path} at step {int(state.step)}")

    if use_fsf:
        from fullysparsefusion_tpu.parallel import (
            make_generic_train_step, fsf_forward_fn,
        )

        step_fn = make_generic_train_step(fsf_forward_fn(model, batch_size), tx)
    else:
        step_fn = make_train_step(model, tx, batch_size)
    schedule = RuntimeSchedule(
        enable_detection_step=args.pretrain_steps,
        threshold_buffer_start=args.threshold_buffer,
        threshold_buffer_end_step=2 * args.pretrain_steps,
    )
    log_path = os.path.join(args.work_dir, "train_log.jsonl")
    t0 = time.time()
    start = int(state.step)
    for i in range(start, total_steps):
        batch = next(it)
        if not use_fsf:
            buf = jnp.float32(schedule.threshold_buffer(i))
            detw = jnp.float32(1.0 if schedule.enable_detection(i) else 0.0)
            state, loss, losses = step_fn(state, *batch, buf, detw)
        else:
            state, loss, losses = step_fn(state, *batch)
        if (i + 1) % args.log_interval == 0:
            loss_v = float(loss)
            dt = (time.time() - t0) / args.log_interval
            t0 = time.time()
            rec = {
                "step": i + 1, "loss": round(loss_v, 4),
                "sec_per_step": round(dt, 3),
                **{k: round(float(v), 4) for k, v in losses.items()},
            }
            print(json.dumps(rec))
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if (i + 1) % args.ckpt_interval == 0 or i + 1 == total_steps:
            save_checkpoint(args.work_dir, i + 1, state)
    print(f"done: {total_steps} steps; checkpoints in {args.work_dir}")


if __name__ == "__main__":
    main()
