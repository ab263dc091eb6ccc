"""Training CLI.

TPU-native counterpart of the reference launch stack (tools/train.py +
dist_train.sh): no torch.distributed.launch — one process drives a
data-parallel mesh over all local devices; gradients/normalizers/BN stats
sync through collectives inside the jitted shard_map step. On a single
device the same step runs un-sharded.

Usage:
  # full-fusion training (masks from tools/generate_masks.py)
  python tools/train.py --config /path/to/FSF_nuScenes_config.py \
      --model fsf --info-pkl data/nuscenes_infos_train.pkl \
      --data-root data/nuscenes --mask-dir data/masks --work-dir work_dirs/fsf
  # LiDAR-only FSD pretrain, with GT-paste that switches off near the end
  python tools/train.py --config ... --model fsd --gt-db data/gt_db.pkl \
      --disable-aug-step 18000 ...
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
    p.add_argument("--model", default="fsd", choices=["fsd", "fsd2", "fsf"],
                   help="fsd = LiDAR-only; fsf = full fusion (needs --mask-dir on real data)")
    p.add_argument("--log-interval", type=int, default=20)
    p.add_argument("--ckpt-interval", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrain-steps", type=int, default=0,
                   help="segmentor-only warmup: detection losses gated off")
    p.add_argument("--threshold-buffer", type=float, default=0.0,
                   help="initial fg-threshold buffer, decays over the warmup tail")
    p.add_argument("--init-from", help="converted .pth vars pickle "
                   "(tools/convert_checkpoint.py --out) to warm-start from")
    # FSF camera inputs (mirror tools/test.py)
    p.add_argument("--mask-dir", help="pre-computed 2D instance masks (FSF mode)")
    p.add_argument("--mask-downsample", type=int, default=2)
    p.add_argument("--img-h", type=int, default=900)
    p.add_argument("--img-w", type=int, default=1600)
    # GT-paste augmentation
    p.add_argument("--gt-db", help="GT database pickle (tools/create_gt_database.py)")
    p.add_argument("--paste-max", default="2",
                   help="per-class paste budget: single int or 'cls:k,cls:k'")
    p.add_argument("--disable-aug-step", type=int, default=-1,
                   help="turn GT-paste off from this step (DisableAugmentationHook)")
    p.add_argument("--no-shard", action="store_true",
                   help="force the single-jit step even on multi-device hosts")
    p.add_argument("--multihost", action="store_true",
                   help="TPU-pod multi-process run: jax.distributed.initialize "
                        "+ per-process dataset striding (reference "
                        "dist_train.sh / DistributedSampler surface); launch "
                        "one process per host via tools/launch_train.sh")
    p.add_argument("--cpu", action="store_true", help="force host CPU backend")
    # train-time debug dumps (reference vis_dir hooks run during training:
    # frustum_assigner.py:171-232)
    p.add_argument("--vis-dir", help="BEV debug PNGs of the training batches")
    p.add_argument("--vis-interval", type=int, default=200)
    return p.parse_args()


def _parse_paste_max(spec: str, num_classes: int):
    if ":" in spec:
        out = {}
        for part in spec.split(","):
            k, v = part.split(":")
            out[int(k)] = int(v)
        return out
    return {c: int(spec) for c in range(num_classes)}




def _build_lidar_model(args, cfg):
    """fsd = single-stage; fsd2 = + GroupCorrectionHead second stage
    (reference two-stage FSD config surface, fsd_roi_head.py)."""
    if args.model == "fsd2":
        from fullysparsefusion_tpu.models.two_stage import TwoStageFSD

        return TwoStageFSD(cfg=cfg)
    from fullysparsefusion_tpu.models.fsd import SingleStageFSD

    return SingleStageFSD(cfg=cfg)


def main():
    args = parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        # must run before any backend-initializing jax call; on TPU pods
        # coordinator/process env is discovered from the TPU runtime
        import jax
        jax.distributed.initialize()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fullysparsefusion_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from fullysparsefusion_tpu.config import tiny_fsd_config
    from fullysparsefusion_tpu.models.fsd import SingleStageFSD
    from fullysparsefusion_tpu.parallel import (
        TrainState, make_optimizer, make_train_step, make_generic_train_step,
        make_sharded_train_step, make_fsf_sharded_train_step, fsf_forward_fn,
    )
    from fullysparsefusion_tpu.train import (
        save_checkpoint, load_checkpoint, latest_checkpoint, RuntimeSchedule,
    )
    from fullysparsefusion_tpu.utils.containers import PointBatch, GroundTruth

    os.makedirs(args.work_dir, exist_ok=True)

    use_fsf = args.model == "fsf"
    reader = None
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
            model = _build_lidar_model(args, cfg)
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
        if use_fsf:
            from fullysparsefusion_tpu.models.fsf import FSF
            from fullysparsefusion_tpu.models.camera import CameraData
            from fullysparsefusion_tpu.data.masks import load_sample_masks

            assert args.mask_dir, "--mask-dir required for --model fsf"
            model = FSF(cfg=fsf_cfg)
        else:
            model = _build_lidar_model(args, cfg)
        batch_size = args.batch_size or jax.device_count()
        sampler = None
        if args.gt_db:
            from fullysparsefusion_tpu.data.gt_sampling import GTPasteSampler

            sampler = GTPasteSampler(
                db_path=args.gt_db,
                max_per_class=_parse_paste_max(args.paste_max, len(cfg.class_names)),
                seed=args.seed,
            )
        reader = NuScenesReader(
            info_path=args.info_pkl, data_root=args.data_root,
            class_names=cfg.class_names, seed=args.seed,
            gt_sampler=sampler,
            mask_dir=args.mask_dir, mask_hw=(args.img_h, args.img_w),
            mask_downsample=args.mask_downsample,
            num_mask_classes=len(cfg.class_names),
        )
        n_proc = jax.process_count()
        if n_proc > 1:
            # per-process dataset stride (reference DistributedSampler:
            # rank takes idx % world) and a LOCAL slice of the global batch;
            # device_put with the dp sharding assembles the global array
            # from each host's shard
            assert batch_size % n_proc == 0, (batch_size, n_proc)
            reader._indices = reader._indices[jax.process_index()::n_proc]
            batch_size //= n_proc
        steps_per_epoch = max(len(reader) // batch_size, 1)
        total_steps = args.max_steps or steps_per_epoch * args.epochs
        ds = args.mask_downsample

        def batch_iter():
            while True:
                for batch, samples in reader.batches(
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
                    if not use_fsf:
                        yield pb, gt
                        continue
                    no_aug = GroundTruth(
                        boxes=jnp.asarray(batch.get("no_aug_gt_boxes", batch["gt_boxes"])),
                        labels=jnp.asarray(batch["gt_labels"]),
                        valid=jnp.asarray(batch["gt_valid"]),
                    )
                    masks_l, annos_l, l2i_l = [], [], []
                    for s in samples:
                        assert s["lidar2img"] is not None, "info pkl lacks lidar2img"
                        l2i = np.asarray(s["lidar2img"], np.float32).copy()
                        m, a = load_sample_masks(
                            args.mask_dir, s["token"], l2i.shape[0],
                            len(cfg.class_names), (args.img_h, args.img_w),
                            downsample=ds,
                        )
                        l2i[:, :2] /= ds
                        masks_l.append(m)
                        annos_l.append(a)
                        l2i_l.append(l2i)
                    from fullysparsefusion_tpu.data.masks import pack_mask_scores

                    cam = CameraData.build(
                        pack_mask_scores(np.stack(masks_l), np.stack(annos_l)),
                        np.stack(annos_l), np.stack(l2i_l))
                    yield pb, cam, gt, no_aug

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

    if args.init_from:
        # warm-start from converted reference weights (load_from semantics,
        # FSF_nuScenes_config.py:429)
        import pickle

        with open(args.init_from, "rb") as f:
            loaded = pickle.load(f)
        vars_ = jax.tree_util.tree_map(jnp.asarray, loaded)
        print(f"initialized from {args.init_from}")

    tx = make_optimizer(
        base_lr=args.lr, total_steps=total_steps,
        lr_mult_rules={"segmentor.SegmentorCore_0": 0.2, "seg_core": 0.2},
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

    # data-parallel shard_map step whenever >1 device is visible (the
    # reference's DDP surface, dist_train.sh); single-jit otherwise
    n_dev = jax.device_count()
    n_proc = jax.process_count()
    global_batch = batch_size * n_proc  # batch_size is per-process local
    shard = (not args.no_shard) and n_dev > 1 and global_batch % n_dev == 0
    if shard:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("dp",))
        data_sharding = NamedSharding(mesh, P("dp"))
        per_dev = global_batch // n_dev
        if use_fsf:
            step_fn = make_fsf_sharded_train_step(model, tx, mesh, per_dev)
        else:
            step_fn = make_sharded_train_step(model, tx, mesh, per_dev)

        if n_proc > 1:
            # multi-controller: each host contributes its local slice of the
            # globally-sharded batch arrays
            def put(batch):
                return tuple(
                    jax.tree_util.tree_map(
                        lambda x: jax.make_array_from_process_local_data(
                            data_sharding, np.asarray(x)), t)
                    for t in batch
                )
        else:
            def put(batch):
                return tuple(
                    jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, data_sharding), t)
                    for t in batch
                )
        print(f"data-parallel over {n_dev} devices x {n_proc} hosts "
              f"({per_dev}/device)")
    else:
        if use_fsf:
            step_fn = make_generic_train_step(fsf_forward_fn(model, batch_size), tx)
        else:
            step_fn = make_train_step(model, tx, batch_size)
        put = lambda batch: batch

    schedule = RuntimeSchedule(
        enable_detection_step=args.pretrain_steps,
        threshold_buffer_start=args.threshold_buffer,
        threshold_buffer_end_step=2 * args.pretrain_steps,
        disable_aug_step=args.disable_aug_step,
    )
    log_path = os.path.join(args.work_dir, "train_log.jsonl")
    t0 = time.time()
    start = int(state.step)
    for i in range(start, total_steps):
        if reader is not None:
            reader.paste_enabled = schedule.augmentation_enabled(i)
        raw = next(it)
        if (args.vis_dir and i % args.vis_interval == 0
                and jax.process_index() == 0):
            from fullysparsefusion_tpu.utils.visualize import dump_bev

            pb_v = raw[0]
            gt_v = raw[2] if use_fsf else raw[1]
            sel = np.asarray(pb_v.batch_idx) == 0
            gv = np.asarray(gt_v.valid[0])
            dump_bev(
                os.path.join(args.vis_dir, f"step{i:06d}_bev.png"),
                np.asarray(pb_v.points)[sel, :3],
                point_valid=np.asarray(pb_v.valid)[sel],
                gt_boxes=np.asarray(gt_v.boxes[0])[gv],
                title=f"step {i} paste={schedule.augmentation_enabled(i)}",
            )
        batch = put(raw)
        buf = jnp.float32(schedule.threshold_buffer(i))
        detw = jnp.float32(1.0 if schedule.enable_detection(i) else 0.0)
        state, loss, losses = step_fn(state, *batch, buf, detw)
        if (i + 1) % args.log_interval == 0:
            loss_v = float(loss)
            dt = (time.time() - t0) / args.log_interval
            t0 = time.time()
            rec = {
                "step": i + 1, "loss": round(loss_v, 4),
                "sec_per_step": round(dt, 3),
                "paste": bool(schedule.augmentation_enabled(i)),
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
