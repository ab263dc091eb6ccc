"""Evaluation / inference CLI (reference tools/test.py + dist_test.sh
counterpart): run detection over a dataset, export results (nuScenes JSON /
AV2 feather), and optionally compute metrics with the built-in evaluator.

Usage:
  python tools/test.py --config CONFIG --checkpoint CKPT \
      --info-pkl data/nuscenes_infos_val.pkl --data-root data/nuscenes \
      --out results/dets.json
  python tools/test.py --synthetic    # smoke inference on the synthetic scene
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
    p.add_argument("--config")
    p.add_argument("--checkpoint")
    p.add_argument("--info-pkl")
    p.add_argument("--data-root")
    p.add_argument("--out", default="results/detections.json")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--eval", action="store_true", help="run the built-in evaluator")
    p.add_argument("--eval-protocol", default="nuscenes", choices=["nuscenes", "av2"],
                   help="nuScenes mAP/NDS or AV2 AP/CDS")
    p.add_argument("--max-samples", type=int, default=0)
    p.add_argument("--model", default="fsd", choices=["fsd", "fsd2", "fsf"])
    p.add_argument("--tiny", action="store_true",
                   help="use the tiny test config instead of the file config (CI)")
    p.add_argument("--mask-dir", help="pre-computed 2D instance masks (FSF mode)")
    p.add_argument("--mask-downsample", type=int, default=2)
    p.add_argument("--img-h", type=int, default=900)
    p.add_argument("--img-w", type=int, default=1600)
    # test-time augmentation (MyMultiScaleFlipAug3D)
    p.add_argument("--tta", action="store_true",
                   help="flip/rotate/scale TTA fused with rotated NMS")
    p.add_argument("--tta-rotations", default="0",
                   help="comma-separated yaw rotations in radians")
    p.add_argument("--tta-scales", default="1.0")
    p.add_argument("--tta-no-flip", action="store_true")
    # debug visualization dumps (reference hooks gate on vis_dir:
    # frustum_assigner.py:171-232, frustum_cluster_head.py:325-366)
    p.add_argument("--vis-dir", help="write per-sample BEV (+camera) debug PNGs")
    p.add_argument("--vis-max", type=int, default=8,
                   help="max samples to visualize")
    # multi-host gather (reference tools/test.py gpu_collect / tmpdir)
    p.add_argument("--tmpdir", help="shard-file collect dir for multi-host eval")
    p.add_argument("--cpu", action="store_true", help="force host CPU backend")
    return p.parse_args()




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
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fullysparsefusion_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from fullysparsefusion_tpu.config import tiny_fsd_config
    from fullysparsefusion_tpu.models.fsd import SingleStageFSD

    if args.synthetic:
        from fixtures import make_scene

        cfg = tiny_fsd_config()
        model = _build_lidar_model(args, cfg)
        pb, gt = make_scene(seed=0, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
        vars_ = jax.jit(
            lambda k: model.init(
                k, pb, 2, None, False, method=lambda m, *a, **kw: m(*a, **kw)
            )
        )(jax.random.key(0))
        fwd = jax.jit(lambda pb: model.apply(vars_, pb, 2, None, False))
        out = fwd(pb)
        res = model.apply(vars_, out, 2, method=type(model).get_bboxes)
        n = int(res.valid.sum())
        print(json.dumps({"mode": "synthetic", "detections": n}))
        return

    assert (args.config or args.tiny) and args.info_pkl and args.data_root
    from fullysparsefusion_tpu.config_compat import load_fsf_config
    from fullysparsefusion_tpu.data.nuscenes import NuScenesReader
    from fullysparsefusion_tpu.train.checkpoint import load_model_vars
    from fullysparsefusion_tpu.utils.containers import PointBatch
    from fullysparsefusion_tpu.eval.detection import DetectionRecord, evaluate_detections
    from fullysparsefusion_tpu.data.pipelines import collate_scene

    use_fsf = args.model == "fsf"
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
    reader = NuScenesReader(
        info_path=args.info_pkl, data_root=args.data_root,
        class_names=cfg.class_names, training=False, with_cbgs=False,
    )

    ds = args.mask_downsample

    def build_batch(i):
        s = reader.sample(i, augment=False)
        batch = collate_scene([s], cfg.caps.points, cfg.caps.max_gt)
        pts = batch["points"]
        if use_fsf:
            lidar2img = s["lidar2img"]
            assert lidar2img is not None, "info pkl lacks lidar2img matrices"
            l2i = np.asarray(lidar2img, np.float32).copy()
            # camera count comes from the data, not the config
            masks, anno = load_sample_masks(
                args.mask_dir, s["token"], l2i.shape[0], cfg.num_classes,
                (args.img_h, args.img_w), downsample=ds,
            )
            l2i[:, :2] /= ds  # masks are downsampled
            from fullysparsefusion_tpu.data.masks import pack_mask_scores

            cam = CameraData.build(
                pack_mask_scores(masks, anno)[None], anno[None], l2i[None])
        else:
            cam = None
        pb = PointBatch(
            points=jnp.asarray(pts),
            batch_idx=jnp.asarray(batch["batch_idx"]),
            valid=jnp.asarray(batch["valid"]),
        )
        return s, pb, cam

    s0, pb0, cam0 = build_batch(0)
    if use_fsf:
        vars_ = jax.jit(
            lambda k: model.init(
                k, pb0, cam0, 1, None, None, False,
                method=lambda m, *a, **kw: m(*a, **kw),
            )
        )(jax.random.key(0))
    else:
        vars_ = jax.jit(
            lambda k: model.init(
                k, pb0, 1, None, False, method=lambda m, *a, **kw: m(*a, **kw)
            )
        )(jax.random.key(0))
    if args.checkpoint:
        vars_ = load_model_vars(args.checkpoint, vars_)

    if use_fsf:
        fwd = jax.jit(lambda v, pb, cam: model.apply(v, pb, cam, 1, None, None, False))
    else:
        fwd = jax.jit(lambda v, pb: model.apply(v, pb, 1, None, False))

    def infer_once(pb, cam):
        if use_fsf:
            out = fwd(vars_, pb, cam)
            res = model.apply(vars_, out, 1, method=type(model).get_bboxes)
        else:
            out = fwd(vars_, pb)
            res = model.apply(vars_, out, 1, method=type(model).get_bboxes)
        v = np.asarray(res.valid[0])
        return (np.asarray(res.boxes[0])[v], np.asarray(res.scores[0])[v],
                np.asarray(res.labels[0])[v])

    tta_variants = None
    if args.tta:
        from fullysparsefusion_tpu.data.tta import tta_grid, run_tta
        from fullysparsefusion_tpu.ops.nms import multiclass_nms_bev

        tta_variants = tta_grid(
            scales=[float(x) for x in args.tta_scales.split(",")],
            rotations=[float(x) for x in args.tta_rotations.split(",")],
            flip_horizontal=not args.tta_no_flip,
            flip_vertical=not args.tta_no_flip,
        )
        print(f"TTA over {len(tta_variants)} variants")

    def infer_sample(s, pb, cam):
        if tta_variants is None:
            return infer_once(pb, cam)
        # re-collate per variant: TTA transforms the live channels only (the
        # saved no-aug tail keeps camera projection valid — SaveNoAugPoints)
        raw = s["points"]
        live, tail = raw[:, :-3], raw[:, -3:]

        def one(aug_live):
            pts = np.concatenate([aug_live, tail], 1)
            batch = collate_scene(
                [dict(s, points=pts)], cfg.caps.points, cfg.caps.max_gt
            )
            pb_v = PointBatch(
                points=jnp.asarray(batch["points"]),
                batch_idx=jnp.asarray(batch["batch_idx"]),
                valid=jnp.asarray(batch["valid"]),
            )
            return infer_once(pb_v, cam)

        boxes, scores, labels = run_tta(live, tta_variants, one)
        if not len(boxes):
            return boxes, scores, labels
        # fuse the union with per-class rotated NMS on device
        nc = len(cfg.class_names)
        smat = np.zeros((len(boxes), nc), np.float32)
        smat[np.arange(len(boxes)), labels] = scores
        res = multiclass_nms_bev(
            jnp.asarray(boxes), jnp.asarray(smat),
            jnp.ones(len(boxes), bool), cfg.head.nms_thr, cfg.head.score_thr,
            cfg.head.max_num,
        )
        v = np.asarray(res.valid)
        return (np.asarray(res.boxes)[v], np.asarray(res.scores)[v],
                np.asarray(res.labels)[v])

    n_vis = 0

    def maybe_visualize(s, pb, cam, boxes, scores):
        nonlocal n_vis
        if not args.vis_dir or n_vis >= args.vis_max:
            return
        from fullysparsefusion_tpu.utils.visualize import (
            dump_bev, dump_camera_assignment,
        )

        v = np.asarray(pb.valid)
        dump_bev(
            os.path.join(args.vis_dir, f"{s['token']}_bev.png"),
            np.asarray(pb.points)[:, :3], point_valid=v,
            gt_boxes=s.get("gt_boxes"), pred_boxes=boxes, pred_scores=scores,
            title=str(s["token"]),
        )
        if cam is not None:
            dump_camera_assignment(
                os.path.join(args.vis_dir, f"{s['token']}_cam0.png"),
                np.asarray(cam.masks).reshape(
                    -1, cam.num_cams, cam.img_h, cam.img_w,
                    cam.num_cls)[0, 0],
                title=f"{s['token']} cam0 masks",
            )
        n_vis += 1

    records, all_results = [], []
    n_total = min(len(reader), args.max_samples) if args.max_samples else len(reader)
    # multi-host: each process owns idx % world (reference multi_gpu_test)
    from fullysparsefusion_tpu.parallel.eval import (
        shard_indices, write_shard_results, merge_shard_results,
    )
    own = shard_indices(n_total)
    t0 = time.time()
    for i in own.tolist():
        s, pb, cam = build_batch(i)
        boxes, scores, labels = infer_sample(s, pb, cam)
        maybe_visualize(s, pb, cam, boxes, scores)
        all_results.append(
            dict(token=s["token"], boxes=boxes.tolist(), scores=scores.tolist(),
                 labels=labels.tolist())
        )
        if args.eval:
            from fullysparsefusion_tpu.eval.detection import default_attributes

            # mmdet3d velocity heuristic supplies prediction attributes; AAE
            # joins NDS only when the dataset pickles carry GT attribute ids
            gt_attrs = s.get("gt_attrs")
            attrs = (default_attributes(boxes, labels, cfg.class_names)
                     if gt_attrs is not None else None)
            records.append(
                DetectionRecord(
                    boxes=boxes, scores=scores, labels=labels,
                    gt_boxes=s["gt_boxes"], gt_labels=s["gt_labels"],
                    attrs=attrs,
                    gt_attrs=(np.asarray(gt_attrs, np.int32)
                              if gt_attrs is not None else None),
                )
            )
    dt = (time.time() - t0) / max(len(own), 1)
    if args.tmpdir:
        write_shard_results(all_results, args.tmpdir)
        if jax.process_index() == 0:
            all_results = merge_shard_results(args.tmpdir)
        else:
            return
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(all_results, f)
    print(json.dumps({"samples": len(all_results), "sec_per_sample": round(dt, 3),
                      "out": args.out}))
    if args.eval:
        if args.eval_protocol == "av2":
            from fullysparsefusion_tpu.eval.av2_detection import evaluate_av2

            metrics = evaluate_av2(records, len(cfg.class_names), cfg.class_names)
        else:
            metrics = evaluate_detections(records, len(cfg.class_names), cfg.class_names)
        print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
