"""AV2-config TPU bench (VERDICT r2 #4): FSF at Argoverse2 scale.

Runs the FSF forward with the ACTUAL reference AV2 config
(/root/reference/projects/configs/Argoverse2/FSF_AV2_config.py — [32, 2048,
2048] stage-0 grid, 26 classes, 7 ring cameras, code_size 8) on a synthetic
AV2-scale scene, and prints one JSON line like bench.py.

The [32,2048,2048] grid (134 M cells) exceeds the x-triplet budget, so
stage 0 exercises the MIDDLE lookup tier (dense O(1) row table, per-tap
scalar lookups — ops/sparse_conv.py) that tests/test_av2_scale.py pins.

    python tools/bench_av2.py            # bench (one JSON line)
    python tools/bench_av2.py --probe    # per-stage occupancy counts only
    python tools/bench_av2.py --train    # one train step (ms/step)
    python tools/bench_av2.py --unet     # UNet-only timing at AV2 scale
    FSF_DENSE_UNIQUE=1 ...               # A/B the sort-free dense unique
                                         # (AV2's downsample sorts are ~6x
                                         # nuScenes'; the r4 nuScenes
                                         # full-bench loss may invert here)
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

AV2_CFG = "/root/reference/projects/configs/Argoverse2/FSF_AV2_config.py"

# Stage occupancies measured via `--probe --caps 98304,163840,131072,98304,
# 32768` (generous caps so no stage clips) on the synthetic AV2 scene
# (extent 190 m, 2-sweep dual-lidar scan model, 131k points): TRUE counts
# [47281, 101419, 119199, 73537] — the active set GROWS with depth on the
# sparse [32,2048,2048] grid (3^3 dilation outruns the stride-2
# coarsening). Caps are ~1.2x measured, rounded up to a multiple of 256
# (window-conv eligibility); see docs/performance.md "AV2 scale".
STAGE_CAPS = (57344, 122880, 143360, 88576, 32768)


def build_av2_model(batch: int, probe: bool = False, stage_caps=None):
    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache
    _enable_compile_cache()

    if os.environ.get("FSF_DENSE_UNIQUE", "0") not in ("", "0"):
        # A/B toggle (same as bench.py): sort-free dense unique in
        # downsample_coords — a measured nuScenes loss, retested per scale
        from fullysparsefusion_tpu.ops import sparse_conv as _sc

        _sc.DENSE_UNIQUE_MAX_CELLS = 160 * 1024 * 1024

    from fullysparsefusion_tpu.config import Capacities
    from fullysparsefusion_tpu.config_compat import load_fsf_config
    from fullysparsefusion_tpu.models.fsf import FSF
    from fixtures import make_lidar_scene, make_camera_data, with_noaug_channels
    from fullysparsefusion_tpu.utils.containers import PointBatch

    if stage_caps is None:
        stage_caps = STAGE_CAPS
    caps = Capacities(
        points=131072 * batch, voxels=stage_caps[0] * batch,
        prevox=98304 * batch, fg_per_group=4096 * batch,
        cluster_voxels_per_group=1024 * batch, clusters=1024 * batch,
        max_gt=128, frustum_points=16384 * batch,
        frustum_objects=256 * batch, roi_points=32768 * batch,
        max_roi_points=512,
    )
    cfg = load_fsf_config(AV2_CFG, caps=caps)
    seg_kw = dict(
        unet_stage_capacities=tuple(c * batch for c in stage_caps),
        # AV2's 2-6x larger per-stage active sets straddle proportionally
        # more (tap-group, block) windows: the nuScenes resid=64 left most
        # convs on the exact-fallback cond. Measured UNet-only sweep (v5e
        # 2026-08-20): resid 64 = 264.5 ms, 512 = 236.8, 2048 = 297.1
        # (always-computed repair einsum dominates), window OFF = 306.4.
        unet_window_conv=(192, 256, 512 * batch, 1),
    )
    if os.environ.get("FSF_WINDOW_CONV"):
        # A/B knob (mirrors bench.py): AV2's 2-6x larger per-stage active
        # sets straddle far more (tap-group, block) windows than nuScenes,
        # so the nuScenes resid=64 may leave the window kernel permanently
        # cond-fallen-back — sweep W/resid here
        w = int(os.environ.get("FSF_WINDOW_CONV", "192") or 0)
        resid = int(os.environ.get("FSF_WINDOW_RESID", "64"))
        bwd = int(os.environ.get("FSF_WINDOW_BWD", "1") or 0)
        seg_kw["unet_window_conv"] = (w, 256, resid, bwd)
    seg = dataclasses.replace(cfg.fsd.segmentor, **seg_kw)
    cfg = dataclasses.replace(
        cfg, fsd=dataclasses.replace(cfg.fsd, segmentor=seg))

    per = 131072
    pbs, gts = [], []
    for b in range(batch):
        # AV2: ONE dual-lidar frame (no sweep accumulation,
        # AV2_dataloader.py:66-78) over ±204.8 m — model the larger area
        # with more rings/facades, 2 "sweeps" for the two stacked lidars
        pb_b, gt_b = make_lidar_scene(
            seed=b, n_cap=per, max_gt=caps.max_gt, n_boxes=48,
            num_classes=cfg.num_classes, point_dim=cfg.fsd.segmentor.point_dim,
            extent=190.0, n_rings=64, pts_per_ring=1600, n_walls=48, sweeps=2,
        )
        pbs.append(pb_b)
        gts.append(gt_b)
    pb = PointBatch(
        points=jnp.concatenate([p.points for p in pbs]),
        batch_idx=jnp.concatenate(
            [p.batch_idx + b for b, p in enumerate(pbs)]),
        valid=jnp.concatenate([p.valid for p in pbs]),
    )
    gt = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *gts)
    # 7 ring cameras, 1550x2048 portrait at 2x downsample
    cam = make_camera_data(
        pb, gt, batch_size=batch, num_cams=cfg.num_cams,
        num_classes=cfg.num_classes, img_h=1024, img_w=775, max_anno=250,
        fx=900.0,
    )
    pb = with_noaug_channels(pb)
    if probe:
        return cfg, None, None, pb, cam
    model = FSF(cfg=cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pb_cpu = jax.device_put(pb, cpu)
        cam_cpu = jax.device_put(cam, cpu)
        vars_ = jax.jit(
            lambda k, p, c: FSF(cfg=cfg).init(
                k, p, c, batch, None, None, False,
                method=lambda m, *a, **k_: m(*a, **k_),
            )
        )(jax.random.key(0), pb_cpu, cam_cpu)
    dev = jax.devices()[0]
    return (cfg, model, jax.device_put(vars_, dev),
            jax.device_put(pb, dev), jax.device_put(cam, dev))


def probe_occupancy(cfg, pb, batch):
    """Voxelize + the UNet's downsample chain only (no convs): per-stage
    active-voxel counts, for sizing STAGE_CAPS."""
    import jax
    import jax.numpy as jnp
    from fullysparsefusion_tpu.ops.voxelize import voxelize_points, grid_dims
    from fullysparsefusion_tpu.ops.sparse_conv import (
        SparseTensor, downsample_coords,
    )
    from fullysparsefusion_tpu.utils.containers import PointBatch

    sc = cfg.fsd.segmentor
    pb_in = PointBatch(
        points=pb.points[:, :-3], batch_idx=pb.batch_idx, valid=pb.valid)

    def counts(pb_in):
        seg, _, vb, vc = voxelize_points(
            pb_in.xyz, pb_in.batch_idx, pb_in.valid, sc.voxel_size,
            sc.point_cloud_range, cfg.fsd.caps.voxels,
        )
        dims = grid_dims(sc.voxel_size, sc.point_cloud_range)
        st = SparseTensor(
            feats=jnp.zeros((cfg.fsd.caps.voxels, 1), jnp.float32),
            coords=vc, batch=vb, valid=seg.seg_valid,
            dims=dims, batch_size=batch,
        )
        out = [st.valid.sum()]
        caps = sc.unet_stage_capacities
        for i, pad in enumerate(sc.unet_strided_paddings):
            oc, ob, ov, od = downsample_coords(
                st, (3, 3, 3), (2, 2, 2), pad, caps[i + 1])
            st = SparseTensor(
                feats=jnp.zeros((caps[i + 1], 1), jnp.float32),
                coords=oc, batch=ob, valid=ov, dims=od, batch_size=batch,
            )
            out.append(ov.sum())
        return jnp.stack(out)

    c = np.asarray(jax.jit(counts)(pb_in))
    print(json.dumps({
        "probe": "av2 per-stage active voxels",
        "stages": [int(x) for x in c],
        "caps": list(sc.unet_stage_capacities),
    }))


def bench_unet(cfg, vars_, pb, batch, iters):
    """UNet-only timing at AV2 scale (real VFE features via seg_core's
    voxelize+VFE prefix would need model surgery; random feats at the true
    active set exercise the same lookup/conv budget — matches
    tools/profile_unet.py methodology)."""
    import jax
    import jax.numpy as jnp
    from fullysparsefusion_tpu.ops.voxelize import voxelize_points, grid_dims
    from fullysparsefusion_tpu.ops.sparse_conv import SparseTensor
    from fullysparsefusion_tpu.models.sparse_unet import SparseUNet
    from fullysparsefusion_tpu.utils.containers import PointBatch

    sc = cfg.fsd.segmentor
    pb_in = PointBatch(
        points=pb.points[:, :-3], batch_idx=pb.batch_idx, valid=pb.valid)
    seg, _, vb, vc = jax.jit(lambda p: voxelize_points(
        p.xyz, p.batch_idx, p.valid, sc.voxel_size, sc.point_cloud_range,
        cfg.fsd.caps.voxels))(pb_in)
    dims = grid_dims(sc.voxel_size, sc.point_cloud_range)
    feats = jax.random.normal(
        jax.random.key(0), (cfg.fsd.caps.voxels, sc.vfe_channels[-1]),
        jnp.float32)
    st0 = SparseTensor(
        feats=feats, coords=vc, batch=vb, valid=seg.seg_valid,
        dims=dims, batch_size=batch)
    st0 = jax.device_put(st0, jax.devices()[0])
    unet = SparseUNet(
        base_channels=sc.unet_base_channels,
        output_channels=sc.unet_output_channels,
        encoder_channels=sc.unet_encoder_channels,
        encoder_strided_paddings=sc.unet_strided_paddings,
        decoder_channels=sc.unet_decoder_channels,
        stage_capacity_divisors=sc.unet_capacity_divisors,
        stage_capacities=sc.unet_stage_capacities,
        dense_min_occupancy=sc.unet_dense_min_occupancy,
        window_conv=sc.unet_window_conv,
    )
    import jax as _j
    cpu = _j.devices("cpu")[0]
    with _j.default_device(cpu):
        up = _j.jit(lambda st: unet.init(_j.random.key(0), st, False))(
            _j.device_put(st0, cpu))
    up = _j.device_put(up, _j.devices()[0])
    jfn = _j.jit(lambda u, st: unet.apply(u, st, False).sum())
    t0 = time.time()
    r = jfn(up, st0)
    np.asarray(r.reshape(-1)[:1])
    compile_s = time.time() - t0
    r = jfn(up, st0)
    np.asarray(r.reshape(-1)[:1])
    t0 = time.time()
    for _ in range(iters):
        r = jfn(up, st0)
    np.asarray(r.reshape(-1)[:1])
    print(json.dumps({
        "probe": "av2 unet-only", "unet_ms": round(
            (time.time() - t0) / iters * 1000, 2),
        "compile_s": round(compile_s, 1),
        "dense_unique": os.environ.get("FSF_DENSE_UNIQUE", "0"),
        "caps": list(cfg.fsd.segmentor.unet_stage_capacities)}))


def bench_train(cfg, model, vars_, pb, cam, batch, iters=5):
    """One full FSF train step at AV2 scale (mirrors bench.py's
    measure_train_step: 2 warmups then ``iters`` timed steps)."""
    import jax
    import jax.numpy as jnp
    from fixtures import make_scene
    from fullysparsefusion_tpu.parallel import (
        TrainState, make_optimizer, make_generic_train_step, fsf_forward_fn)

    _, gt = make_scene(
        seed=1, batch_size=batch, boxes_per_sample=48, pts_per_box=10,
        bg_points=100, n_cap=1024, max_gt=cfg.fsd.caps.max_gt, extent=150.0,
        num_classes=cfg.num_classes)
    gt = jax.device_put(gt, jax.devices()[0])
    tx = make_optimizer(base_lr=1e-4, total_steps=100)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        opt_state = tx.init(jax.device_put(vars_["params"], cpu))
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=vars_["params"], batch_stats=vars_["batch_stats"],
        opt_state=jax.device_put(opt_state, jax.devices()[0]))
    step = make_generic_train_step(fsf_forward_fn(model, batch), tx)
    t0 = time.time()
    state, loss, _ = step(state, pb, cam, gt, gt)
    np.asarray(loss)
    compile_s = time.time() - t0
    state, loss, _ = step(state, pb, cam, gt, gt)
    np.asarray(loss)
    t0 = time.time()
    for _ in range(iters):
        state, loss, _ = step(state, pb, cam, gt, gt)
    np.asarray(loss)
    print(json.dumps({
        "probe": "av2 train step",
        "train_ms_per_step": round((time.time() - t0) / iters * 1000, 1),
        "compile_s": round(compile_s, 1), "batch": batch,
        "loss": round(float(np.asarray(loss)), 3)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--unet", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--caps", type=str, default=None,
        help="comma-separated per-stage capacity override (probe with "
             "generous caps to measure TRUE occupancy, since saturated "
             "stages clip at their cap)")
    args = ap.parse_args()
    stage_caps = (tuple(int(x) for x in args.caps.split(","))
                  if args.caps else None)

    from bench import _wait_for_backend
    _wait_for_backend()
    import jax

    batch = int(os.environ.get("FSF_BENCH_BATCH", 1))
    if args.probe:
        cfg, _, _, pb, cam = build_av2_model(
            batch, probe=True, stage_caps=stage_caps)
        probe_occupancy(cfg, pb, batch)
        return

    cfg, model, vars_, pb, cam = build_av2_model(batch, stage_caps=stage_caps)

    if args.unet:
        bench_unet(cfg, vars_, pb, batch, args.iters)
        return
    if args.train:
        bench_train(cfg, model, vars_, pb, cam, batch)
        return

    @jax.jit
    def fwd(vars_, pb, cam):
        out = model.apply(vars_, pb, cam, batch, None, None, False)
        fin = out["final"]
        return fin["cls_logits"], fin["reg_preds"], fin["centers"], fin["q_valid"]

    t0 = time.time()
    r = fwd(vars_, pb, cam)
    np.asarray(r[0][:1])
    compile_s = time.time() - t0
    r = fwd(vars_, pb, cam)     # second call: one-time layout/dispatch cost
    np.asarray(r[0][:1])
    t0 = time.time()
    for _ in range(args.iters):
        out = fwd(vars_, pb, cam)
    np.asarray(out[0][:1])
    dt = (time.time() - t0) / args.iters
    print(json.dumps({
        "metric": "frames/sec/chip FSF AV2 val inference (reference config, synthetic scene+masks)",
        "value": round(batch / dt, 2),
        "unit": "frames/sec/chip",
        "detail": {
            "ms_per_frame": round(dt * 1000, 1),
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
            "grid": "32x2048x2048",
            "num_classes": cfg.num_classes,
            "num_cams": cfg.num_cams,
            "batch": batch,
        },
    }))


if __name__ == "__main__":
    main()
