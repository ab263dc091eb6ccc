"""Stage-level timing of the flagship FSF forward at bench scale.

One jit per invocation (remote compiles are serialized and slow) — pick the
stage via --stage; cumulative stages measure ①..stage so the per-phase cost
is the difference between consecutive stages.

    python tools/profile_bench.py --stage seg
    python tools/profile_bench.py --stage full
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

STAGES = ("voxvfe", "unet", "core", "seg", "frustum", "fsd", "fusion", "full")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="full", choices=STAGES)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dense-occ", type=float, default=0.15,
                    help="unet dense-conv occupancy threshold (unet stage only)")
    args = ap.parse_args()

    import jax
    from bench import build_bench_model

    cfg, model, vars_, pb, cam = build_bench_model()
    batch = int(os.environ.get("FSF_BENCH_BATCH", 1))

    if args.stage in ("voxvfe", "unet"):
        import jax.numpy as jnp
        from fullysparsefusion_tpu.ops.voxelize import voxelize_points, grid_dims
        from fullysparsefusion_tpu.ops.sparse_conv import SparseTensor
        from fullysparsefusion_tpu.models.vfe import DynamicScatterVFE
        from fullysparsefusion_tpu.models.sparse_unet import SparseUNet
        from fullysparsefusion_tpu.utils.containers import PointBatch

        sc = cfg.fsd.segmentor
        caps = cfg.fsd.caps
        pb_in = PointBatch(
            points=pb.points[:, :-3], batch_idx=pb.batch_idx, valid=pb.valid
        )
        vfe = DynamicScatterVFE(
            feat_channels=tuple(sc.vfe_channels), voxel_size=sc.voxel_size,
            pc_range_min=tuple(sc.point_cloud_range[:3]),
        )

        def voxvfe(pb_in):
            seg, _, vb, vc = voxelize_points(
                pb_in.xyz, pb_in.batch_idx, pb_in.valid, sc.voxel_size,
                sc.point_cloud_range, caps.voxels,
            )
            pv = pb_in.valid & (seg.seg_id < caps.voxels)
            params = vfe.init(jax.random.key(0), pb_in.points, seg, vc, pv, False)
            return vfe.apply(params, pb_in.points, seg, vc, pv, False)

        if args.stage == "voxvfe":
            jfn = jax.jit(lambda pb_in: voxvfe(pb_in).sum())
            t0 = time.time()
            np.asarray(jfn(pb_in))
            print(f"stage=voxvfe compile {time.time()-t0:.1f}s")
            t0 = time.time()
            for _ in range(args.iters):
                r = jfn(pb_in)
            np.asarray(r)
            print(f"stage=voxvfe run {(time.time()-t0)/args.iters*1000:.1f} ms")
            return

        # unet over the REAL voxelized bench-scene active set
        unet = SparseUNet(
            base_channels=sc.unet_base_channels,
            output_channels=sc.unet_output_channels,
            encoder_channels=sc.unet_encoder_channels,
            encoder_strided_paddings=sc.unet_strided_paddings,
            decoder_channels=sc.unet_decoder_channels,
            stage_capacity_divisors=sc.unet_capacity_divisors,
            stage_capacities=sc.unet_stage_capacities,
            dense_min_occupancy=args.dense_occ,
            window_conv=sc.unet_window_conv,
            window_conv_train=sc.unet_window_conv_train,
        )
        seg, _, vb, vc = jax.jit(lambda p: voxelize_points(
            p.xyz, p.batch_idx, p.valid, sc.voxel_size, sc.point_cloud_range,
            caps.voxels,
        ))(pb_in)
        dims = grid_dims(sc.voxel_size, sc.point_cloud_range)
        rngk = jax.random.key(0)
        feats = jax.random.normal(rngk, (caps.voxels, sc.vfe_channels[-1]), jnp.float32)
        st0 = SparseTensor(
            feats=feats, coords=vc, batch=vb, valid=seg.seg_valid,
            dims=dims, batch_size=batch,
        )
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            uparams = jax.jit(lambda st: unet.init(jax.random.key(0), st, False))(
                jax.device_put(st0, cpu)
            )
        uparams = jax.device_put(uparams, jax.devices()[0])
        st0 = jax.device_put(st0, jax.devices()[0])
        jfn = jax.jit(lambda up, st: unet.apply(up, st, False).sum())
        t0 = time.time()
        np.asarray(jfn(uparams, st0))
        print(f"stage=unet compile {time.time()-t0:.1f}s  "
              f"(active={int(np.asarray(seg.seg_valid.sum()))})")
        t0 = time.time()
        for _ in range(args.iters):
            r = jfn(uparams, st0)
        np.asarray(r)
        print(f"stage=unet run {(time.time()-t0)/args.iters*1000:.1f} ms")
        return

    until = None if args.stage == "full" else args.stage

    def fn(vars_, pb, cam):
        out = model.apply(
            vars_, pb, cam, batch, None, None, False, 0.0, 1.0, until,
            method=lambda m, *a: m(*a),
        )
        if until == "core":
            return out["seg_feats"]
        if until == "seg":
            return out["seg_out"]["seg_logits"]
        if until == "frustum":
            return out["frustum"]["cls_logits"][0]
        if until in ("fsd", "fusion"):
            return out["fsd"]["cls_logits"]
        return out["final"]["cls_logits"]

    jfn = jax.jit(fn)
    t0 = time.time()
    np.asarray(jfn(vars_, pb, cam)[:1])
    print(f"stage={args.stage} compile {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(args.iters):
        r = jfn(vars_, pb, cam)
    np.asarray(r[:1])  # host readback — block_until_ready doesn't sync the tunnel
    print(f"stage={args.stage} run {(time.time()-t0)/args.iters*1000:.1f} ms")


if __name__ == "__main__":
    main()
