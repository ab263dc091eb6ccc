"""Single-stage timing of the flagship forward (one jit per invocation —
remote compiles are slow, so pick the stage via --stage)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="full",
                    choices=["seg", "fg", "query", "full", "voxvfe", "unet"])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    from bench import build_bench_model

    cfg, model, vars_, pb = build_bench_model()

    if args.stage in ("voxvfe", "unet"):
        import jax.numpy as jnp
        from fullysparsefusion_tpu.ops.voxelize import voxelize_points, grid_dims
        from fullysparsefusion_tpu.ops.sparse_conv import SparseTensor
        from fullysparsefusion_tpu.models.vfe import DynamicScatterVFE
        from fullysparsefusion_tpu.models.sparse_unet import SparseUNet

        sc = cfg.segmentor
        vfe = DynamicScatterVFE(
            feat_channels=tuple(sc.vfe_channels), voxel_size=sc.voxel_size,
            pc_range_min=tuple(sc.point_cloud_range[:3]),
        )
        unet = SparseUNet(
            base_channels=sc.unet_base_channels,
            output_channels=sc.unet_output_channels,
            encoder_channels=sc.unet_encoder_channels,
            encoder_strided_paddings=sc.unet_strided_paddings,
            decoder_channels=sc.unet_decoder_channels,
            stage_capacity_divisors=sc.unet_capacity_divisors,
        )

        def voxvfe(pb):
            seg, _, vb, vc = voxelize_points(
                pb.xyz, pb.batch_idx, pb.valid, sc.voxel_size,
                sc.point_cloud_range, cfg.caps.voxels,
            )
            pv = pb.valid & (seg.seg_id < cfg.caps.voxels)
            params = vfe.init(jax.random.key(0), pb.points, seg, vc, pv, False)
            return vfe.apply(params, pb.points, seg, vc, pv, False)

        if args.stage == "voxvfe":
            fn = voxvfe
        else:
            import numpy as _np
            rng = _np.random.default_rng(0)
            cap = cfg.caps.voxels
            dims = grid_dims(sc.voxel_size, sc.point_cloud_range)
            lin = rng.choice(dims[0] * dims[1] * min(dims[2], 8), cap, replace=False)
            coords = _np.stack(
                [lin % dims[0], (lin // dims[0]) % dims[1], lin // (dims[0] * dims[1])], 1
            ).astype(_np.int32)
            st0 = SparseTensor(
                feats=jnp.asarray(rng.normal(size=(cap, sc.vfe_channels[-1])).astype(_np.float32)),
                coords=jnp.asarray(coords),
                batch=jnp.zeros(cap, jnp.int32),
                valid=jnp.ones(cap, bool),
                dims=dims, batch_size=1,
            )
            uparams = unet.init(jax.random.key(0), st0, False)

            def fn(st):
                return unet.apply(uparams, st, False)

            pb = st0  # pass the sparse tensor as the jitted argument

    elif args.stage == "seg":
        fn = lambda pb: model.apply(
            vars_, pb, 1, False, method=lambda m, pb, bs, tr: m.segmentor(pb, tr, bs)
        )["seg_logits"]
    elif args.stage == "fg":
        def fn(pb):
            seg_out = model.apply(
                vars_, pb, 1, False, method=lambda m, pb, bs, tr: m.segmentor(pb, tr, bs)
            )
            fg, cseg, cxyz, cb, cg, cv = model.apply(
                vars_, pb, seg_out, 1,
                method=lambda m, pb, so, bs: m.query_branch.extract_foreground(pb, so, bs),
            )
            return cxyz
    elif args.stage == "query":
        def fn(pb):
            seg_out = model.apply(
                vars_, pb, 1, False, method=lambda m, pb, bs, tr: m.segmentor(pb, tr, bs)
            )
            return model.apply(
                vars_, pb, seg_out, 1, False,
                method=lambda m, pb, so, bs, tr: m.query_branch(pb, so, bs, tr),
            )["cls_logits"]
    else:
        fn = lambda pb: model.apply(vars_, pb, 1, None, False)["cls_logits"]

    jfn = jax.jit(fn)
    t0 = time.time()
    np.asarray(jfn(pb))
    print(f"stage={args.stage} compile {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(args.iters):
        r = jfn(pb)
    jax.block_until_ready(r)
    np.asarray(r[:1])
    print(f"stage={args.stage} run {(time.time()-t0)/args.iters*1000:.1f} ms")


if __name__ == "__main__":
    main()
