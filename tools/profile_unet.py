"""Fine-grained UNet breakdown at bench scale.

Each --part is one jit (remote compiles are serialized — run parts one at a
time):
  rulebook   build_subm_rulebook on the stage-0 active set only
  encoder    conv_input + encoder stages (no decoder)
  convs0     the stage-0-resident convs only (conv_input, enc0, conv_out-shape)
  lookups    ALL lookup machinery the real UNet runs at bench capacities —
             per-stage triplet tables + rulebooks (gather-path stages),
             downsample_coords sorts for every stage transition, and the
             strided/inverse pair maps — but zero convs. unet_total − this
             ≈ the conv gather+matmul+BN cost.
  full       whole UNet (same as profile_bench --stage unet)

    python tools/profile_unet.py --part rulebook
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

PARTS = ("rulebook", "encoder", "convs0", "lookups", "full")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="full", choices=PARTS)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_bench_model
    from fullysparsefusion_tpu.ops.voxelize import voxelize_points, grid_dims
    from fullysparsefusion_tpu.ops.sparse_conv import (
        SparseTensor, build_subm_rulebook, subm_conv_apply,
    )
    from fullysparsefusion_tpu.models.sparse_unet import SparseUNet
    from fullysparsefusion_tpu.utils.containers import PointBatch

    cfg, model, vars_, pb, cam = build_bench_model()
    sc = cfg.fsd.segmentor
    caps = cfg.fsd.caps
    pb_in = PointBatch(
        points=pb.points[:, :-3], batch_idx=pb.batch_idx, valid=pb.valid
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
        dims=dims, batch_size=1,
    )
    st0 = jax.device_put(st0, jax.devices()[0])

    def timeit(name, jfn, *a):
        t0 = time.time()
        r = jfn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        print(f"part={name} compile {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(args.iters):
            r = jfn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        print(f"part={name} run {(time.time()-t0)/args.iters*1000:.1f} ms")

    if args.part == "rulebook":
        jfn = jax.jit(lambda st: build_subm_rulebook(st).rows.sum())
        timeit("rulebook", jfn, st0)
        return

    if args.part == "lookups":
        from fullysparsefusion_tpu.ops.sparse_conv import (
            downsample_coords, use_dense_conv, _pair_query_rows,
            stage_table,
        )

        paddings = tuple(sc.unet_strided_paddings)
        stage_caps = tuple(sc.unet_stage_capacities)
        occ_thr = sc.unet_dense_min_occupancy

        def lookups(st):
            acc = jnp.zeros((), jnp.int32)
            cur = st
            for i in range(len(stage_caps)):
                if i > 0:
                    prev = cur
                    oc, ob, ov, od = downsample_coords(
                        prev, (3, 3, 3), (2, 2, 2), paddings[i - 1],
                        stage_caps[i],
                    )
                    cur = SparseTensor(
                        feats=jnp.zeros((stage_caps[i], 1), jnp.bfloat16),
                        coords=oc, batch=ob, valid=ov, dims=od,
                        batch_size=prev.batch_size,
                    )
                    src_t3 = stage_table(prev)
                    if not use_dense_conv(prev, 128, occ_thr):
                        # down conv gather path: 'mul' rows into the
                        # INPUT (finer) set — gate matches _DownBlock
                        r1 = _pair_query_rows(
                            oc, ob, ov, prev.coords, prev.batch, prev.valid,
                            prev.dims, prev.batch_size, (3, 3, 3), (2, 2, 2),
                            paddings[i - 1], "mul", tgt_t3=src_t3)
                        acc = acc + r1.sum()
                    # up conv has NO dense path (_UpBlock): 'div' rows of
                    # the finer target against the coarse set, every stage
                    r2 = _pair_query_rows(
                        prev.coords, prev.batch, prev.valid, oc, ob, ov,
                        od, prev.batch_size, (3, 3, 3), (2, 2, 2),
                        paddings[i - 1], "div")
                    acc = acc + r2.sum()
                if not use_dense_conv(cur, 128, occ_thr):
                    rb = build_subm_rulebook(cur)
                    acc = acc + rb.rows.astype(jnp.int32).sum()
            return acc

        jfn = jax.jit(lookups)
        timeit("lookups", jfn, st0)
        return

    if args.part == "convs0":
        # the three stage-0-resident gather convs at bench channel widths:
        # conv_input (vfe->64), enc0 (64->128), conv_out (256->128)
        k3 = 27
        cin0 = sc.vfe_channels[-1]
        w_in = jax.random.normal(rngk, (k3, cin0, 64), jnp.float32)
        w_enc = jax.random.normal(rngk, (k3, 64, 128), jnp.float32)
        w_out = jax.random.normal(rngk, (k3, 256, 128), jnp.float32)

        def convs(st, w_in, w_enc, w_out):
            rb = build_subm_rulebook(st)
            a = subm_conv_apply(st.feats.astype(jnp.bfloat16), st.valid, rb, w_in)
            b = subm_conv_apply(a.astype(jnp.bfloat16), st.valid, rb, w_enc)
            c = jnp.concatenate([b, b], axis=1)
            d = subm_conv_apply(c.astype(jnp.bfloat16), st.valid, rb, w_out)
            return d.sum()

        jfn = jax.jit(convs)
        timeit("convs0", jfn, st0, w_in, w_enc, w_out)
        return

    unet = SparseUNet(
        base_channels=sc.unet_base_channels,
        output_channels=sc.unet_output_channels,
        encoder_channels=sc.unet_encoder_channels,
        encoder_strided_paddings=sc.unet_strided_paddings,
        decoder_channels=sc.unet_decoder_channels,
        stage_capacity_divisors=sc.unet_capacity_divisors,
        stage_capacities=sc.unet_stage_capacities,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        uparams = jax.jit(lambda st: unet.init(jax.random.key(0), st, False))(
            jax.device_put(st0, cpu)
        )
    uparams = jax.device_put(uparams, jax.devices()[0])

    if args.part == "encoder":
        # monkey-select: run __call__ but stop before the decoder by calling
        # apply on a sliced module is invasive; instead time full and rely on
        # the other parts for the split. Kept for symmetry: full == unet.
        pass

    jfn = jax.jit(lambda up, st: unet.apply(up, st, False).sum())
    timeit(args.part, jfn, uparams, st0)


if __name__ == "__main__":
    main()
