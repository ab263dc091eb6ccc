"""A/B the Pallas window-gather conv vs the XLA gather conv at real bench
shapes (stage-0 and stage-1 active sets of the bench scene).

Also reports the window-overflow probe (real hits outside the per-block dz
window) at each W — size W so overflow is 0.

    python tools/microbench_window_conv.py --iters 20
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--w", type=int, default=768)
    ap.add_argument("--blk", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_bench_model, _enable_compile_cache
    from fullysparsefusion_tpu.ops.sparse_conv import (
        SparseTensor, build_subm_rulebook, downsample_coords,
        _subm_conv_core,
    )
    from fullysparsefusion_tpu.ops.pallas_kernels import (
        window_gather_conv, window_starts,
    )
    from fullysparsefusion_tpu.ops.voxelize import voxelize_points, grid_dims
    from fullysparsefusion_tpu.utils.containers import PointBatch

    _enable_compile_cache()
    cfg, model, vars_, pb, cam = build_bench_model()
    sgc = cfg.fsd.segmentor
    caps = cfg.fsd.caps
    pb_in = PointBatch(
        points=pb.points[:, :-3], batch_idx=pb.batch_idx, valid=pb.valid
    )
    seg, _, vb, vc = jax.jit(lambda p: voxelize_points(
        p.xyz, p.batch_idx, p.valid, sgc.voxel_size, sgc.point_cloud_range,
        caps.voxels,
    ))(pb_in)
    dims = grid_dims(sgc.voxel_size, sgc.point_cloud_range)
    cap0 = caps.voxels

    def mk_st(cap, coords, bat, valid, dims, cin):
        return SparseTensor(
            feats=jnp.zeros((cap, cin), jnp.bfloat16), coords=coords,
            batch=bat, valid=valid, dims=dims, batch_size=1,
        )

    st0 = mk_st(cap0, vc, vb, seg.seg_valid, dims, 64)
    s1_cap = int(sgc.unet_stage_capacities[1])
    pad1 = tuple(sgc.unet_strided_paddings[0])
    oc, ob, ov, od = jax.jit(lambda st: downsample_coords(
        st, (3, 3, 3), (2, 2, 2), pad1, s1_cap))(st0)
    st1 = mk_st(s1_cap, oc, ob, ov, od, 128)

    rng = jax.random.key(0)

    def timeit(name, fn, *a):
        t0 = time.time()
        r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
        c = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0]).reshape(-1)[:1]
        print(f"{name:26s} {(time.time()-t0)/args.iters*1000:7.2f} ms  "
              f"(compile {c:.0f}s)", flush=True)

    for label, st, cin, cout in (("stage0 64->64", st0, 64, 64),
                                 ("stage1 128->128", st1, 128, 128)):
        rb = jax.jit(lambda st: build_subm_rulebook(st).rows)(st)
        rows = jax.device_put(rb)
        feats = jax.random.normal(rng, (st.capacity, cin), jnp.bfloat16)
        w = jax.random.normal(rng, (27, cin, cout), jnp.bfloat16) * 0.05
        valid = st.valid

        # overflow probe at this W
        _, _, oob = jax.jit(lambda r: window_starts(
            r, st.capacity, args.blk, args.w))(rows)
        nhits = int(np.asarray(jax.jit(
            lambda r: (r != st.capacity).sum())(rows)))
        print(f"{label}: window overflow {int(np.asarray(oob))} / "
              f"{nhits} hits at W={args.w}", flush=True)

        timeit(f"{label} xla_gather", jax.jit(
            lambda f, w_, v, r: _subm_conv_core(
                f, w_, v, r, "bfloat16", None).sum()),
            feats, w, valid, rows)
        timeit(f"{label} window_pallas", jax.jit(
            lambda f, r, w_: window_gather_conv(
                f, r, w_, w_size=args.w, blk=args.blk).sum()),
            feats, rows, w)


if __name__ == "__main__":
    main()
