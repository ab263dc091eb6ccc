"""A/B the Pallas window-gather conv vs the XLA gather conv at real bench
shapes (stage-0 and stage-1 active sets of the bench scene).

Sweeps the window size W: smaller W cuts the one-hot MXU cost linearly,
while the group-level residual pass absorbs the extra straddling
(tap-group, block) pairs — the probe prints both the out-of-window hit
count and the straddling-group count (the actual capacity condition, vs
the config's unet_window_conv resid) at each W.

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
    ap.add_argument("--w", type=int, nargs="*", default=[128, 192, 256, 384])
    ap.add_argument("--blk", type=int, default=256)
    ap.add_argument("--resid", type=int, default=512)
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
    # static dims: a traced dims leaf breaks build_subm_rulebook's
    # python-level lookup-tier choice (_use_triplets)
    od = tuple(int(x) for x in np.asarray(od))
    st1 = mk_st(s1_cap, oc, ob, ov, od, 128)

    rng = jax.random.key(0)

    def timeit(name, fn, *a):
        t0 = time.time()
        r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        c = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        print(f"{name:30s} {(time.time()-t0)/args.iters*1000:7.2f} ms  "
              f"(compile {c:.0f}s)", flush=True)

    def probe(label, rows, cap):
        nhits = int(np.asarray(jax.jit(lambda r: (r != cap).sum())(rows)))
        for wprobe in args.w:
            oob = jax.jit(lambda r, w=wprobe: window_starts(
                r, cap, args.blk, w)[2])(rows)
            o = np.asarray(oob)
            grp = o.reshape(9, 3, -1, args.blk).any(axis=(1, 3)).sum()
            print(f"{label}: W={wprobe}: {int(o.sum())} / {nhits} hits "
                  f"out-of-window in {int(grp)} straddling groups",
                  flush=True)

    def sweep(label, fn_xla, fn_win, *a):
        timeit(f"{label} xla_gather", jax.jit(fn_xla), *a)
        for w_size in args.w:
            timeit(f"{label} window W={w_size}",
                   jax.jit(lambda *b, w_size=w_size: fn_win(w_size, *b)), *a)

    for label, st, cin, cout in (("stage0 64->64", st0, 64, 64),
                                 ("stage1 128->128", st1, 128, 128)):
        rb = jax.jit(lambda st: build_subm_rulebook(st).rows)(st)
        rows = jax.device_put(rb)
        feats = jax.random.normal(rng, (st.capacity, cin), jnp.bfloat16)
        w = jax.random.normal(rng, (27, cin, cout), jnp.bfloat16) * 0.05
        valid = st.valid

        probe(label, rows, st.capacity)
        sweep(
            label,
            lambda f, r, w_: _subm_conv_core(
                f, w_, valid, r, None, "bfloat16", None).sum(),
            lambda w_size, f, r, w_: window_gather_conv(
                f, r, w_, w_size=w_size, blk=args.blk,
                resid=args.resid).sum(),
            feats, rows, w)

    # strided pair conv stage0 -> stage1 ('mul' rows into the input set)
    from fullysparsefusion_tpu.ops.sparse_conv import (
        _pair_query_rows, _gather_conv, _append_zero_row,
    )

    rows_s = jax.jit(lambda: _pair_query_rows(
        st1.coords, st1.batch, st1.valid, st0.coords, st0.batch, st0.valid,
        st0.dims, 1, (3, 3, 3), (2, 2, 2), pad1, "mul"))()
    feats0 = jax.random.normal(rng, (cap0, 64), jnp.bfloat16)
    ws = jax.random.normal(rng, (27, 64, 128), jnp.bfloat16) * 0.05
    probe("strided 64->128", rows_s, cap0)
    sweep(
        "strided 64->128",
        lambda f, r, w_: _gather_conv(_append_zero_row(f), r, w_).sum(),
        lambda w_size, f, r, w_: window_gather_conv(
            f, r, w_, w_size=w_size, blk=args.blk, resid=args.resid).sum(),
        feats0, rows_s, ws)


if __name__ == "__main__":
    main()
