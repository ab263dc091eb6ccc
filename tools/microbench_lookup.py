"""A/B bench of the UNet lookup primitives at real bench shapes.

Variants (each its own jit, forced via the sparse_conv gate globals):
  rb_triplet / rb_mid      27-tap subm rulebook, stage-0 set
  ds_sorted                downsample_coords stage 0 -> 1
  mul_triplet / mul_mid    strided pair rows (41k queries -> s0)
  div_triplet / div_mid    inverse pair rows (57k queries -> s1)

    python tools/microbench_lookup.py --iters 20

MEASURED 2026-08-19 (v5e, bench shapes) — negative results, don't retry:
  - [cells, 9] xy-block table (27-tap query in 3 gathers): rb 8.65 ms vs
    5.06 triplet, mul 7.88 vs ~4.7 — the 3x table-build writes + 18 B rows
    cost more than the saved gathers (see sparse_conv.stage_table).
  - sort-free dense unique in downsample_coords (mark -> prefix-sum ->
    invert over the dense out grid): 11.62 ms vs 11.32 sorted — the cumsum
    over the full cell table out-costs the 8*cap-key argsort.
Baselines the same day: rb_triplet 5.06, rb_mid 13.01, ds_sorted 11.32.
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import fullysparsefusion_tpu.ops.sparse_conv as sc
    from fullysparsefusion_tpu.ops.sparse_conv import (
        SparseTensor, build_subm_rulebook, downsample_coords,
        _pair_query_rows,
    )
    from bench import build_bench_model, _enable_compile_cache
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
    st0 = SparseTensor(
        feats=jnp.zeros((caps.voxels, 1), jnp.bfloat16), coords=vc, batch=vb,
        valid=seg.seg_valid, dims=dims, batch_size=1,
    )
    st0 = jax.device_put(st0, jax.devices()[0])
    s1_cap = int(sgc.unet_stage_capacities[1])
    pad1 = tuple(sgc.unet_strided_paddings[0])

    # stage-1 active set (fixed host-side copy so each variant only times
    # its own op)
    oc, ob, ov, od = jax.jit(lambda st: downsample_coords(
        st, (3, 3, 3), (2, 2, 2), pad1, s1_cap))(st0)
    st1 = SparseTensor(
        feats=jnp.zeros((s1_cap, 1), jnp.bfloat16),
        coords=jax.device_put(oc), batch=jax.device_put(ob),
        valid=jax.device_put(ov), dims=od, batch_size=1,
    )

    def timeit(name, fn, *a):
        t0 = time.time()
        r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        c = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            r = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        print(f"{name:12s} {(time.time()-t0)/args.iters*1000:7.2f} ms  "
              f"(compile {c:.0f}s)")

    def forced(gates):
        """Context manager flipping the sc tier gates."""
        import contextlib

        @contextlib.contextmanager
        def cm():
            orig = sc._use_triplets, sc._use_dense, sc._use_dense_unique
            try:
                if "triplets" in gates:
                    sc._use_triplets = gates["triplets"]
                if "dense" in gates:
                    sc._use_dense = gates["dense"]
                if "dense_unique" in gates:
                    sc._use_dense_unique = gates["dense_unique"]
                yield
            finally:
                (sc._use_triplets, sc._use_dense,
                 sc._use_dense_unique) = orig
        return cm()

    off = lambda s: False

    # rulebooks on stage 0
    with forced({}):
        timeit("rb_triplet", jax.jit(
            lambda st: build_subm_rulebook(st).rows.astype(jnp.int32).sum()), st0)
    with forced({"triplets": off}):
        timeit("rb_mid", jax.jit(
            lambda st: build_subm_rulebook(st).rows.astype(jnp.int32).sum()), st0)

    # downsample stage 0 -> 1: sorted argsort-unique vs sort-free dense
    # unique (mark grid -> MXU prefix sum, segment.unique_segments_dense)
    ds = lambda st: downsample_coords(st, (3, 3, 3), (2, 2, 2), pad1, s1_cap)[0].sum()
    uoff = lambda cells: False
    with forced({"dense_unique": uoff}):
        timeit("ds_sorted", jax.jit(ds), st0)
    with forced({}):
        timeit("ds_dense", jax.jit(ds), st0)

    # stage-0 voxelization (131k points -> 57k voxels over 10.5M cells)
    vox = lambda p, bs: voxelize_points(
        p.xyz, p.batch_idx, p.valid, sgc.voxel_size, sgc.point_cloud_range,
        caps.voxels, batch_size=bs,
    )[0].seg_id.sum()
    timeit("vox_sorted", jax.jit(lambda p: vox(p, 0)), pb_in)
    timeit("vox_dense", jax.jit(lambda p: vox(p, 1)), pb_in)

    # pair rows: mul (41k queries into stage-0 set), div (57k into stage-1)
    mul = lambda st1_, st0_: _pair_query_rows(
        st1_.coords, st1_.batch, st1_.valid, st0_.coords, st0_.batch,
        st0_.valid, st0_.dims, 1, (3, 3, 3), (2, 2, 2), pad1, "mul").sum()
    div = lambda st0_, st1_: _pair_query_rows(
        st0_.coords, st0_.batch, st0_.valid, st1_.coords, st1_.batch,
        st1_.valid, st1_.dims, 1, (3, 3, 3), (2, 2, 2), pad1, "div").sum()
    with forced({}):
        timeit("mul_triplet", jax.jit(mul), st1, st0)
        timeit("div_triplet", jax.jit(div), st0, st1)
    with forced({"triplets": off}):
        timeit("mul_mid", jax.jit(mul), st1, st0)
        timeit("div_mid", jax.jit(div), st0, st1)


if __name__ == "__main__":
    main()
