"""A/B bench: XLA while_loop CCL vs the Pallas fixed-sweep kernel.

Resolves VERDICT r2 weak-item 3: `ops/pallas_kernels.ccl_sweeps_pallas` has
zero callers — either it wins on the real TPU at production shapes (then wire
it into ops/ccl.py) or it loses (then delete it and record the negative).

Production shape: G = num_groups (nuScenes FSF: 1 task of 10 classes in
len(cluster_voxel_sizes) groups), N = caps.cluster_voxels_per_group (1024 at
bench scale). Run on the real TPU:

    python tools/microbench_ccl.py --groups 6 --n 1024
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=6)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--sweeps", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fullysparsefusion_tpu.ops.ccl import connected_components_bev_batched
    from fullysparsefusion_tpu.ops.pallas_kernels import ccl_sweeps_pallas
    from fullysparsefusion_tpu.ops.segment import unique_segments
    from fullysparsefusion_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    g, n = args.groups, args.n
    rng = np.random.default_rng(0)
    # clustered points: ~n/8 cluster centers, sigma ~0.4 of the unit
    # threshold — realistic component structure (many small components)
    centers = rng.uniform(0, 80, size=(g, max(n // 8, 1), 2))
    pick = rng.integers(0, max(n // 8, 1), size=(g, n))
    xy = centers[np.arange(g)[:, None], pick] + rng.normal(0, 0.4, size=(g, n, 2))
    batch = np.zeros((g, n), np.int32)
    valid = rng.uniform(size=(g, n)) < 0.9

    xy_j = jnp.asarray(xy, jnp.float32)
    b_j = jnp.asarray(batch)
    v_j = jnp.asarray(valid)

    @jax.jit
    def xla_path(xy, b, v):
        return connected_components_bev_batched(xy, b, v)

    def _adj(xy, b, v):
        d2 = jnp.sum((xy[:, :, None, :] - xy[:, None, :, :]) ** 2, axis=-1)
        same = (b[:, :, None] == b[:, None, :]) & v[:, :, None] & v[:, None, :]
        adj = (d2 < 1.0) & same
        return adj | (jnp.eye(n, dtype=bool)[None] & v[:, :, None])

    @jax.jit
    def pallas_path(xy, b, v):
        adj = _adj(xy, b, v)
        roots = ccl_sweeps_pallas(adj, v, sweeps=args.sweeps)
        # same compact relabel as ops/ccl.py
        def relab(lab, vv):
            seg = unique_segments(lab, vv, n)
            return jnp.where(vv, seg.seg_id, -1).astype(jnp.int32)
        return jax.vmap(relab)(roots, v)

    def timeit(name, fn):
        t0 = time.time()
        r = fn(xy_j, b_j, v_j)
        np.asarray(r[:1, :1])
        print(f"{name} compile {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(args.iters):
            r = fn(xy_j, b_j, v_j)
        np.asarray(r[:1, :1])
        ms = (time.time() - t0) / args.iters * 1000
        print(f"{name} run {ms:.2f} ms")
        return np.asarray(r), ms

    r_x, ms_x = timeit("xla_while_loop", xla_path)
    r_p, ms_p = timeit("pallas_sweeps ", pallas_path)

    agree = (r_x == r_p).mean()
    print(f"label agreement: {agree * 100:.2f}%  "
          f"(exact parity expected when sweeps suffice)")
    print(f"winner: {'pallas' if ms_p < ms_x else 'xla'} "
          f"({min(ms_p, ms_x):.2f} vs {max(ms_p, ms_x):.2f} ms)")


if __name__ == "__main__":
    main()
