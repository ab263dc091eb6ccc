"""A/B bench of segment-reduce strategies at VFE/FSD production shapes.

The model runs dozens of segment reduces (VFE, SIR blocks, pre-voxelize
means). They currently lower to XLA TPU scatter-adds/maxes over duplicate
indices (jax.ops.segment_*). Candidates:

  scatter      jax.ops.segment_sum / segment_max (current)
  sorted_sum   rows pre-sorted by segment (the unique_segments argsort is
               already paid): gather-to-sorted, f32 cumsum, boundary diff
  sorted_max   same layout, segmented max by log2 doubling passes
  resort_sum   ops.segment.sorted_unsorted_segment_sum (fresh argsort)

    python tools/microbench_segment.py --n 131072 --segs 57344 --ch 64
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--segs", type=int, default=57344)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fullysparsefusion_tpu.ops.segment import sorted_unsorted_segment_sum
    from fullysparsefusion_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    n, segs, ch = args.n, args.segs, args.ch
    rng = np.random.default_rng(0)
    seg_id = np.sort(rng.integers(0, segs, size=n)).astype(np.int32)
    perm = rng.permutation(n)
    seg_unsorted = seg_id[perm]                    # original-order ids
    order = np.argsort(perm, kind="stable")        # gather to sorted order
    feat = rng.normal(size=(n, ch)).astype(np.float32)

    # segment starts in sorted order: starts[s] = first sorted position of s
    starts = np.searchsorted(seg_id, np.arange(segs + 1))

    f_j = jnp.asarray(feat)
    sid_j = jnp.asarray(seg_unsorted)
    order_j = jnp.asarray(order.astype(np.int32))
    starts_j = jnp.asarray(starts.astype(np.int32))
    sid_sorted_j = jnp.asarray(seg_id)

    @jax.jit
    def scatter_sum(f, sid):
        return jax.ops.segment_sum(f, sid, num_segments=segs + 1)[:segs]

    @jax.jit
    def scatter_max(f, sid):
        return jax.ops.segment_max(f, sid, num_segments=segs + 1)[:segs]

    @jax.jit
    def sorted_sum(f, order, starts):
        fs = f[order].astype(jnp.float32)
        cs = jnp.concatenate([jnp.zeros((1, ch), jnp.float32),
                              jnp.cumsum(fs, axis=0)])
        return cs[starts[1:]] - cs[starts[:-1]]

    @jax.jit
    def sorted_max(f, order, sid_sorted, starts):
        fs = f[order]
        big_neg = jnp.finfo(fs.dtype).min
        k = 1
        while k < n:
            same = jnp.concatenate([
                jnp.zeros((k,), bool), sid_sorted[k:] == sid_sorted[:-k]])
            shifted = jnp.concatenate([
                jnp.full((k, ch), big_neg, fs.dtype), fs[:-k]])
            fs = jnp.where(same[:, None], jnp.maximum(fs, shifted), fs)
            k *= 2
        ends = jnp.clip(starts[1:] - 1, 0, n - 1)
        out = fs[ends]
        return jnp.where((starts[1:] > starts[:-1])[:, None], out, 0.0)

    @jax.jit
    def resort_sum(f, sid):
        return sorted_unsorted_segment_sum(f, sid, segs)

    ref = None

    def timeit(name, fn, *a):
        nonlocal ref
        t0 = time.time()
        r = fn(*a)
        np.asarray(r[:1, :1])
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            r = fn(*a)
        np.asarray(r[:1, :1])
        ms = (time.time() - t0) / args.iters * 1000
        print(f"{name:12s} {ms:7.2f} ms   (compile {compile_s:.1f}s)")
        return np.asarray(r)

    r1 = timeit("scatter_sum", scatter_sum, f_j, sid_j)
    r2 = timeit("sorted_sum", sorted_sum, f_j, order_j, starts_j)
    r3 = timeit("resort_sum", resort_sum, f_j, sid_j)
    m1 = timeit("scatter_max", scatter_max, f_j, sid_j)
    m2 = timeit("sorted_max", sorted_max, f_j, order_j, sid_sorted_j, starts_j)

    print("sum parity (sorted vs scatter):",
          float(np.abs(r1 - r2).max()), float(np.abs(r1 - r3).max()))
    nz = np.asarray(starts[1:] > starts[:-1])
    print("max parity (sorted vs scatter):",
          float(np.abs(np.where(nz[:, None], m1, 0) - m2).max()))


if __name__ == "__main__":
    main()
