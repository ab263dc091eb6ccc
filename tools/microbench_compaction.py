"""Micro A/B of the pieces inside the fsd group-gather band at bench scale.

profile_fsd's group_gather part (group_sample + 6× masked_gather + wide row
gathers) measured 11.26 ms with the argsort masked_gather and 11.49 ms with
the searchsorted one — i.e. the compaction was never the cost. This tool
times each piece in isolation so the band's budget is attributed to measured
ops, not guesses:

    python tools/microbench_compaction.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from fullysparsefusion_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from fullysparsefusion_tpu.config import FSDConfig, Capacities
    from fullysparsefusion_tpu.models.fsd import (
        group_sample, _force_one_fg_per_sample)
    from fullysparsefusion_tpu.ops.segment import cumsum_marks

    n = 65536
    kcap = 4096
    groups = 6
    feat_w = 118
    rng = np.random.default_rng(0)
    masks = jnp.asarray(rng.random((groups, n)) < 0.04)
    feats = jnp.asarray(rng.standard_normal((n, feat_w)), jnp.float32)
    batch_idx = jnp.zeros((n,), jnp.int32)
    valid = jnp.asarray(rng.random(n) < 0.9)

    cfg = FSDConfig(caps=Capacities(
        points=131072, voxels=57344, prevox=n, fg_per_group=kcap,
        cluster_voxels_per_group=1024, clusters=1024, max_gt=128,
        frustum_points=16384, frustum_objects=256, roi_points=32768,
        max_roi_points=512))
    ncls = cfg.num_classes
    logits = jnp.asarray(rng.standard_normal((n, ncls + 1)), jnp.float32)
    offsets = jnp.asarray(
        rng.standard_normal((n, (ncls + 1) * 3)), jnp.float32)
    xyz = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32) * 20

    def timeit(name, fn, *args, iters=30):
        jfn = jax.jit(fn)
        r = jfn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        r = jfn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        t0 = time.time()
        for _ in range(iters):
            r = jfn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        print(f"{name}: {(time.time()-t0)/iters*1000:.2f} ms", flush=True)

    def mg_sort(mask):
        order = jnp.argsort(~mask, stable=True)
        idx = order[:kcap]
        ov = mask[idx]
        return jnp.where(ov, idx, 0).astype(jnp.int32), ov

    def mg_search(mask):
        csum = cumsum_marks(mask)
        targets = jnp.arange(1, kcap + 1, dtype=csum.dtype)
        idx = jnp.searchsorted(csum, targets, side="left")
        ov = idx < n
        idx = jnp.where(ov, idx, 0).astype(jnp.int32)
        return idx, ov & mask[idx]

    timeit("6x masked_gather argsort (idx only)",
           lambda m: [mg_sort(m[g])[0] for g in range(groups)], masks)
    timeit("6x masked_gather searchsorted (idx only)",
           lambda m: [mg_search(m[g])[0] for g in range(groups)], masks)

    def wide_gathers(m, f):
        outs = []
        for g in range(groups):
            idx, v = mg_search(m[g])
            outs.append(f[idx] * v[:, None])
        return outs

    timeit("6x compaction + [4096,118] row gathers", wide_gathers, masks, feats)

    timeit("6x force_one_fg (segment scatters)",
           lambda m, b, v: [
               _force_one_fg_per_sample(m[g], b, v, 1) for g in range(groups)],
           masks, batch_idx, valid)

    timeit("group_sample (softmax+votes+force, 6 groups)",
           lambda lg, of, xy, v, b: group_sample(
               lg, of, xy, v, cfg, 0.0, batch_idx=b, batch_size=1),
           logits, offsets, xyz, valid, batch_idx)

    # --- RoI-pair compaction scale (refine stage: [131k*2] mask -> 32768)
    n2 = 131072 * 2
    cap2 = 32768
    mask2 = jnp.asarray(rng.random(n2) < 0.08)

    def big_sort(m):
        order = jnp.argsort(~m, stable=True)
        idx = order[:cap2]
        ov = m[idx]
        return jnp.where(ov, idx, 0).astype(jnp.int32), ov

    def big_search(m):
        csum = cumsum_marks(m)
        targets = jnp.arange(1, cap2 + 1, dtype=csum.dtype)
        idx = jnp.searchsorted(csum, targets, side="left")
        ov = idx < n2
        idx = jnp.where(ov, idx, 0).astype(jnp.int32)
        return idx, ov & m[idx]

    def big_rankscatter(m):
        incl = cumsum_marks(m)
        rank = incl - 1
        ok = m & (rank < cap2)
        slot = jnp.where(ok, rank, cap2)
        idx = (jnp.zeros((cap2 + 1,), jnp.int32)
               .at[slot].max(jnp.arange(n2, dtype=jnp.int32)))[:cap2]
        ov = jnp.arange(cap2, dtype=incl.dtype) < incl[-1]
        return jnp.where(ov, idx, 0), ov

    timeit("roi-scale masked_gather argsort", lambda m: big_sort(m)[0], mask2)
    timeit("roi-scale masked_gather searchsorted",
           lambda m: big_search(m)[0], mask2)
    timeit("roi-scale masked_gather rank-scatter",
           lambda m: big_rankscatter(m)[0], mask2)


if __name__ == "__main__":
    main()
