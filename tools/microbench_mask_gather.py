"""Isolate the batch-2 blowup inside points_in_mask_compact.

mask_sub:gather measured 7.05 ms at batch 1 but 30.27 ms at batch 2
(4.3x for 2x points — tools/profile_fsd.py 2026-08-20). Parts:

  proj     projection + cam top-k selection only (no mask gather)
  gather   flat_masks[idx] row gather alone (synthetic in-range indices)
  full     points_in_mask_compact end-to-end

    python tools/microbench_mask_gather.py --batch 1
    python tools/microbench_mask_gather.py --batch 2
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
    ap.add_argument("--batch", type=int, default=int(
        os.environ.get("FSF_BENCH_BATCH", 1)))
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import _enable_compile_cache

    _enable_compile_cache()
    b = args.batch
    n = 131072 * b
    cams, h, w, cls = 6, 450, 800, 10
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    dev = jax.devices()[0]
    xyz = jax.device_put(
        jax.random.uniform(ks[0], (n, 3), jnp.float32, -40, 40), dev)
    batch_idx = jax.device_put(
        (jnp.arange(n, dtype=jnp.int32) * b) // n, dev)
    masks = jax.device_put(jax.random.randint(
        ks[1], (b, cams, h, w, cls), 0, 2**16, jnp.uint16), dev)
    # plausible projective matrices: random but well-conditioned
    lidar2img = jax.device_put(
        jax.random.normal(ks[2], (b, cams, 4, 4), jnp.float32) * 100.0, dev)
    idx = jax.device_put(jax.random.randint(
        ks[3], (n, 2), 0, b * cams * h * w, jnp.int32), dev)

    def timeit(name, fn, *a):
        jfn = jax.jit(fn)
        t0 = time.time()
        r = jfn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        print(f"b={b} {name}: compile {time.time()-t0:.1f}s", flush=True)
        r = jfn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        t0 = time.time()
        for _ in range(args.iters):
            r = jfn(*a)
        np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
        print(f"b={b} {name}: {(time.time()-t0)/args.iters*1000:.2f} ms",
              flush=True)

    def proj(xyz, batch_idx, lidar2img):
        pts4 = jnp.concatenate(
            [xyz, jnp.ones((n, 1), xyz.dtype)], axis=1)
        mats = lidar2img[batch_idx]
        pr = jnp.einsum("nd,nckd->nck", pts4, mats)
        depth = pr[..., 2]
        z = jnp.clip(depth, 1e-5, 1e5)
        u = pr[..., 0] / z
        v = pr[..., 1] / z
        px = jnp.floor(u).astype(jnp.int32)
        py = jnp.floor(v).astype(jnp.int32)
        valid = ((depth > 1e-3) & (px >= 0) & (px < w)
                 & (py >= 0) & (py < h))
        cam_iota = jax.lax.broadcasted_iota(jnp.int32, (n, cams), 1)
        score = jnp.where(valid, cams - cam_iota, 0)
        tot = jnp.zeros((n,), jnp.int32)
        for _ in range(2):
            c = jnp.argmax(score, axis=1)
            oh = cam_iota == c[:, None]
            tot = tot + jnp.sum(jnp.where(oh, score, 0), axis=1)
            score = jnp.where(oh, 0, score)
        return tot

    def gather(masks, idx):
        flat = masks.reshape(-1, cls)
        return flat[idx].sum()

    def full(xyz, batch_idx, lidar2img, masks):
        from fullysparsefusion_tpu.ops.projection import (
            points_in_mask_compact)
        ids, sc = points_in_mask_compact(xyz, batch_idx, lidar2img, masks)
        return ids.sum()

    timeit("proj+sel", proj, xyz, batch_idx, lidar2img)
    timeit("row-gather", gather, masks, idx)
    timeit("full compact", full, xyz, batch_idx, lidar2img, masks)


def layout_probe():
    """Row-width sweep: is the [rows, 10] u16 gather paying tile padding?"""
    import jax
    import jax.numpy as jnp
    from bench import _enable_compile_cache

    _enable_compile_cache()
    b = int(os.environ.get("FSF_BENCH_BATCH", 2))
    rows = b * 6 * 450 * 800
    nidx = 131072 * b * 2
    key = jax.random.key(1)
    dev = jax.devices()[0]
    idx = jax.device_put(
        jax.random.randint(key, (nidx,), 0, rows, jnp.int32), dev)
    for width, dt in ((10, jnp.uint16), (16, jnp.uint16), (128, jnp.uint16),
                      (5, jnp.uint32), (8, jnp.uint32)):
        tab = jax.device_put(
            jnp.zeros((rows, width), dt), dev)
        jfn = jax.jit(lambda t, i: t[i].sum())
        r = jfn(tab, idx); np.asarray(r.reshape(-1)[:1])
        r = jfn(tab, idx); np.asarray(r.reshape(-1)[:1])
        import time as _t
        t0 = _t.time()
        for _ in range(20):
            r = jfn(tab, idx)
        np.asarray(r.reshape(-1)[:1])
        print(f"b={b} gather [{rows},{width}] {jnp.dtype(dt).name}: "
              f"{(_t.time()-t0)/20*1000:.2f} ms", flush=True)


if __name__ == "__main__":
    if os.environ.get("FSF_MG_LAYOUT", "0") not in ("", "0"):
        layout_probe()
    else:
        main()
