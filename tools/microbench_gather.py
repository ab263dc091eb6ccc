"""Microbenchmark: can gather hints / layouts beat the ~97 GB/s v5e ceiling?

The sparse-conv tap gathers dominate the UNet. For a fixed kernel tap the
output→input row map is MONOTONE (active rows are sorted by linearized key,
a constant offset preserves order) and INJECTIVE (distinct outputs hit
distinct neighbors), so `jax.lax.gather`'s `indices_are_sorted` /
`unique_indices` hints are semantically valid. This measures whether XLA's
TPU gather emitter exploits them.

    python tools/microbench_gather.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=20, warmup=2):
    import jax

    jfn = jax.jit(fn)
    r = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    for _ in range(warmup - 1):
        r = jfn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.time()
    for _ in range(iters):
        r = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    return (time.time() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    from fullysparsefusion_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    cap, c = 57344, 128
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((cap + 1, c)), jnp.bfloat16)
    # sorted per-tap row maps with ~50% hit rate (misses -> zero row cap),
    # mimicking the subm rulebook's structure: monotone over hits
    rows_np = np.zeros((27, cap), np.int32)
    for k in range(27):
        hits = np.sort(rng.choice(cap, size=cap // 2, replace=False))
        r = np.full(cap, cap, np.int32)
        pos = np.sort(rng.choice(cap, size=cap // 2, replace=False))
        r[pos] = hits
        rows_np[k] = r
    rows = jnp.asarray(rows_np)

    def g_plain(feats, rows):
        out = jnp.zeros((cap, c), jnp.float32)
        for k in range(27):
            out = out + feats[rows[k]].astype(jnp.float32)
        return out

    def take_sorted(x, idx, *, sorted_, unique):
        # one-hot free path: jax.lax.gather with hints
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return jax.lax.gather(
            x, idx[:, None], dn, slice_sizes=(1, x.shape[1]),
            indices_are_sorted=sorted_, unique_indices=unique,
            mode=jax.lax.GatherScatterMode.CLIP)

    def g_hints(feats, rows):
        out = jnp.zeros((cap, c), jnp.float32)
        for k in range(27):
            out = out + take_sorted(
                feats, rows[k], sorted_=True, unique=True).astype(jnp.float32)
        return out

    def g_hints_sorted_only(feats, rows):
        out = jnp.zeros((cap, c), jnp.float32)
        for k in range(27):
            out = out + take_sorted(
                feats, rows[k], sorted_=True, unique=False).astype(jnp.float32)
        return out

    t_plain = bench(g_plain, feats, rows)
    t_hints = bench(g_hints, feats, rows)
    t_sorted = bench(g_hints_sorted_only, feats, rows)
    traffic_gb = 27 * cap * c * 2 / 1e9
    print(f"27-tap gather+add [57k,{c}]bf16 ({traffic_gb:.2f} GB):")
    print(f"  plain gather:          {t_plain:.2f} ms  ({traffic_gb / t_plain * 1000:.0f} GB/s)")
    print(f"  sorted+unique hints:   {t_hints:.2f} ms  ({traffic_gb / t_hints * 1000:.0f} GB/s)")
    print(f"  sorted-only hint:      {t_sorted:.2f} ms  ({traffic_gb / t_sorted * 1000:.0f} GB/s)")

    # and with matmul per tap (the real conv shape)
    w = jnp.asarray(rng.standard_normal((27, c, c)), jnp.bfloat16)

    def conv_plain(feats, rows, w):
        out = jnp.zeros((cap, c), jnp.float32)
        for k in range(27):
            out = out + jnp.dot(feats[rows[k]], w[k],
                                preferred_element_type=jnp.float32)
        return out

    def conv_hints(feats, rows, w):
        out = jnp.zeros((cap, c), jnp.float32)
        for k in range(27):
            out = out + jnp.dot(
                take_sorted(feats, rows[k], sorted_=True, unique=True), w[k],
                preferred_element_type=jnp.float32)
        return out

    t_cp = bench(conv_plain, feats, rows, w)
    t_ch = bench(conv_hints, feats, rows, w)
    print(f"27-tap conv [57k,{c}] bf16:")
    print(f"  plain:  {t_cp:.2f} ms")
    print(f"  hints:  {t_ch:.2f} ms")


if __name__ == "__main__":
    main()
