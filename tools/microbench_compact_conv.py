"""Microbenchmark: pair-compacted sparse conv vs the full-capacity gather form.

At stage-0 bench scale only ~14.5 % of the 27×cap tap slots hit an active
neighbor, yet the full-cap form fetches a row for every slot (misses hit the
appended zero row at full cost — gathers are row-rate/bandwidth bound).
Compact form per conv:

  Y[k]   = feats @ w[k]                      (MXU, trivial FLOPs)
  prod   = Y.flat[pair_src]                  (gather ONLY hit pairs, out-major)
  P      = cumsum(prod)                      (scatter-free segment sum…)
  out[i] = P[starts[i+1]] − P[starts[i]]     (…via boundary diff)

The pair list is built once per stage (shared by every conv on that active
set + the backward) with one unique-index scatter — also timed here.

    python tools/microbench_compact_conv.py
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


def run_case(cap, cin, cout, hit_rate, h_cap, label):
    import jax
    import jax.numpy as jnp

    k3 = 27
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((cap, cin)), jnp.bfloat16)
    valid = jnp.ones((cap,), bool)
    w = jnp.asarray(rng.standard_normal((k3, cin, cout)) * 0.05, jnp.bfloat16)

    # synthetic rulebook: per tap, monotone hit rows at the given rate
    rows_np = np.full((k3, cap), cap, np.int32)
    hits_np = np.zeros((k3, cap), bool)
    for k in range(k3):
        n_hit = int(cap * hit_rate)
        outs = np.sort(rng.choice(cap, size=n_hit, replace=False))
        srcs = np.sort(rng.choice(cap, size=n_hit, replace=False))
        rows_np[k, outs] = srcs
        hits_np[k, outs] = True
    rows = jnp.asarray(rows_np)
    hits = jnp.asarray(hits_np)

    # ---- current full-cap form ----
    def conv_full(feats, rows, w):
        fz = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)])
        out = jnp.zeros((cap, cout), jnp.float32)
        for k in range(k3):
            out = out + jnp.dot(fz[rows[k]], w[k],
                                preferred_element_type=jnp.float32)
        return out

    t_full = bench(conv_full, feats, rows, w)

    # ---- pair-list precompute (once per stage) ----
    def build_pairs(rows, hits):
        hits_T = hits.T.astype(jnp.int32)          # [cap, 27]
        rank = jnp.cumsum(hits_T, axis=1) - 1
        cnt = hits_T.sum(axis=1)
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)])
        dest = starts[:-1, None] + rank            # [cap, 27]
        ok = hits.T & (dest < h_cap)
        # invalid pairs go OUT of bounds so mode="drop" discards them —
        # an in-bounds trash slot would collide, violating unique_indices
        dest = jnp.where(ok, dest, h_cap + 1)
        payload = rows.T.astype(jnp.uint32) + (
            jnp.arange(k3, dtype=jnp.uint32)[None, :] << 20)
        compact = jnp.zeros((h_cap + 1,), jnp.uint32).at[dest].set(
            payload, unique_indices=True, mode="drop")[:h_cap]
        src = (compact & 0xFFFFF).astype(jnp.int32)
        kk = (compact >> 20).astype(jnp.int32)
        n_pairs = starts[-1]
        pair_valid = jnp.arange(h_cap) < n_pairs
        ysrc = jnp.where(pair_valid, kk * (cap + 1) + src, k3 * (cap + 1))
        return ysrc, starts.clip(0, h_cap)

    t_build = bench(build_pairs, rows, hits)

    ysrc, starts = jax.jit(build_pairs)(rows, hits)

    # ---- compact conv ----
    def conv_compact(feats, w, ysrc, starts):
        fz = jnp.concatenate([feats, jnp.zeros((1, cin), feats.dtype)])
        # Y[k] = fz @ w[k]  → flat [(27)(cap+1)+1, cout]
        y = jnp.einsum("nc,kcd->knd", fz, w,
                       preferred_element_type=jnp.bfloat16)
        yflat = jnp.concatenate(
            [y.reshape(k3 * (cap + 1), cout),
             jnp.zeros((1, cout), y.dtype)])
        prod = yflat[ysrc].astype(jnp.float32)     # [h_cap, cout]
        p = jnp.concatenate(
            [jnp.zeros((1, cout), jnp.float32), jnp.cumsum(prod, axis=0)])
        pg = p[starts]                             # [cap+1, cout]
        return pg[1:] - pg[:-1]

    t_compact = bench(conv_compact, feats, w, ysrc, starts)

    # correctness vs full form
    ref = np.asarray(jax.jit(conv_full)(feats, rows, w))
    got = np.asarray(jax.jit(conv_compact)(feats, w, ysrc, starts))
    scale = np.abs(ref).max() + 1e-6
    err = np.abs(ref - got).max() / scale
    # isolate the cumsum cost
    prod = jnp.asarray(rng.standard_normal((h_cap, cout)), jnp.float32)
    t_cumsum = bench(lambda x: jnp.cumsum(x, axis=0), prod)

    # the SHIPPED library path (ops.sparse_conv), forward + backward
    from fullysparsefusion_tpu.ops import sparse_conv as sc

    rb = sc.Rulebook(rows=rows, hits=hits)
    crb = jax.jit(sc.build_compact_rulebook, static_argnums=1)(rb, h_cap)
    crb_b = jax.jit(sc.build_compact_rulebook, static_argnums=1)(
        sc.mirror_rulebook(rb), h_cap)
    # rb/w/crb as ARGUMENTS, not closures — closed-over arrays become HLO
    # constants and blow the remote-compile request limit (CLAUDE.md)
    t_lib_full = bench(
        lambda f, rb, w: sc.subm_conv_apply(f, valid, rb, w), feats, rb, w)
    t_lib_comp = bench(
        lambda f, rb, w, crb: sc.subm_conv_apply(f, valid, rb, w, crb=crb),
        feats, rb, w, crb)
    t_lib_comp_g = bench(jax.grad(
        lambda f, rb, w, crb, crb_b: sc.subm_conv_apply(
            f, valid, rb, w, crb=crb, crb_bwd=crb_b
        ).astype(jnp.float32).sum()), feats, rb, w, crb, crb_b)

    print(f"{label}: cap={cap} {cin}->{cout} hit={hit_rate:.0%} h_cap={h_cap}")
    print(f"  full-cap conv:   {t_full:7.2f} ms")
    print(f"  compact conv:    {t_compact:7.2f} ms   (rel err {err:.2e})")
    print(f"  pair build:      {t_build:7.2f} ms (per stage, shared)")
    print(f"  cumsum alone:    {t_cumsum:7.2f} ms [{h_cap},{cout}]f32")
    print(f"  lib full fwd:    {t_lib_full:7.2f} ms")
    print(f"  lib compact fwd: {t_lib_comp:7.2f} ms")
    print(f"  lib compact grad:{t_lib_comp_g:7.2f} ms")


def main():
    from fullysparsefusion_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    run_case(57344, 64, 128, 0.145, 1 << 18, "stage0-enc")
    run_case(57344, 192, 128, 0.145, 1 << 18, "stage0-out")
    run_case(40960, 128, 128, 0.25, 1 << 18, "stage1")
    run_case(24576, 256, 128, 0.35, 1 << 18, "stage2-merge")


if __name__ == "__main__":
    main()
