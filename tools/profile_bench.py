"""Stage-by-stage timing of the flagship forward on the current device."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp

from bench import build_bench_model


def timeit(fn, *args, n=5, label=""):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label:40s} compile {compile_t:6.1f}s   run {dt:8.1f} ms")
    return out


def main():
    cfg, model, vars_, pb = build_bench_model()
    from fullysparsefusion_tpu.models.fsd import SingleStageFSD

    def seg_only(pb):
        return model.apply(vars_, pb, 1, False, method=lambda m, pb, bs, tr: m.segmentor(pb, tr))

    seg_out = timeit(jax.jit(seg_only), pb, label="segmentor (VFE+UNet+neck+head)")

    def fg_only(pb, seg_out):
        return model.apply(
            vars_, pb, seg_out, 1, False,
            method=lambda m, pb, so, bs, tr: m.query_branch.extract_foreground(pb, so, bs),
        )

    fg_out = timeit(jax.jit(fg_only), pb, seg_out, label="foreground+clustering")

    def sir_head(pb, seg_out):
        return model.apply(
            vars_, pb, seg_out, 1, False,
            method=lambda m, pb, so, bs, tr: m.query_branch(pb, so, bs, tr),
        )

    timeit(jax.jit(sir_head), pb, seg_out, label="query branch (cluster+SIR+head)")

    def full(pb):
        out = model.apply(vars_, pb, 1, None, False)
        return out["cls_logits"]

    timeit(jax.jit(full), pb, label="full forward")


if __name__ == "__main__":
    main()
