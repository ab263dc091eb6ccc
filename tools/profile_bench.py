"""Single-stage timing of the flagship forward (one jit per invocation —
remote compiles are slow, so pick the stage via --stage)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="full",
                    choices=["seg", "fg", "query", "full"])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    from bench import build_bench_model

    cfg, model, vars_, pb = build_bench_model()

    if args.stage == "seg":
        fn = lambda pb: model.apply(
            vars_, pb, 1, False, method=lambda m, pb, bs, tr: m.segmentor(pb, tr, bs)
        )["seg_logits"]
    elif args.stage == "fg":
        def fn(pb):
            seg_out = model.apply(
                vars_, pb, 1, False, method=lambda m, pb, bs, tr: m.segmentor(pb, tr, bs)
            )
            fg, cseg, cxyz, cb, cg, cv = model.apply(
                vars_, pb, seg_out, 1,
                method=lambda m, pb, so, bs: m.query_branch.extract_foreground(pb, so, bs),
            )
            return cxyz
    elif args.stage == "query":
        def fn(pb):
            seg_out = model.apply(
                vars_, pb, 1, False, method=lambda m, pb, bs, tr: m.segmentor(pb, tr, bs)
            )
            return model.apply(
                vars_, pb, seg_out, 1, False,
                method=lambda m, pb, so, bs, tr: m.query_branch(pb, so, bs, tr),
            )["cls_logits"]
    else:
        fn = lambda pb: model.apply(vars_, pb, 1, None, False)["cls_logits"]

    jfn = jax.jit(fn)
    t0 = time.time()
    np.asarray(jfn(pb))
    print(f"stage={args.stage} compile {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(args.iters):
        r = jfn(pb)
    jax.block_until_ready(r)
    np.asarray(r[:1])
    print(f"stage={args.stage} run {(time.time()-t0)/args.iters*1000:.1f} ms")


if __name__ == "__main__":
    main()
