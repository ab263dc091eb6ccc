"""Attribute the FSF training step: forward-loss / grad / optimizer, with
the window-conv train dispatch on or off.

The round-4 A/B measured the fused step at 257.4 ms (window off) vs 320.7
(window fwd on, gather bwd) and left the +63 ms unexplained
(docs/performance.md round-4 train A/B). This tool splits the step so the
regression (and the optimizer's per-leaf dispatch cost) get line items:

  fwd    value of the loss only (no grad) — training-mode forward
  grad   value_and_grad of the loss (no optimizer)
  step   the full train step (grad + optax update)

    python tools/profile_train.py                  # window off (default)
    FSF_WINDOW_TRAIN=1 python tools/profile_train.py
    FSF_FLAT_OPT=1 python tools/profile_train.py   # packed optimizer
                                                   # (OOMs the step compile —
                                                   # see make_optimizer)

One process per configuration — remote TPU compiles are serialized.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def _timeit(name, jfn, *args, iters=5, warmups=2):
    import jax

    t0 = time.time()
    r = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    print(f"{name}: compile {time.time() - t0:.1f}s", flush=True)
    for _ in range(warmups - 1):
        r = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    t0 = time.time()
    for _ in range(iters):
        r = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])
    ms = (time.time() - t0) / iters * 1000
    print(f"{name}: {ms:.1f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="fwd,grad,step")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    parts = [p for p in args.parts.split(",") if p]

    import jax
    import jax.numpy as jnp
    from bench import build_bench_model

    cfg, model, vars_, pb, cam = build_bench_model()
    batch = int(os.environ.get("FSF_BENCH_BATCH", 1))

    from fixtures import make_scene
    from fullysparsefusion_tpu.parallel import (
        TrainState, make_optimizer, make_generic_train_step, fsf_forward_fn)
    from fullysparsefusion_tpu.parallel.train import total_loss

    _, gt = make_scene(
        seed=1, batch_size=batch, boxes_per_sample=32, pts_per_box=10,
        bg_points=100, n_cap=1024, max_gt=cfg.fsd.caps.max_gt, extent=45.0)
    gt = jax.device_put(gt, jax.devices()[0])
    forward = fsf_forward_fn(model, batch)

    if "fwd" in parts:
        def fwd_loss(params, batch_stats, pb, cam, gt):
            losses, _ = forward(params, batch_stats, pb, cam, gt, gt)
            return total_loss(losses)

        _timeit("fwd(train-mode loss)", jax.jit(fwd_loss),
                vars_["params"], vars_["batch_stats"], pb, cam, gt,
                iters=args.iters)

    if "grad" in parts:
        def grad_only(params, batch_stats, pb, cam, gt):
            def loss_fn(p):
                losses, new_stats = forward(p, batch_stats, pb, cam, gt, gt)
                return total_loss(losses), new_stats
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return loss, grads

        _timeit("grad(value_and_grad)", jax.jit(grad_only),
                vars_["params"], vars_["batch_stats"], pb, cam, gt,
                iters=args.iters)

    if "step" in parts:
        flat = os.environ.get("FSF_FLAT_OPT", "0") not in ("", "0")
        tx = make_optimizer(base_lr=1e-4, total_steps=100, flatten=flat)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            opt_state = tx.init(jax.device_put(vars_["params"], cpu))
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=vars_["params"], batch_stats=vars_["batch_stats"],
            opt_state=jax.device_put(opt_state, jax.devices()[0]))
        step = make_generic_train_step(forward, tx)

        def run(state, pb, cam, gt):
            new_state, loss, _ = step(state, pb, cam, gt, gt)
            return loss

        _timeit("step(full)", run, state, pb, cam, gt, iters=args.iters)


if __name__ == "__main__":
    main()
