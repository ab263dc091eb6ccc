"""Training step + data-parallel sharding.

The reference trains with DDP over NCCL (its only parallelism, SURVEY.md
§2.8): per-rank forward/backward, gradient all-reduce, plus explicit
all-reduces for loss normalizers and syncBN stats. The TPU-native form is a
``shard_map`` over a 1-D ``jax.sharding.Mesh``: each device runs the model on
its local sub-batch; gradients and loss normalizers are ``psum``/``pmean``
collectives riding ICI; BN statistics sync through the same axis (see
``layers.MaskedBatchNorm`` axis support).

Optimizer: AdamW (wd 0.01) + grad-norm clip 35 + one-cycle cyclic LR
(target_ratio (10, 1e-4), 40% warm-up — reference
configs/_base_/schedules/cyclic_20e.py) + per-module lr multipliers
(segmentor backbone/VFE ×0.2 — FSF_nuScenes_config.py:421-427).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def cyclic_lr_schedule(
    base_lr: float,
    total_steps: int,
    target_ratio: Tuple[float, float] = (10.0, 1e-4),
    step_ratio_up: float = 0.4,
) -> optax.Schedule:
    """mmcv cyclic policy, one cycle, cosine annealing in both phases."""
    up_steps = max(int(total_steps * step_ratio_up), 1)
    down_steps = max(total_steps - up_steps, 1)
    peak = base_lr * target_ratio[0]
    floor = base_lr * target_ratio[1]

    def sched(step):
        step = jnp.asarray(step, jnp.float32)

        def up(s):
            t = jnp.clip(s / up_steps, 0.0, 1.0)
            return base_lr + (peak - base_lr) * 0.5 * (1 - jnp.cos(jnp.pi * t))

        def down(s):
            t = jnp.clip((s - up_steps) / down_steps, 0.0, 1.0)
            return floor + (peak - floor) * 0.5 * (1 + jnp.cos(jnp.pi * t))

        return jnp.where(step < up_steps, up(step), down(step))

    return sched


def lr_mult_transform(rules: Mapping[str, float]) -> optax.GradientTransformation:
    """Scale updates whose flattened param path starts with a rule prefix."""

    def path_str(path) -> str:
        return ".".join(getattr(k, "key", str(k)) for k in path)

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale(path, u):
            p = path_str(path)
            for prefix, mult in rules.items():
                if p.startswith(prefix):
                    return u * mult
            return u

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    base_lr: float = 1e-4,
    total_steps: int = 10000,
    weight_decay: float = 0.01,
    grad_clip_norm: float = 35.0,
    lr_mult_rules: Optional[Mapping[str, float]] = None,
    flatten: bool = False,
) -> optax.GradientTransformation:
    # ``flatten=True`` runs clip+AdamW over ONE packed array instead of
    # ~700 per-leaf element-wise kernels. MEASURED standalone on v5e
    # (2026-08-20): 12.9 ms at 43M params, compiles and runs fine. DEFAULT
    # OFF: inside the fused FSF train step (grad + update in one jit) the
    # TPU compile OOMs on an XLA-fabricated interleaved ``f32[38M, 2]``
    # temp whose (8,128) tiling pads the 2-wide minor dim 64× (19.4 GB,
    # `reshape.596`). The interleave survives stacked-moment storage AND
    # optimization_barrier around every packed array — it is a whole-graph
    # fusion-pass pathology, not an operand-layout choice we control. The
    # unflattened chain costs ~5 ms/step (step 237.6 − grad 232.4,
    # profile_train 2026-08-20) — nothing to win here. Parked.
    # ``lr_mult_transform`` needs the tree structure → outside the wrapper.
    if flatten:
        inner = packed_flatten(fused_clip_adamw(
            cyclic_lr_schedule(base_lr, total_steps),
            grad_clip_norm, weight_decay))
    else:
        inner = optax.chain(
            optax.clip_by_global_norm(grad_clip_norm),
            optax.adamw(
                cyclic_lr_schedule(base_lr, total_steps),
                b1=0.9, b2=0.999, weight_decay=weight_decay,
            ),
        )
    return optax.chain(inner, lr_mult_transform(lr_mult_rules or {}))


def fused_clip_adamw(
    lr_schedule,
    grad_clip_norm: float,
    weight_decay: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """clip_by_global_norm + AdamW in one transformation over a SINGLE
    packed array (see :func:`packed_flatten`), bit-matching the optax chain
    (tests/test_train.py::test_fused_clip_adamw_matches_optax).

    The two moments live in one stacked ``mv [2, rows, lane]`` array — XLA
    then updates them as one element-wise op over the stack instead of
    horizontally fusing two separate [n]-shaped updates into an interleaved
    [n, 2] temp (whose TPU tiling pads 2 → 128 lanes: 19.4 GB at FSF's 38M
    params, an OOM at compile).
    """

    def init_fn(params):
        return (jnp.zeros((), jnp.int32),
                jnp.zeros((2,) + params.shape, jnp.float32))

    def update_fn(updates, state, params=None):
        count, mv = state
        g = updates.astype(jnp.float32)
        gnorm = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, grad_clip_norm / jnp.maximum(gnorm, 1e-12))
        beta = jnp.asarray([b1, b2], jnp.float32)[:, None, None]
        mv = beta * mv + (1.0 - beta) * jnp.stack([g, g * g])
        count = count + 1
        cf = count.astype(jnp.float32)
        mhat = mv[0] / (1.0 - b1 ** cf)
        vhat = mv[1] / (1.0 - b2 ** cf)
        lr = lr_schedule(count - 1)
        u = -lr * (mhat / (jnp.sqrt(vhat) + eps)
                   + (0.0 if params is None else weight_decay * params))
        return u, (count, mv)

    return optax.GradientTransformation(init_fn, update_fn)


def packed_flatten(
    inner: optax.GradientTransformation, lane: int = 128
) -> optax.GradientTransformation:
    """Run ``inner`` on a single lane-aligned [ceil(n/lane), lane] array.

    Like ``optax.flatten`` but 2-D: TPU tiles the last two dims (8, 128), so
    a flat param vector must keep a 128-wide minor dim or any reshape XLA
    derives from it risks a 64×-padded layout (measured: optax.flatten's
    1-D form produced a 19.4 GB [38M, 2] allocation at FSF scale). Zero
    padding is inert for clip (adds 0 to the norm) and AdamW (moments stay
    0, update stays 0) and is sliced off on unflatten.
    """

    def _flat(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        v = jnp.concatenate([l.reshape(-1).astype(jnp.float32) for l in leaves])
        n = v.shape[0]
        rows = -(-n // lane)
        return jnp.pad(v, (0, rows * lane - n)).reshape(rows, lane)

    def _unflat(tree_like, packed):
        leaves, treedef = jax.tree_util.tree_flatten(tree_like)
        flat = packed.reshape(-1)
        out, off = [], 0
        for l in leaves:
            out.append(flat[off:off + l.size].reshape(l.shape).astype(l.dtype))
            off += l.size
        return jax.tree_util.tree_unflatten(treedef, out)

    def init_fn(params):
        return inner.init(_flat(params))

    def update_fn(updates, state, params=None):
        # optimization_barrier: materialize each packed array SEPARATELY.
        # Without it XLA horizontally fuses the two concatenation chains
        # (packed grads + packed params) into one interleaved [n, 2] temp
        # whose (8,128) tiling pads 2 → 128 lanes — 19.4 GB at FSF scale,
        # an OOM at compile (same pathology optax.flatten hit).
        pf = (None if params is None
              else jax.lax.optimization_barrier(_flat(params)))
        uf, new_state = inner.update(
            jax.lax.optimization_barrier(_flat(updates)), state, pf)
        return _unflat(updates, jax.lax.optimization_barrier(uf)), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def total_loss(losses: Dict[str, jax.Array]) -> jax.Array:
    """Sum every loss term; diagnostics (``*num_pos``/``num_clusters``/...)
    are excluded by name. Matches the reference's ``parse_losses``
    (mmdet base detector: every key containing 'loss' is summed) — FSF emits
    prefixed keys (``frustum_loss_*``, ``fsd_loss_*``, ``stage{i}_loss_*``),
    so a ``startswith`` filter would silently train only the segmentor."""
    return sum(v for k, v in losses.items() if "loss" in k)


def make_generic_train_step(forward, tx) -> Callable:
    """Jitted train step for any model.

    ``forward(params, batch_stats, *batch) -> (losses dict, new_batch_stats)``.
    """

    @jax.jit
    def step(state: TrainState, *batch):
        def loss_fn(params):
            losses, new_stats = forward(params, state.batch_stats, *batch)
            return total_loss(losses), (losses, new_stats)

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        )
        return new_state, loss, losses

    return step


def fsd_forward_fn(model, batch_size: int):
    def forward(params, batch_stats, pb, gt, thresh_buffer=0.0, det_weight=1.0):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pb, batch_size, gt, True, thresh_buffer, det_weight,
            mutable=["batch_stats"],
        )
        return out["losses"], updates["batch_stats"]

    return forward


def fsf_forward_fn(model, batch_size: int):
    def forward(params, batch_stats, pb, cam, gt, no_aug_gt,
                thresh_buffer=0.0, det_weight=1.0):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pb, cam, batch_size, gt, no_aug_gt, True,
            thresh_buffer, det_weight, mutable=["batch_stats"],
        )
        return out["losses"], updates["batch_stats"]

    return forward


def make_train_step(model, tx, batch_size: int) -> Callable:
    """Single-device (or GSPMD-sharded) jitted train step for FSD."""
    return make_generic_train_step(fsd_forward_fn(model, batch_size), tx)


def make_generic_sharded_train_step(
    forward, tx, mesh: Mesh, n_batch_args: int, axis: str = "dp"
) -> Callable:
    """Data-parallel train step: shard_map over the mesh's ``dp`` axis.

    Each device consumes its local batch shard (arrays sharded on axis 0);
    gradients are ``pmean``-reduced — the TPU equivalent of DDP's NCCL
    all-reduce, but expressed as one collective XLA schedules over ICI.
    Model state (params/opt) is replicated; BN statistics sync through the
    same axis.
    """
    from ..models import layers as L

    def local_step(state: TrainState, *batch):
        # Differentiate the GLOBAL mean loss (pmean INSIDE the grad): with
        # syncBN statistics and pmean'd loss normalizers the forward couples
        # shards through psum, and shard_map's per-shard AD does not route
        # cross-shard cotangents for a per-shard scalar — grads of per-shard
        # losses + pmean were measured 8× off on an 8-way mesh. Grads of the
        # pmean'd scalar are the exact global gradient (replicated), matching
        # torch DDP+syncBN whose allreduce backward is an allreduce
        # (tests/test_train.py::test_sharded_losses_match_single_device).
        def loss_fn(params):
            with L.bn_axis(axis):
                losses, new_stats = forward(params, state.batch_stats, *batch)
            return jax.lax.pmean(total_loss(losses), axis), (losses, new_stats)

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        losses = jax.lax.pmean(losses, axis)
        new_stats = jax.lax.pmean(new_stats, axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        )
        return new_state, loss, losses

    rep = P()
    # batch args shard over dp; the two runtime-schedule scalars
    # (thresh_buffer, detection_weight) replicate
    smapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep,) + (P(axis),) * n_batch_args + (rep, rep),
        out_specs=(rep, rep, rep),
    )
    jitted = jax.jit(smapped)

    def step(state, *args):
        if len(args) == n_batch_args:  # scalars optional at the call site
            args = args + (jnp.float32(0.0), jnp.float32(1.0))
        return jitted(state, *args)

    return step


def make_sharded_train_step(
    model, tx, mesh: Mesh, per_device_batch: int, axis: str = "dp"
) -> Callable:
    """DP train step for the FSD model (PointBatch + GroundTruth shards)."""
    return make_generic_sharded_train_step(
        fsd_forward_fn(model, per_device_batch), tx, mesh, 2, axis
    )


def make_fsf_sharded_train_step(
    model, tx, mesh: Mesh, per_device_batch: int, axis: str = "dp"
) -> Callable:
    """DP train step for the full FSF model (+ CameraData and no-aug GT)."""
    return make_generic_sharded_train_step(
        fsf_forward_fn(model, per_device_batch), tx, mesh, 4, axis
    )
