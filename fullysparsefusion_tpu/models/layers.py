"""Shared NN building blocks.

``MLP`` mirrors the reference's ``build_mlp`` (ops/sst_ops.py:808-833):
Linear(bias=False) → Norm → Act stacks, with an optional plain biased Linear
head as the final layer. ``MaskedBatchNorm`` replaces ``naiveSyncBN1d`` —
statistics are computed over *valid* rows only (padded rows must not pollute
stats), and under a sharded jit step the masked sums are global sums, so
cross-replica synchronization comes from GSPMD rather than explicit NCCL
all-reduces (reference: mmdet3d naiveSyncBN; SURVEY.md §2.8 item 3).
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Cross-replica mesh axis. Set while tracing a shard_map'ped train step;
# None → fully local math. A trace-time constant, so a contextvar is safe
# under jit. Consulted by (a) MaskedBatchNorm for syncBN statistics and
# (b) the detection losses for globally-synced avg factors (the reference's
# mmdet ``reduce_mean`` all-reduces, sparse_cluster_head.py:140-161 with
# sync_cls/reg_avg_factor=True in FSF_nuScenes_config.py:160).
_BN_AXIS: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "bn_axis", default=None
)


@contextlib.contextmanager
def bn_axis(name: Optional[str]):
    """Enable cross-replica statistics (syncBN + synced loss normalizers)."""
    tok = _BN_AXIS.set(name)
    try:
        yield
    finally:
        _BN_AXIS.reset(tok)


def mesh_mean(x: jax.Array) -> jax.Array:
    """``pmean`` over the active mesh axis (identity outside shard_map).

    DDP-equivalence for loss normalizers: mmdet's ``reduce_mean(avg_factor)``
    is the cross-rank MEAN; together with the gradient ``pmean`` this makes
    the effective loss ``global_sum / global_count`` — identical to a
    single-device run on the concatenated batch.
    """
    axis = _BN_AXIS.get()
    return jax.lax.pmean(x, axis) if axis is not None else x


def get_activation(name: str):
    return {
        "relu": nn.relu,
        "gelu": nn.gelu,
        "silu": nn.silu,
        "tanh": jnp.tanh,
        "identity": lambda x: x,
    }[name]


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid rows of a [N, C] tensor.

    Uses torch momentum convention (running = (1-m)*running + m*batch) with
    m=0.01 by default, matching naiveSyncBN1d configs (eps 1e-3,
    FSF_nuScenes_config.py:50).
    """

    momentum: float = 0.01
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jax.Array, valid: Optional[jax.Array], train: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        if train:
            axis = _BN_AXIS.get()
            if valid is None:
                valid = jnp.ones(x.shape[:1], bool)
            xf = x.astype(jnp.float32)  # stats in f32 even for bf16 activations
            w = valid.astype(jnp.float32)[:, None]
            n = jnp.sum(w)
            sx = jnp.sum(xf * w, axis=0)
            sxx = jnp.sum(xf * xf * w, axis=0)
            if axis is not None:  # syncBN: global statistics over the mesh
                n = jax.lax.psum(n, axis)
                sx = jax.lax.psum(sx, axis)
                sxx = jax.lax.psum(sxx, axis)
            n = jnp.maximum(n, 1.0)
            mean = sx / n
            var = jnp.maximum(sxx / n - mean**2, 0.0)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y


class Norm(nn.Module):
    """Dispatch: 'ln' (LayerNorm), 'bn' (MaskedBatchNorm), 'none'."""

    kind: str = "ln"
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        if self.kind == "ln":
            return nn.LayerNorm(epsilon=self.eps)(x)
        if self.kind == "bn":
            return MaskedBatchNorm(eps=self.eps)(x, valid, train)
        if self.kind == "none":
            return x
        raise ValueError(self.kind)


class MLP(nn.Module):
    """Linear(bias=False)→Norm→Act per hidden dim; optional biased head."""

    hidden_dims: Sequence[int]
    norm: str = "ln"
    act: str = "relu"
    is_head: bool = False
    bias: bool = False
    norm_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        act = get_activation(self.act)
        n = len(self.hidden_dims)
        for i, c in enumerate(self.hidden_dims):
            if i == n - 1 and self.is_head:
                x = nn.Dense(c, use_bias=True)(x)
            else:
                x = nn.Dense(c, use_bias=self.bias)(x)
                x = Norm(kind=self.norm, eps=self.norm_eps)(x, valid, train)
                x = act(x)
        return x
