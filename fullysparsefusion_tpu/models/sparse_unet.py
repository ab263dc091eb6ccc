"""Sparse 3D UNet — the segmentor backbone (reference 'SimpleSparseUNet',
config FSF_nuScenes_config.py:58-70; spconv encoder/decoder over sparse_shape
[40,512,512], channels 64→128→128→256→512 down and back to 128).

Encoder: stage 0 is submanifold-only; stages 1..S each start with a strided
(stride-2) sparse conv that generates a coarser active set, followed by
submanifold convs. Decoder: from the deepest stage upward, merge with the
encoder skip (concat + submanifold convs) then inverse-conv back onto the
next-finer active set recorded on the way down. Every conv is
conv→masked-BN→ReLU (order=('conv','norm','act') in the reference config).

Static capacities per stage bound the active sets; callers size them from the
dataset (SURVEY.md §7 "static-capacity bucketing").
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse_conv import (
    SparseTensor,
    Rulebook,
    center_tap,
    build_subm_rulebook,
    subm_conv_apply,
    subm_conv_dense,
    use_dense_conv,
    sparse_conv3d,
    sparse_conv3d_dense,
    sparse_inverse_conv3d,
    stage_table,
)
from .layers import MaskedBatchNorm


class _SubMBlock(nn.Module):
    """Submanifold conv + BN + ReLU through a shared per-stage rulebook."""

    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dense_min_occupancy: float = 0.15
    window_conv: Optional[Tuple[int, int, int]] = None

    @nn.compact
    def __call__(
        self, st: SparseTensor, rb: Rulebook, train: bool
    ) -> SparseTensor:
        k3 = self.kernel_size[0] * self.kernel_size[1] * self.kernel_size[2]
        cin = st.feats.shape[-1]
        w = self.param(
            "w",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k3, cin, self.out_channels),
        )
        if use_dense_conv(st, self.out_channels, self.dense_min_occupancy):
            # high-occupancy stage: dense scatter -> MXU conv -> gather-back
            y = subm_conv_dense(st, w, None, self.kernel_size)
        else:
            y = subm_conv_apply(
                st.feats, st.valid, rb, w, None,
                identity_tap=center_tap(self.kernel_size),
                window=self.window_conv)
        y = MaskedBatchNorm()(y, st.valid, train)
        y = nn.relu(y) * st.valid[:, None].astype(y.dtype)
        # keep activations bf16 between convs — halves neighbor-gather traffic
        return st.replace(feats=y.astype(jnp.bfloat16))


class _DownBlock(nn.Module):
    out_channels: int
    padding: Tuple[int, int, int]
    out_capacity: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (2, 2, 2)
    dense_min_occupancy: float = 0.15
    window_conv: Optional[Tuple[int, int, int]] = None

    @nn.compact
    def __call__(
        self, st: SparseTensor, train: bool, src_t3: Optional[jax.Array] = None
    ) -> SparseTensor:
        k3 = self.kernel_size[0] * self.kernel_size[1] * self.kernel_size[2]
        cin = st.feats.shape[-1]
        w = self.param(
            "w",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k3, cin, self.out_channels),
        )
        if use_dense_conv(st, self.out_channels, self.dense_min_occupancy):
            out = sparse_conv3d_dense(
                st, w, None, self.kernel_size, self.stride, self.padding,
                self.out_capacity,
            )
        else:
            out = sparse_conv3d(
                st, w, None, self.kernel_size, self.stride, self.padding,
                self.out_capacity, compute_dtype=jnp.bfloat16, src_t3=src_t3,
                window=self.window_conv,
            )
        y = MaskedBatchNorm()(out.feats, out.valid, train)
        y = nn.relu(y) * out.valid[:, None].astype(y.dtype)
        return out.replace(feats=y.astype(jnp.bfloat16))


class _UpBlock(nn.Module):
    out_channels: int
    padding: Tuple[int, int, int]
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (2, 2, 2)
    window_conv: Optional[Tuple[int, int, int]] = None

    @nn.compact
    def __call__(
        self, st: SparseTensor, target: SparseTensor, train: bool,
        src_t3: Optional[jax.Array] = None,
    ) -> SparseTensor:
        k3 = self.kernel_size[0] * self.kernel_size[1] * self.kernel_size[2]
        cin = st.feats.shape[-1]
        w = self.param(
            "w",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k3, cin, self.out_channels),
        )
        out = sparse_inverse_conv3d(
            st,
            target.coords,
            target.batch,
            target.valid,
            target.dims,
            w,
            None,
            self.kernel_size,
            self.stride,
            self.padding,
            compute_dtype=jnp.bfloat16,
            src_t3=src_t3,
            window=self.window_conv,
        )
        y = MaskedBatchNorm()(out.feats, out.valid, train)
        y = nn.relu(y) * out.valid[:, None].astype(y.dtype)
        return out.replace(feats=y.astype(jnp.bfloat16))


class SparseUNet(nn.Module):
    """Encoder-decoder sparse UNet returning features on the input active set.

    encoder_channels[i] lists the conv widths of stage i; stage 0 convs are
    all submanifold, stages ≥1 begin with the strided conv. decoder_channels
    give the merge-conv widths per decoder stage (deepest first); the last
    entry of each decoder stage is the inverse-conv (upsample) width.
    """

    base_channels: int = 64
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (128,), (128, 128, 128), (128, 128, 128), (256, 256, 256), (512, 512, 512)
    )
    encoder_strided_paddings: Sequence[Tuple[int, int, int]] = (
        (1, 1, 1), (1, 1, 1), (1, 1, 0), (1, 1, 1)
    )  # (x,y,z) padding of each stage's strided conv (stages 1..S)
    decoder_channels: Sequence[Sequence[int]] = (
        (512, 512, 256), (256, 256, 128), (128, 128, 128), (128, 128, 128)
    )
    stage_capacity_divisors: Sequence[int] = (1, 1, 2, 4, 8)
    # explicit per-stage capacities override the divisor formula when set
    stage_capacities: Optional[Sequence[int]] = None
    # active/total-cell occupancy above which convs take the dense MXU path
    dense_min_occupancy: float = 0.15
    # window-gather conv spec (w_size, blk, resid[, bwd]) for gather-path
    # stages; None disables (ops/sparse_conv.WindowSpec — exact fallback
    # built in)
    window_conv: Optional[Tuple[int, ...]] = None
    # apply the window spec under train=True too. Default False: the window
    # kernel wins the inference forward (−11 ms/frame full bench) but LOSES
    # the training step (+63 ms/step even with the backward on the gather
    # conv — measured 2026-08-19, docs/performance.md round-4 train A/B).
    # Same idea as spconv's per-pass algo selection: dispatch is a timing
    # choice, numerics are identical either way.
    window_conv_train: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False) -> jax.Array:
        cap0 = st.capacity
        # per-pass window dispatch (see window_conv_train above)
        win = self.window_conv if (not train or self.window_conv_train) else None
        if win is not None:
            # The straddling-group count scales ~linearly with batch size
            # (every sample seam splits tap-group runs, and capacities — and
            # with them block counts — are provisioned per sample). A FIXED
            # resid therefore trips the exact-fallback cond for every conv
            # at batch ≥ 2: measured batch-2 UNet 163.7 ms ≈ 2× the
            # gather-conv time (vs ~2×61 window expected) because n_grp >
            # resid everywhere. Scale the residual budget per sample.
            win = (win[0], win[1], win[2] * max(st.batch_size, 1)) + tuple(win[3:])
        # one x-triplet table + rulebook per stage, shared by every conv
        # touching that active set: the stage's submanifold convs (encoder +
        # decoder + final projection), the down-conv reading from it, and
        # the up-conv writing from it (ops/sparse_conv._x_triplet_table)
        t3s = [stage_table(st)]
        rulebooks = [build_subm_rulebook(st, t3=t3s[0], window=win)]
        st = _SubMBlock(
            self.base_channels, dense_min_occupancy=self.dense_min_occupancy,
            window_conv=win, name="conv_input",
        )(st, rulebooks[0], train)

        skips = []
        n_stages = len(self.encoder_channels)
        for i, widths in enumerate(self.encoder_channels):
            for j, c in enumerate(widths):
                if i > 0 and j == 0:
                    if self.stage_capacities is not None:
                        out_cap = int(self.stage_capacities[i])
                    else:
                        out_cap = max(128, cap0 // self.stage_capacity_divisors[i])
                    st = _DownBlock(
                        c,
                        padding=tuple(self.encoder_strided_paddings[i - 1]),
                        out_capacity=out_cap,
                        dense_min_occupancy=self.dense_min_occupancy,
                        window_conv=win,
                        name=f"enc{i}_down",
                    )(st, train, src_t3=t3s[i - 1])
                    t3s.append(stage_table(st))
                    rulebooks.append(build_subm_rulebook(
                        st, t3=t3s[i], window=win))
                else:
                    st = _SubMBlock(c, dense_min_occupancy=self.dense_min_occupancy, window_conv=win, name=f"enc{i}_subm{j}")(st, rulebooks[i], train)
            skips.append(st)

        x = skips[-1]
        for d in range(n_stages - 1):
            enc_stage = n_stages - 1 - d          # current (deep) stage index
            target = skips[enc_stage - 1]          # next finer active set
            widths = self.decoder_channels[d]
            skip = skips[enc_stage]
            merged = x.replace(feats=jnp.concatenate([x.feats, skip.feats], axis=1))
            y = merged
            for j, c in enumerate(widths[:-1]):
                y = _SubMBlock(c, dense_min_occupancy=self.dense_min_occupancy, window_conv=win, name=f"dec{d}_subm{j}")(y, rulebooks[enc_stage], train)
            x = _UpBlock(
                widths[-1],
                padding=tuple(self.encoder_strided_paddings[enc_stage - 1]),
                window_conv=win,
                name=f"dec{d}_up",
            )(y, target, train, src_t3=t3s[enc_stage])

        # final merge with stage-0 skip and projection to output_channels
        merged = x.replace(feats=jnp.concatenate([x.feats, skips[0].feats], axis=1))
        out = _SubMBlock(self.output_channels, dense_min_occupancy=self.dense_min_occupancy, window_conv=win, name="conv_out")(merged, rulebooks[0], train)
        # heads and the scatter neck expect f32
        return out.feats.astype(jnp.float32)
