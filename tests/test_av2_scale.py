"""AV2-grid-scale shakeout (VERDICT r2 #4).

The AV2 config runs a [32, 2048, 2048] stage-0 grid (FSF_AV2_config.py:87)
— 134 M cells. That exceeds the x-triplet table budget (the [cells, 3]
table would be 1.6 GB) but fits the raised dense-lookup budget, so AV2
stage 0 takes the MIDDLE tier: O(1) scalar lookups from the dense row
table, no triplet table, never the ~20 ms/map sorted fallback. These tests
pin the tier decisions at the real AV2 dims and prove the middle tier is
bit-exact with the triplet path on a full UNet forward.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fullysparsefusion_tpu.ops.sparse_conv as sc
from fullysparsefusion_tpu.ops.sparse_conv import SparseTensor
from fullysparsefusion_tpu.models.sparse_unet import SparseUNet

AV2_STAGE0_DIMS = (2048, 2048, 32)   # (nx, ny, nz) at 0.2 m over ±204.8/6.4


def _st(dims, batch_size=1, cap=4):
    return SparseTensor(
        feats=jnp.zeros((cap, 1), jnp.float32),
        coords=jnp.zeros((cap, 3), jnp.int32),
        batch=jnp.zeros((cap,), jnp.int32),
        valid=jnp.ones((cap,), bool),
        dims=dims, batch_size=batch_size,
    )


def test_av2_grid_tier_decisions():
    st = _st(AV2_STAGE0_DIMS)
    assert sc._use_dense(st), "AV2 stage 0 must get the dense lookup table"
    assert not sc._use_triplets(st), (
        "AV2 stage 0 must NOT build the triplet table (1.6 GB at this grid)"
    )
    # batch 2 at AV2 stage 0 exceeds even the dense budget → sorted fallback
    assert not sc._use_dense(_st(AV2_STAGE0_DIMS, batch_size=2))
    # stage 1 ([16, 1024, 1024] = 16.8M cells) fits both budgets
    assert sc._use_triplets(_st((1024, 1024, 16)))
    # nuScenes stage 0 ([40, 512, 512]) unchanged: triplets
    assert sc._use_triplets(_st((512, 512, 40)))


def _unet_scene(dims, n=512, seed=0, batch_size=2, cap=768):
    rng = np.random.default_rng(seed)
    nx, ny, nz = dims
    coords = np.stack([
        rng.integers(0, nx, n), rng.integers(0, ny, n), rng.integers(0, nz, n)
    ], 1).astype(np.int32)
    batch = rng.integers(0, batch_size, n).astype(np.int32)
    valid = rng.random(n) > 0.1
    key = ((batch * nz + coords[:, 2]) * ny + coords[:, 1]) * nx + coords[:, 0]
    _, first = np.unique(key, return_index=True)
    keep = np.zeros(n, bool)
    keep[first] = True
    valid &= keep
    pad = cap - n
    feats = rng.normal(size=(cap, 8)).astype(np.float32)
    return SparseTensor(
        feats=jnp.asarray(feats),
        coords=jnp.asarray(np.pad(coords, ((0, pad), (0, 0)))),
        batch=jnp.asarray(np.pad(batch, (0, pad))),
        valid=jnp.asarray(np.pad(valid, (0, pad))),
        dims=dims, batch_size=batch_size,
    )


def test_unet_middle_tier_matches_triplet_path():
    """Full UNet forward at AV2-SHAPED dims (z = 32, x/y scaled down so the
    triplet path is also buildable for the oracle): forcing the middle tier
    on every stage must be bit-exact with the triplet fast path."""
    dims = (256, 256, 32)
    st = _unet_scene(dims)
    unet = SparseUNet(
        base_channels=8, output_channels=16,
        encoder_channels=((8,), (16, 16), (16, 16)),
        encoder_strided_paddings=((1, 1, 1), (1, 1, 0)),
        decoder_channels=((16, 16), (16, 16)),
        stage_capacity_divisors=(1, 1, 2),
        dense_min_occupancy=1.1,  # never the dense-conv path: isolate lookups
    )
    vars_ = unet.init(jax.random.key(0), st, False)
    ref = np.asarray(jax.jit(lambda v, s: unet.apply(v, s, False))(vars_, st))

    orig = sc.TRIPLET_MAX_CELLS
    try:
        sc.TRIPLET_MAX_CELLS = 0  # force the middle tier everywhere
        mid = np.asarray(
            jax.jit(lambda v, s: unet.apply(v, s, False))(vars_, st))
    finally:
        sc.TRIPLET_MAX_CELLS = orig
    np.testing.assert_array_equal(ref, mid)


def test_unet_middle_tier_grads_match():
    """The custom-VJP backward rebuilds mirrored rulebooks — the middle
    tier must produce identical gradients too."""
    dims = (128, 128, 16)
    st = _unet_scene(dims, n=256, cap=384)
    unet = SparseUNet(
        base_channels=8, output_channels=8,
        encoder_channels=((8,), (8, 8)),
        encoder_strided_paddings=((1, 1, 1),),
        decoder_channels=((8, 8),),
        stage_capacity_divisors=(1, 1),
        dense_min_occupancy=1.1,
    )
    vars_ = unet.init(jax.random.key(0), st, False)

    def loss(v, s):
        return jnp.sum(unet.apply(v, s, False) ** 2)

    g_ref = jax.jit(jax.grad(loss))(vars_, st)
    orig = sc.TRIPLET_MAX_CELLS
    try:
        sc.TRIPLET_MAX_CELLS = 0
        g_mid = jax.jit(jax.grad(loss))(vars_, st)
    finally:
        sc.TRIPLET_MAX_CELLS = orig
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g_ref, g_mid,
    )
