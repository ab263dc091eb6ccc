"""Shape/invariance tests for VFE, SIR, and the sparse UNet."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.ops.segment import unique_segments
from fullysparsefusion_tpu.ops.sparse_conv import SparseTensor
from fullysparsefusion_tpu.models.vfe import DynamicScatterVFE, SIRLayer
from fullysparsefusion_tpu.models.sir import SIR
from fullysparsefusion_tpu.models.sparse_unet import SparseUNet


def _points(seed=0, n=200, d=5):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-5, 5, size=(n, d)).astype(np.float32)
    keys = rng.integers(0, 40, size=n).astype(np.int32)
    valid = rng.random(n) > 0.1
    return jnp.asarray(pts), jnp.asarray(keys), jnp.asarray(valid)


def test_vfe_shapes_and_padding_invariance():
    pts, keys, valid = _points()
    cap = 64
    seg = unique_segments(keys, valid, cap)
    vox_coords = jnp.zeros((cap, 3), jnp.int32)
    m = DynamicScatterVFE(feat_channels=(16, 16))
    vars_ = m.init(jax.random.key(0), pts, seg, vox_coords, valid, False)
    out = m.apply(vars_, pts, seg, vox_coords, valid, False)
    assert out.shape == (cap, 16)

    # changing feature values of INVALID points must not change the output
    pts2 = jnp.where(valid[:, None], pts, pts + 100.0)
    out2 = m.apply(vars_, pts2, seg, vox_coords, valid, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_vfe_train_updates_bn_stats():
    pts, keys, valid = _points(1)
    seg = unique_segments(keys, valid, 64)
    vox_coords = jnp.zeros((64, 3), jnp.int32)
    m = DynamicScatterVFE(feat_channels=(8, 8))
    vars_ = m.init(jax.random.key(0), pts, seg, vox_coords, valid, True)
    out, updates = m.apply(
        vars_, pts, seg, vox_coords, valid, True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(vars_["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_sir_output_dims_and_invariance():
    pts, keys, valid = _points(2, n=150, d=5)
    cap = 48
    seg = unique_segments(keys, valid, cap)
    feats = jnp.ones((150, 32))
    f_cluster = jnp.zeros((150, 3))
    m = SIR(num_blocks=3, feat_channels=((64, 64),) * 3, rel_mlp_hidden_dims=((8, 16),) * 3)
    vars_ = m.init(jax.random.key(0), pts, feats, f_cluster, seg, valid, False)
    pf, cf = m.apply(vars_, pts, feats, f_cluster, seg, valid, False)
    assert pf.shape == (150, 64)
    assert cf.shape == (cap, 3 * 128)  # 3 blocks × (64+64)
    # invalid point features don't leak into cluster feats
    feats2 = jnp.where(valid[:, None], feats, 99.0)
    _, cf2 = m.apply(vars_, pts, feats2, f_cluster, seg, valid, False)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf2), atol=1e-5)


def _toy_sparse(seed=0, cap=256, cin=8, dims=(16, 16, 8), n=100, bs=2):
    rng = np.random.default_rng(seed)
    coords, batch = [], []
    for bi in range(bs):
        lin = rng.choice(dims[0] * dims[1] * dims[2], size=n, replace=False)
        coords.append(
            np.stack([lin % dims[0], (lin // dims[0]) % dims[1], lin // (dims[0] * dims[1])], 1)
        )
        batch.append(np.full(n, bi))
    coords = np.concatenate(coords).astype(np.int32)
    batch = np.concatenate(batch).astype(np.int32)
    ntot = len(coords)
    feats = rng.normal(size=(ntot, cin)).astype(np.float32)
    pad = cap - ntot
    return SparseTensor(
        feats=jnp.asarray(np.concatenate([feats, np.zeros((pad, cin), np.float32)])),
        coords=jnp.asarray(np.concatenate([coords, np.zeros((pad, 3), np.int32)])),
        batch=jnp.asarray(np.concatenate([batch, np.zeros(pad, np.int32)])),
        valid=jnp.asarray(np.concatenate([np.ones(ntot, bool), np.zeros(pad, bool)])),
        dims=dims,
    ), ntot


def test_sparse_unet_runs_and_aligns():
    st, ntot = _toy_sparse()
    m = SparseUNet(
        base_channels=8,
        output_channels=16,
        encoder_channels=((8,), (16, 16), (32, 32)),
        encoder_strided_paddings=((1, 1, 1), (1, 1, 1)),
        decoder_channels=((32, 16), (16, 16)),
        stage_capacity_divisors=(1, 1, 2),
    )
    vars_ = m.init(jax.random.key(0), st, False)
    out = m.apply(vars_, st, False)
    assert out.shape == (st.capacity, 16)
    got = np.asarray(out)
    assert np.all(np.isfinite(got))
    # padded rows produce zeros
    np.testing.assert_array_equal(got[ntot:], 0.0)
    # valid rows see real features
    assert np.abs(got[:ntot]).sum() > 0

    # padding invariance: garbage in invalid rows doesn't change valid outputs
    st2 = st.replace(feats=jnp.where(st.valid[:, None], st.feats, 123.0))
    out2 = np.asarray(m.apply(vars_, st2, False))
    np.testing.assert_allclose(got[:ntot], out2[:ntot], atol=1e-4)


def test_sparse_unet_compact_pair_rate_matches():
    """compact_pair_rate routes stage convs through the pair-compacted form;
    outputs must match the full-capacity gathers to bf16 activation noise
    and the parameter tree must be unchanged."""
    st, ntot = _toy_sparse(2)
    kw = dict(
        base_channels=8,
        output_channels=16,
        encoder_channels=((8,), (16, 16)),
        encoder_strided_paddings=((1, 1, 1),),
        decoder_channels=((16, 8),),
        stage_capacity_divisors=(1, 1),
        dense_min_occupancy=2.0,  # keep every conv on the gather path
    )
    m0 = SparseUNet(**kw)
    m1 = SparseUNet(**kw, compact_pair_rate=1.0, compact_stages=(0, 1))
    vars_ = m0.init(jax.random.key(0), st, False)
    assert jax.tree_util.tree_structure(vars_) == jax.tree_util.tree_structure(
        m1.init(jax.random.key(0), st, False)
    )
    o0 = np.asarray(jax.jit(lambda v: m0.apply(v, st, False))(vars_))
    o1 = np.asarray(jax.jit(lambda v: m1.apply(v, st, False))(vars_))
    # inter-conv activations are bf16 — different f32 accumulation order
    # re-quantizes within one bf16 ulp
    np.testing.assert_allclose(o0, o1, atol=4e-3, rtol=4e-3)
    np.testing.assert_array_equal(o1[ntot:], 0.0)

    # per-stage rates: stage 1 disabled (rate 0) must still match, and a
    # tuple scalar-equivalent must reproduce the scalar-rate output exactly
    m2 = SparseUNet(**kw, compact_pair_rate=(1.0, 0.0), compact_stages=(0, 1))
    o2 = np.asarray(jax.jit(lambda v: m2.apply(v, st, False))(vars_))
    np.testing.assert_allclose(o0, o2, atol=4e-3, rtol=4e-3)
    m3 = SparseUNet(**kw, compact_pair_rate=(1.0, 1.0), compact_stages=(0, 1))
    o3 = np.asarray(jax.jit(lambda v: m3.apply(v, st, False))(vars_))
    np.testing.assert_array_equal(o1, o3)

    # train mode builds the mirrored pair lists (two-sided compaction);
    # gradients through them track the full-capacity backward. Exact parity
    # is proven at f32 at the op level (test_compact_rulebook_conv_matches_
    # full); through the bf16 inter-conv activations the two forms round
    # differently and the toy-scale chain (6 convs + train BN) amplifies
    # that to tens of percent elementwise — assert direction (cosine) and
    # finiteness here, not magnitudes.
    def loss(m, params):
        out, _ = m.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            st, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(vars_["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(vars_["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
        assert np.isfinite(b).all()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 1e-6 and nb > 1e-6:
            cos = float(a @ b / (na * nb))
            assert cos > 0.95, cos


def test_sparse_unet_jit_and_grad():
    st, ntot = _toy_sparse(1)
    m = SparseUNet(
        base_channels=8,
        output_channels=8,
        encoder_channels=((8,), (16, 16)),
        encoder_strided_paddings=((1, 1, 1),),
        decoder_channels=((16, 8),),
        stage_capacity_divisors=(1, 1),
    )
    vars_ = m.init(jax.random.key(0), st, False)

    @jax.jit
    def loss_fn(params):
        out = m.apply({"params": params, "batch_stats": vars_["batch_stats"]}, st, False)
        return jnp.sum(out**2)

    g = jax.grad(loss_fn)(vars_["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    assert any(np.abs(l).sum() > 0 for l in leaves)


def test_cluster_head_iou_branch_and_corner_loss():
    """Optional IoU branch + corner loss (sparse_cluster_head.py:197-247,
    339-361; off in shipped configs)."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fullysparsefusion_tpu.config import HeadConfig
    from fullysparsefusion_tpu.models.heads import (
        SparseClusterHead, cluster_head_loss,
    )
    from fullysparsefusion_tpu.utils.containers import GroundTruth

    cfg = HeadConfig(
        in_channel=32, shared_mlp_dims=(32, 32),
        common_attrs=(("center", 3, 1, 16), ("dim", 3, 1, 16),
                      ("rot", 2, 1, 16), ("vel", 2, 1, 16)),
        num_cls_layer=1, cls_hidden_dim=16, num_classes=3,
        with_iou=True, with_corner_loss=True,
    )
    head = SparseClusterHead(cfg=cfg, tasks=(("a", "b", "c"),),
                             class_names=("a", "b", "c"))
    rng = np.random.default_rng(0)
    C = 24
    feats = jnp.asarray(rng.normal(size=(C, 32)).astype(np.float32))
    valid = jnp.asarray(rng.random(C) < 0.9)
    vars_ = head.init(jax.random.key(0), feats, valid, False)
    out = head.apply(vars_, feats, valid, False)
    assert "iou_logits" in out and out["iou_logits"][0].shape == (C,)

    xyz = jnp.asarray(rng.uniform(-10, 10, (C, 3)).astype(np.float32))
    batch = jnp.zeros(C, jnp.int32)
    boxes = np.zeros((1, 4, 10), np.float32)
    boxes[0, :, :7] = [[0, 0, -1, 3, 2, 1.5, 0.3]] * 4
    boxes[0, :, 0] = [0, 5, -5, 8]
    boxes[0, :, 9] = 1.0
    gt = GroundTruth(
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray(np.array([[0, 1, 2, 0]], np.int32)),
        valid=jnp.asarray(np.ones((1, 4), bool)),
    )
    losses = cluster_head_loss(
        out["cls_logits"][0], out["reg_preds"][0], xyz, batch, valid, gt, cfg,
        iou_logits=out["iou_logits"][0],
    )
    assert "loss_corner" in losses and "loss_iou" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # gradients flow through both optional branches
    def f(p):
        o = head.apply({"params": p}, feats, valid, False)
        l = cluster_head_loss(
            o["cls_logits"][0], o["reg_preds"][0], xyz, batch, valid, gt, cfg,
            iou_logits=o["iou_logits"][0],
        )
        return l["loss_corner"] + l["loss_iou"]
    g = jax.grad(f)(vars_["params"])
    norm = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(g))))
    assert norm > 0


def test_cluster_head_assign_recall_diagnostic():
    """assign_recall (sparse_cluster_head.py:442-450): fraction of valid GT
    claimed by ≥1 positive cluster — 0.5 when one of two GT is covered."""
    import numpy as np
    import jax.numpy as jnp
    from fullysparsefusion_tpu.config import HeadConfig
    from fullysparsefusion_tpu.models.heads import cluster_head_loss
    from fullysparsefusion_tpu.utils.containers import GroundTruth

    cfg = HeadConfig(
        in_channel=8, shared_mlp_dims=(8,),
        common_attrs=(("center", 3, 1, 8), ("dim", 3, 1, 8),
                      ("rot", 2, 1, 8), ("vel", 2, 1, 8)),
        num_cls_layer=1, cls_hidden_dim=8, num_classes=2,
    )
    boxes = np.zeros((1, 2, 10), np.float32)
    boxes[0, 0, :7] = [0, 0, 0, 6, 6, 4, 0.0]
    boxes[0, 1, :7] = [50, 50, 0, 6, 6, 4, 0.0]  # never claimed
    gt = GroundTruth(
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray([[0, 1]], np.int32),
        valid=jnp.asarray([[True, True]]),
    )
    xyz = jnp.asarray([[0.2, 0.0, 0.0], [30.0, 0.0, 0.0]], jnp.float32)
    batch = jnp.zeros(2, jnp.int32)
    valid = jnp.ones(2, bool)
    losses = cluster_head_loss(
        jnp.zeros((2, 2), jnp.float32), jnp.zeros((2, 10), jnp.float32),
        xyz, batch, valid, gt, cfg,
    )
    np.testing.assert_allclose(float(losses["assign_recall"]), 0.5)
    # an invalid second GT makes recall 1.0 (denominator counts valid only)
    gt2 = GroundTruth(
        boxes=gt.boxes, labels=gt.labels,
        valid=jnp.asarray([[True, False]]),
    )
    l2 = cluster_head_loss(
        jnp.zeros((2, 2), jnp.float32), jnp.zeros((2, 10), jnp.float32),
        xyz, batch, valid, gt2, cfg,
    )
    np.testing.assert_allclose(float(l2["assign_recall"]), 1.0)


def test_cluster_head_dist_label_mode():
    """IoU-branch 'dist' labeling (frustum_cluster_head.py get_dist_labels
    :475-500): positives get a BEV-distance ramp 1→0 between the two
    thresholds; background clusters get exactly 0."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from fullysparsefusion_tpu.config import HeadConfig
    from fullysparsefusion_tpu.models.heads import cluster_head_loss
    from fullysparsefusion_tpu.utils.containers import GroundTruth

    cfg = HeadConfig(
        in_channel=8, shared_mlp_dims=(8,),
        common_attrs=(("center", 3, 1, 8), ("dim", 3, 1, 8),
                      ("rot", 2, 1, 8), ("vel", 2, 1, 8)),
        num_cls_layer=1, cls_hidden_dim=8, num_classes=2,
        with_iou=True, iou_label_mode="dist",
        dist_min_thre=0.5, dist_max_thre=2.0,
    )
    # one GT box at origin; clusters at BEV distances 0.2 (pos, label 1),
    # 1.25 (pos, ramp = (2−1.25)/1.5 = 0.5), and 30 (background, label 0)
    boxes = np.zeros((1, 1, 10), np.float32)
    boxes[0, 0, :7] = [0, 0, 0, 6, 6, 4, 0.0]
    gt = GroundTruth(
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray([[0]], np.int32),
        valid=jnp.asarray([[True]]),
    )
    xyz = jnp.asarray(
        [[0.2, 0.0, 0.0], [1.25, 0.0, 0.0], [30.0, 0.0, 0.0]], jnp.float32)
    batch = jnp.zeros(3, jnp.int32)
    valid = jnp.ones(3, bool)
    C = 3
    cls_logits = jnp.zeros((C, 2), jnp.float32)
    reg_preds = jnp.zeros((C, 10), jnp.float32)
    # iou_logits exactly equal to the expected labels → loss_iou == 0
    expected = jnp.asarray([1.0, 0.5, 0.0], jnp.float32)
    l0 = cluster_head_loss(
        cls_logits, reg_preds, xyz, batch, valid, gt, cfg, iou_logits=expected)
    assert float(l0["loss_iou"]) < 1e-6
    # shifting the logits by d changes the L1 by d·C/valid_count = d
    l1 = cluster_head_loss(
        cls_logits, reg_preds, xyz, batch, valid, gt, cfg,
        iou_logits=expected + 0.3)
    np.testing.assert_allclose(float(l1["loss_iou"]), 0.3, rtol=1e-5)
