"""End-to-end FSD branch tests on the synthetic scene."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.config import tiny_fsd_config
from fullysparsefusion_tpu.models.fsd import SingleStageFSD, group_sample, cluster_one_group
from fixtures import make_scene


@pytest.fixture(scope="module")
def fsd_setup():
    cfg = tiny_fsd_config()
    pb, gt = make_scene(seed=0, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
    model = SingleStageFSD(cfg=cfg)
    vars_ = model.init(
        jax.random.key(0), pb, 2, gt, False,
        method=lambda m, *a, **k: m(*a, **k),
    )
    return cfg, pb, gt, model, vars_


def test_fsd_forward_shapes(fsd_setup):
    cfg, pb, gt, model, vars_ = fsd_setup
    out = model.apply(vars_, pb, 2, None, False)
    C = cfg.caps.clusters
    assert out["cls_logits"].shape == (C, cfg.num_classes)
    assert out["reg_preds"].shape == (C, 10)
    assert out["cluster_xyz"].shape == (C, 3)
    assert int(out["num_clusters"]) > 0
    assert int(out["num_fg_points"]) > 0
    assert bool(jnp.isfinite(out["cls_logits"]).all())
    assert bool(jnp.isfinite(out["reg_preds"]).all())


def test_fsd_losses_finite_and_nonzero(fsd_setup):
    cfg, pb, gt, model, vars_ = fsd_setup
    out, updates = model.apply(
        vars_, pb, 2, gt, True, mutable=["batch_stats"]
    )
    losses = out["losses"]
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(losses["loss_sem_seg"]) > 0
    assert float(losses["loss_vote"]) >= 0
    assert float(losses["loss_cls"]) > 0


def test_fsd_grad_flows(fsd_setup):
    cfg, pb, gt, model, vars_ = fsd_setup

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]}, pb, 2, gt, False
        )
        ls = out["losses"]
        return sum(v for k, v in ls.items() if k.startswith("loss"))

    val, grads = jax.value_and_grad(loss_fn)(vars_["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    nonzero = sum(int(np.abs(l).sum() > 0) for l in leaves)
    assert nonzero > len(leaves) * 0.5, f"only {nonzero}/{len(leaves)} grads nonzero"


def test_fsd_get_bboxes(fsd_setup):
    cfg, pb, gt, model, vars_ = fsd_setup
    out = model.apply(vars_, pb, 2, None, False)
    res = model.apply(vars_, out, 2, method=SingleStageFSD.get_bboxes)
    assert res.boxes.shape == (2, cfg.head.max_num, 9)
    assert res.valid.dtype == bool


def test_group_sample_thresholds():
    cfg = tiny_fsd_config()
    n = 100
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(n, 11)).astype(np.float32))
    offsets = jnp.zeros((n, 33))
    xyz = jnp.asarray(rng.uniform(-5, 5, (n, 3)).astype(np.float32))
    valid = jnp.ones(n, bool)
    masks, centers = group_sample(logits, offsets, xyz, valid, cfg)
    assert len(masks) == 6 and len(centers) == 6
    scores = np.asarray(jax.nn.softmax(logits, axis=1))[:, :10]
    for g, cls_ids in enumerate(cfg.group_class_ids()):
        ref = scores[:, list(cls_ids)].sum(1) > cfg.score_thresh[g]
        np.testing.assert_array_equal(np.asarray(masks[g]), ref)
        # zero offsets → centers equal xyz
        np.testing.assert_allclose(np.asarray(centers[g]), np.asarray(xyz), atol=1e-6)


def test_group_sample_forces_one_fg_per_sample():
    """≥1-fg-point-per-sample guard (single_stage_fsd.py:832-834): with
    logits far below every threshold, each valid sample still surfaces
    exactly its first valid point per group; invalid rows never leak."""
    cfg = tiny_fsd_config()
    n = 64
    logits = jnp.full((n, 11), -20.0).at[:, 10].set(20.0)  # all background
    offsets = jnp.zeros((n, 33))
    xyz = jnp.zeros((n, 3))
    valid = (jnp.arange(n) % 4) != 3          # every 4th row is padding
    batch_idx = (jnp.arange(n) // 32).astype(jnp.int32)  # 2 samples
    masks, _ = group_sample(
        logits, offsets, xyz, valid, cfg, batch_idx=batch_idx, batch_size=2)
    for m in masks:
        m = np.asarray(m)
        assert m[:32].sum() == 1 and m[32:].sum() == 1
        assert m[0] and m[32]                 # first valid slot per sample
        assert not np.any(m & ~np.asarray(valid))
    # without batch_idx the guard is off: all-background → empty masks
    masks_off, _ = group_sample(logits, offsets, xyz, valid, cfg)
    assert all(int(np.asarray(m).sum()) == 0 for m in masks_off)
    # sample with zero valid points stays empty (nothing to force)
    masks2, _ = group_sample(
        logits, offsets, xyz, valid & (batch_idx == 0), cfg,
        batch_idx=batch_idx, batch_size=2)
    for m in masks2:
        assert int(np.asarray(m)[32:].sum()) == 0
    # out-of-range batch_idx rows are EXCLUDED from forcing (ADVICE r4:
    # pins the r4 rewrite's semantics — the old segment form clipped
    # negatives into sample 0; the new per-sample mask matches nothing)
    bad_batch = batch_idx.at[0].set(-1).at[33].set(2)
    masks3, _ = group_sample(
        logits, offsets, xyz, valid, cfg, batch_idx=bad_batch, batch_size=2)
    for m in masks3:
        m = np.asarray(m)
        assert not m[0] and not m[33]          # bad rows never forced
        assert m[:32].sum() == 1 and m[32:].sum() == 1  # next valid row wins


def test_cluster_one_group_two_blobs():
    cfg = tiny_fsd_config()
    rng = np.random.default_rng(1)
    a = rng.normal(0, 0.05, (30, 3)) + [0, 0, 0]
    b = rng.normal(0, 0.05, (30, 3)) + [5, 5, 0]
    centers = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    batch = jnp.zeros(60, jnp.int32)
    valid = jnp.ones(60, bool)
    lab, ok = cluster_one_group(centers, batch, valid, 0, cfg)
    lab = np.asarray(lab)
    ok = np.asarray(ok)
    assert ok.all()
    assert len(set(lab[:30])) == 1 and len(set(lab[30:])) == 1
    assert lab[0] != lab[59]


def test_cluster_all_groups_per_sample_matches_batch_mixed_oracle():
    """Per-sample re-slotted CCL (linear in batch) must induce the same
    cluster PARTITION as the batch-mixed cluster_one_group oracle at
    batch 2, per group — labels may be renumbered, membership may not."""
    from fullysparsefusion_tpu.models.fsd import cluster_all_groups

    cfg = tiny_fsd_config()
    rng = np.random.default_rng(4)
    k = 96
    cen_list, bat_list, v_list = [], [], []
    for g in range(cfg.num_groups):
        # clustered blobs spread over both samples, some invalid points
        blobs = rng.uniform(-8, 8, (6, 3))
        pick = rng.integers(0, 6, k)
        cen = (blobs[pick] + rng.normal(0, 0.08, (k, 3))).astype(np.float32)
        cen_list.append(jnp.asarray(cen))
        bat_list.append(jnp.asarray(rng.integers(0, 2, k).astype(np.int32)))
        v_list.append(jnp.asarray(rng.random(k) > 0.15))

    got = cluster_all_groups(cen_list, bat_list, v_list, cfg, batch_size=2)
    for g in range(cfg.num_groups):
        ref_lab, ref_ok = cluster_one_group(
            cen_list[g], bat_list[g], v_list[g], g, cfg)
        lab, ok = np.asarray(got[g][0]), np.asarray(got[g][1])
        ref_lab, ref_ok = np.asarray(ref_lab), np.asarray(ref_ok)
        np.testing.assert_array_equal(ok, ref_ok, err_msg=f"group {g}")
        # partition equivalence: same-cluster relation must match exactly
        b = np.asarray(bat_list[g])
        key_got = [(b[i], lab[i]) for i in range(k)]
        key_ref = [(b[i], ref_lab[i]) for i in range(k)]
        same_got = np.array(
            [[ok[i] and ok[j] and key_got[i] == key_got[j] for j in range(k)]
             for i in range(k)])
        same_ref = np.array(
            [[ref_ok[i] and ref_ok[j] and key_ref[i] == key_ref[j] for j in range(k)]
             for i in range(k)])
        np.testing.assert_array_equal(same_got, same_ref, err_msg=f"group {g}")
