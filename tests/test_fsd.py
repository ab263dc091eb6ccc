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
