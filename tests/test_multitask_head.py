"""Multi-task cluster-head algebra (reference sparse_cluster_head_v2.py):

per-task GT remap (:316-343), per-task loss keys, per-task NMS with
task-local → global label remap + cross-task concat (:449-493,598-607).
The shipped FSF configs run a single task; FSD-lineage configs split the
classes over several tasks (CenterPoint style).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.config import tiny_fsd_config, NUSC_GROUPS
from fullysparsefusion_tpu.models.heads import (
    task_label_tables, remap_gt_for_task, cluster_head_loss,
    multi_task_cluster_head_loss, multi_task_get_bboxes,
    cluster_head_get_bboxes,
)
from fullysparsefusion_tpu.utils.containers import GroundTruth
from fixtures import make_scene

CLASSES = tiny_fsd_config().class_names
TASKS3 = (("car", "truck", "bus"), ("pedestrian", "bicycle"), ("barrier",))


def test_task_label_tables_roundtrip():
    to_local, to_global = task_label_tables(CLASSES, TASKS3)
    assert len(to_local) == len(to_global) == 3
    for t, names in enumerate(TASKS3):
        for i, n in enumerate(names):
            ci = CLASSES.index(n)
            assert to_local[t][ci] == i
            assert to_global[t][i] == ci
        # classes outside the task map to -1
        outside = set(range(len(CLASSES))) - {CLASSES.index(n) for n in names}
        assert all(to_local[t][c] == -1 for c in outside)


def _random_clusters(rng, C, B, num_ch, code=10):
    cls_logits = jnp.asarray(rng.normal(size=(C, num_ch)).astype(np.float32))
    reg = jnp.asarray(rng.normal(0, 0.1, size=(C, code)).astype(np.float32))
    xyz = jnp.asarray(rng.uniform(-8, 8, (C, 3)).astype(np.float32))
    batch = jnp.asarray(rng.integers(0, B, C).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=C) > 0.1)
    return cls_logits, reg, xyz, batch, valid


def test_multi_task_loss_matches_filtered_gt_oracle():
    """Masked per-task GT remap ≡ physically filtering the GT to the task's
    classes (the reference materializes filtered tensors; static shapes
    mask instead)."""
    rng = np.random.default_rng(0)
    cfg = tiny_fsd_config().head
    B, M, C = 2, 8, 64
    _, gt = make_scene(seed=3, batch_size=B, boxes_per_sample=6, max_gt=M)
    to_local, to_global = task_label_tables(CLASSES, TASKS3)

    xyz_all, batch_all, valid_all = None, None, None
    cls_list, reg_list = [], []
    for names in TASKS3:
        cl, rg, xyz, bat, val = _random_clusters(rng, C, B, len(names))
        cls_list.append(cl)
        reg_list.append(rg)
        if xyz_all is None:
            xyz_all, batch_all, valid_all = xyz, bat, val

    multi = multi_task_cluster_head_loss(
        cls_list, reg_list, xyz_all, batch_all, valid_all, gt, cfg,
        TASKS3, CLASSES,
    )

    for t, names in enumerate(TASKS3):
        # oracle: physically repack the GT to only this task's classes
        boxes = np.asarray(gt.boxes)
        labels = np.asarray(gt.labels)
        valid = np.asarray(gt.valid)
        nb = np.zeros_like(boxes)
        nl = np.full_like(labels, -1)
        nv = np.zeros_like(valid)
        for b in range(B):
            k = 0
            for m in range(M):
                if not valid[b, m] or labels[b, m] < 0:
                    continue
                loc = to_local[t][labels[b, m]]
                if loc < 0:
                    continue
                nb[b, k] = boxes[b, m]
                nl[b, k] = loc
                nv[b, k] = True
                k += 1
        gt_t = GroundTruth(
            boxes=jnp.asarray(nb), labels=jnp.asarray(nl), valid=jnp.asarray(nv)
        )
        single = cluster_head_loss(
            cls_list[t], reg_list[t], xyz_all, batch_all, valid_all, gt_t, cfg
        )
        for k, v in single.items():
            np.testing.assert_allclose(
                float(multi[f"task{t}_{k}"]), float(v), rtol=1e-5, atol=1e-6,
                err_msg=f"task {t} {k}",
            )


def test_multi_task_get_bboxes_union_of_per_task_nms():
    rng = np.random.default_rng(1)
    cfg = dataclasses.replace(tiny_fsd_config().head, max_num=32)
    B, C = 2, 64
    _, to_global = task_label_tables(CLASSES, TASKS3)
    cls_list, reg_list = [], []
    xyz = bat = val = None
    for names in TASKS3:
        cl, rg, x, b_, v_ = _random_clusters(rng, C, B, len(names))
        cls_list.append(cl)
        reg_list.append(rg)
        if xyz is None:
            xyz, bat, val = x, b_, v_

    res = multi_task_get_bboxes(
        cls_list, reg_list, xyz, bat, val, B, cfg, TASKS3, CLASSES
    )
    T = len(TASKS3)
    assert res.boxes.shape == (B, T * cfg.max_num, res.boxes.shape[-1])
    lab = np.asarray(res.labels)
    valid = np.asarray(res.valid)
    assert valid.any()
    # labels are GLOBAL class ids, and each task's slice only emits its own
    for t, names in enumerate(TASKS3):
        sl = slice(t * cfg.max_num, (t + 1) * cfg.max_num)
        own = {CLASSES.index(n) for n in names}
        got = set(lab[:, sl][valid[:, sl]].tolist())
        assert got <= own, (t, got, own)
    assert np.all(lab[~valid] == -1)
    # per-task slice equals a standalone single-task NMS of that task
    for t in range(T):
        single = cluster_head_get_bboxes(
            cls_list[t], reg_list[t], xyz, bat, val, B, cfg
        )
        sl = slice(t * cfg.max_num, (t + 1) * cfg.max_num)
        np.testing.assert_allclose(
            np.asarray(res.scores)[:, sl], np.asarray(single.scores), atol=1e-6
        )
        np.testing.assert_array_equal(valid[:, sl], np.asarray(single.valid))


def test_multitask_fsd_trains_and_decodes_sharded():
    """VERDICT r2 #3 done-criterion: a 6-task config trains (sharded DP on
    the virtual mesh) and decodes."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fullysparsefusion_tpu.models.fsd import SingleStageFSD
    from fullysparsefusion_tpu.parallel.train import (
        TrainState, make_optimizer, make_generic_sharded_train_step,
        fsd_forward_fn,
    )

    cfg = tiny_fsd_config(tasks=NUSC_GROUPS)  # 6 tasks (the class groups)
    assert len(cfg.task_tuple()) == 6
    pb, gt = make_scene(seed=0, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
    model = SingleStageFSD(cfg=cfg)
    vars_ = model.init(
        jax.random.key(0), pb, 2, gt, False,
        method=lambda m, *a, **k: m(*a, **k),
    )
    out = model.apply(vars_, pb, 2, gt, False)
    losses = out["losses"]
    # per-task loss keys present and finite
    for t in range(6):
        assert f"task{t}_loss_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)

    # sharded train step on the full 8-device mesh
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("dp",))
    tx = make_optimizer(base_lr=1e-3, total_steps=10)
    step = make_generic_sharded_train_step(
        fsd_forward_fn(model, 1), tx, mesh, n_batch_args=2
    )
    pbs, gts = zip(*[
        make_scene(seed=10 + d, batch_size=1, n_cap=cfg.caps.points,
                   max_gt=cfg.caps.max_gt)
        for d in range(8)
    ])
    pb8 = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *pbs)
    gt8 = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *gts)
    sharding = NamedSharding(mesh, P("dp"))
    pb8 = jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), pb8)
    gt8 = jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), gt8)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=vars_["params"], batch_stats=vars_["batch_stats"],
        opt_state=tx.init(vars_["params"]),
    )
    state, loss, logs = step(state, pb8, gt8)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1

    # decode: [B, 6·max_num] with global labels
    res = model.apply(vars_, out, 2, method=SingleStageFSD.get_bboxes)
    assert res.boxes.shape[1] == 6 * cfg.head.max_num
    lab = np.asarray(res.labels)
    assert ((lab >= -1) & (lab < len(CLASSES))).all()
