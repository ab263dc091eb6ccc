"""Two-stage RCNN head tests on the synthetic scene."""
import numpy as np
import jax
import jax.numpy as jnp

from fullysparsefusion_tpu.config import tiny_fsd_config
from fullysparsefusion_tpu.models.rcnn import (
    GroupCorrectionHead, assign_rois_by_iou, rcnn_loss, rcnn_get_bboxes,
)
from fixtures import make_scene


def test_assign_rois_by_iou():
    from fullysparsefusion_tpu.utils.containers import GroundTruth

    gt = GroundTruth(
        boxes=jnp.asarray([[[0, 0, 0, 4, 4, 2, 0, 0, 0, 1]]], jnp.float32),
        labels=jnp.asarray([[1]], jnp.int32),
        valid=jnp.asarray([[True]]),
    )
    rois = jnp.asarray(
        [[0.2, 0, 0, 4, 4, 2, 0], [20, 0, 0, 4, 4, 2, 0]], jnp.float32
    )
    a, iou = assign_rois_by_iou(rois, jnp.zeros(2, jnp.int32), jnp.ones(2, bool), gt)
    assert int(a[0]) == 0 and int(a[1]) == -1
    assert float(iou[0]) > 0.8


def test_rcnn_head_end_to_end():
    cfg = tiny_fsd_config()
    pb, gt = make_scene(seed=0, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
    # proposals = jittered GT boxes
    rng = np.random.default_rng(0)
    q = 16
    flat = np.asarray(gt.boxes).reshape(-1, 10)
    fv = np.asarray(gt.valid).reshape(-1)
    fb = np.repeat(np.arange(2), gt.boxes.shape[1])
    sel = np.where(fv)[0][:q]
    rois = np.zeros((q, 7), np.float32)
    rois[: len(sel)] = flat[sel, :7] + rng.normal(0, 0.1, (len(sel), 7)).astype(np.float32)
    roi_batch = np.zeros(q, np.int32)
    roi_batch[: len(sel)] = fb[sel]
    roi_valid = np.arange(q) < len(sel)

    head = GroupCorrectionHead(
        cfg=cfg.head, caps=cfg.caps,
        sir_feat_channels=((32, 32),) * 2, sir_rel_mlp_hidden=((8, 16),) * 2,
        reg_mlp=(64,), cls_mlp=(64,),
    )
    feats = jnp.ones((cfg.caps.points, 16))
    vars_ = head.init(
        jax.random.key(0), pb.points, feats, pb.batch_idx, pb.valid,
        jnp.asarray(rois), jnp.asarray(roi_batch), jnp.asarray(roi_valid), False,
    )
    outs = head.apply(
        vars_, pb.points, feats, pb.batch_idx, pb.valid,
        jnp.asarray(rois), jnp.asarray(roi_batch), jnp.asarray(roi_valid), False,
    )
    assert outs["cls_logits"].shape == (q, cfg.num_classes)
    assert bool(jnp.isfinite(outs["reg_preds"]).all())
    assert int(outs["nonempty"].sum()) > 0

    losses = rcnn_loss(
        outs, jnp.asarray(rois), jnp.asarray(roi_batch), jnp.asarray(roi_valid),
        gt, cfg.head,
    )
    assert np.isfinite(float(losses["rcnn_loss_cls"]))
    assert float(losses["rcnn_num_pos"]) > 0

    res = rcnn_get_bboxes(outs, jnp.asarray(rois), jnp.asarray(roi_batch), 2, cfg.head)
    assert res.boxes.shape[0] == 2
