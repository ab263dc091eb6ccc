"""CI-sized train-to-detection-quality closure (VERDICT r3 missing #4).

Loss descent alone cannot catch decode/NMS/assigner-sign bugs that cancel in
the loss; this test overfits tiny-FSF on ONE synthetic scene for a few dozen
steps and asserts mAP — through the FULL decode path (model forward →
get_bboxes → per-class NMS → eval/detection.py devkit protocol) — actually
rises. The reference's equivalent signal is real-data eval
(/root/reference/tools/dist_test.sh:10 --eval bbox); the full-scale curve
(train mAP 0.98 @ 500 steps) lives in docs/train_to_map.json via
tools/train_to_map.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fixtures import make_scene, make_camera_data, with_noaug_channels
from fullysparsefusion_tpu.config import tiny_fsf_config
from fullysparsefusion_tpu.eval.detection import (
    DetectionRecord, evaluate_detections,
)
from fullysparsefusion_tpu.models.fsf import FSF
from fullysparsefusion_tpu.parallel import (
    TrainState, make_optimizer, make_generic_train_step, fsf_forward_fn,
)

BATCH = 2
STEPS = 60
# labels restricted to 3 classes: 18 GT over 10 classes is 1-2 per class —
# per-class AP at that count is pure noise (see tools/train_to_map.py)
SCENE_CLASSES = 3


def _map_through_decode(model, vars_, fwd, pb, cam, gt, class_names):
    out = fwd(vars_, pb, cam)
    res = model.apply(vars_, out, BATCH, method=FSF.get_bboxes)
    recs = []
    for b in range(BATCH):
        v = np.asarray(res.valid[b])
        gv = np.asarray(gt.valid[b])
        recs.append(DetectionRecord(
            boxes=np.asarray(res.boxes[b])[v],
            scores=np.asarray(res.scores[b])[v],
            labels=np.asarray(res.labels[b])[v],
            gt_boxes=np.asarray(gt.boxes[b])[gv, :9],
            gt_labels=np.asarray(gt.labels[b])[gv],
        ))
    return evaluate_detections(recs, len(class_names), class_names)["mAP"]


def test_overfit_one_scene_raises_map():
    cfg = tiny_fsf_config()
    pb, gt = make_scene(
        seed=7, batch_size=BATCH, n_cap=cfg.caps.points,
        max_gt=cfg.caps.max_gt, num_classes=SCENE_CLASSES)
    cam = make_camera_data(pb, gt, batch_size=BATCH,
                           num_classes=cfg.num_classes)
    pb = with_noaug_channels(pb)

    model = FSF(cfg=cfg)
    vars_ = jax.jit(
        lambda k: model.init(
            k, pb, cam, BATCH, None, None, False,
            method=lambda m, *a, **kw: m(*a, **kw))
    )(jax.random.key(0))
    fwd = jax.jit(lambda v, p, c: model.apply(v, p, c, BATCH, None, None, False))

    tx = make_optimizer(base_lr=1e-3, total_steps=STEPS)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=vars_["params"],
        batch_stats=vars_["batch_stats"], opt_state=tx.init(vars_["params"]))
    step_fn = make_generic_train_step(fsf_forward_fn(model, BATCH), tx)

    ev = {"params": state.params, "batch_stats": state.batch_stats}
    map0 = _map_through_decode(model, ev, fwd, pb, cam, gt,
                               cfg.fsd.class_names)
    loss0 = None
    for _ in range(STEPS):
        state, loss, _ = step_fn(state, pb, cam, gt, gt)
        if loss0 is None:
            loss0 = float(np.asarray(loss))
    loss1 = float(np.asarray(loss))
    ev = {"params": state.params, "batch_stats": state.batch_stats}
    map1 = _map_through_decode(model, ev, fwd, pb, cam, gt,
                               cfg.fsd.class_names)

    assert np.isfinite(loss1) and loss1 < loss0 * 0.7, (loss0, loss1)
    # decode-path detection quality must actually move: an assigner-sign or
    # NMS bug leaves mAP flat even while the loss descends
    assert map1 > map0 + 0.08, (map0, map1)
    assert map1 > 0.12, (map0, map1)
