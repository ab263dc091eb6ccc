"""End-to-end FSF (LiDAR+camera fusion) tests on the synthetic scene."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.config import tiny_fsf_config
from fullysparsefusion_tpu.models.fsf import FSF
from fullysparsefusion_tpu.models.camera import (
    gather_point_instances, select_frustum_points, frustum_segments,
)
from fixtures import make_scene, make_camera_data, with_noaug_channels


@pytest.fixture(scope="module")
def fsf_setup():
    cfg = tiny_fsf_config()
    pb, gt = make_scene(seed=0, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
    cam = make_camera_data(pb, gt, num_classes=cfg.num_classes)
    pb = with_noaug_channels(pb)
    model = FSF(cfg=cfg)
    vars_ = model.init(
        jax.random.key(0), pb, cam, 2, gt, gt, False,
        method=lambda m, *a, **k: m(*a, **k),
    )
    return cfg, pb, gt, cam, model, vars_


def test_mask_grouping_consistency():
    cfg = tiny_fsf_config()
    pb, gt = make_scene(seed=1, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
    cam = make_camera_data(pb, gt, num_classes=cfg.num_classes)
    ids, ids_scores = gather_point_instances(pb.xyz, pb.batch_idx, pb.valid, cam)
    ids_np = np.asarray(ids)
    # packed texture scores follow ids: score > 0 exactly where an id is set
    sc_np = np.asarray(ids_scores)
    assert ((sc_np > 0) == (ids_np > 0)).all()
    assert ids_np.min() >= 0
    # points inside GT boxes mostly project into their instance's mask
    assert (ids_np > 0).any(), "no point hit any mask"
    sel = select_frustum_points(ids, pb.batch_idx, 3, cfg.caps.frustum_points)
    assert bool(sel.valid.any())
    seg, ob, orow = frustum_segments(sel, cam.max_anno, cfg.caps.frustum_objects)
    k = int(seg.num_segments)
    assert k > 0
    # every valid object row maps to a real anno row
    rows = np.asarray(orow)[np.asarray(seg.seg_valid)]
    assert (rows >= 0).all()
    valid_flags = np.asarray(cam.anno)[np.asarray(ob)[np.asarray(seg.seg_valid)], rows, 8]
    assert (valid_flags == 1).all()


def test_points_in_mask_compact_matches_full():
    """The K=2 compacted camera lookup must carry exactly the nonzero
    (id, score) set of the full [N, cams, cls] lookup — valid for surround
    rigs with pairwise camera overlap (points_in_mask_compact docstring)."""
    from fullysparsefusion_tpu.ops.projection import (
        points_in_mask, points_in_mask_compact)

    cfg = tiny_fsf_config()
    pb, gt = make_scene(seed=3, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
    cam = make_camera_data(pb, gt, num_classes=cfg.num_classes)
    masks_5d = np.asarray(cam.masks).reshape(
        cam.lidar2img.shape[0], cam.num_cams, cam.img_h, cam.img_w,
        cam.num_cls)
    ids_f, sc_f = points_in_mask(
        pb.xyz, pb.batch_idx, cam.lidar2img, jnp.asarray(masks_5d))
    ids_c, sc_c = points_in_mask_compact(
        pb.xyz, pb.batch_idx, cam.lidar2img, cam.masks, cam.img_h, cam.img_w)
    idf, scf = np.asarray(ids_f), np.asarray(sc_f)
    idc, scc = np.asarray(ids_c), np.asarray(sc_c)
    assert idc.shape[1] == 2
    # per point: the multiset of (cls, id, score) nonzero entries matches
    for p in range(0, idf.shape[0], 97):
        full = sorted(
            (c, idf[p, a, c], scf[p, a, c])
            for a in range(idf.shape[1]) for c in range(idf.shape[2])
            if idf[p, a, c] > 0)
        comp = sorted(
            (c, idc[p, a, c], scc[p, a, c])
            for a in range(idc.shape[1]) for c in range(idc.shape[2])
            if idc[p, a, c] > 0)
        assert full == comp, f"point {p}: {full} != {comp}"


def test_fsf_forward_and_detections(fsf_setup):
    cfg, pb, gt, cam, model, vars_ = fsf_setup
    out = model.apply(vars_, pb, cam, 2, None, None, False)
    fin = out["final"]
    q = cfg.caps.frustum_objects + cfg.caps.clusters
    assert fin["cls_logits"].shape == (q, cfg.num_classes)
    assert fin["reg_preds"].shape == (q, 10)
    assert bool(jnp.isfinite(fin["cls_logits"]).all())
    assert bool(jnp.isfinite(fin["reg_preds"]).all())
    assert int(out["frustum"]["obj_valid"].sum()) > 0, "no camera queries formed"
    res = model.apply(vars_, out, 2, method=FSF.get_bboxes)
    assert res.boxes.shape == (2, cfg.refined_head.max_num, 9)


def test_fsf_losses_and_grads(fsf_setup):
    cfg, pb, gt, cam, model, vars_ = fsf_setup

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            pb, cam, 2, gt, gt, False,
        )
        ls = out["losses"]
        return sum(v for k, v in ls.items() if "loss" in k), ls

    (val, ls), grads = jax.value_and_grad(loss_fn, has_aux=True)(vars_["params"])
    assert np.isfinite(float(val))
    for k, v in ls.items():
        assert np.isfinite(float(v)), (k, float(v))
    # all three query losses present
    assert any(k.startswith("frustum_") for k in ls)
    assert any(k.startswith("fsd_") for k in ls)
    assert any(k.startswith("stage0_") for k in ls)
    leaves, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    nonzero = sum(int(np.abs(l).sum() > 0) for l in leaves)
    assert nonzero > len(leaves) * 0.5, f"only {nonzero}/{len(leaves)} grads nonzero"
