"""HTC activation-parity harness self-consistency (VERDICT r2 #9).

No mmdet/checkpoint exists in this environment, so the harness is proven
on itself: dump → npz round-trip → compare is exact, and a perturbation of
any single module's weights is (a) detected and (b) attributed to the
EARLIEST divergent module in the canonical order — the property that makes
the harness useful for localizing conversion bugs on day 1 with a real
checkpoint.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fullysparsefusion_tpu.models.htc import HTC
from fullysparsefusion_tpu.utils.htc_parity import (
    dump_jax_activations, save_activations, load_activations,
    compare_activations, first_divergent, ACTIVATION_ORDER,
)

HW = (64, 96)


@pytest.fixture(scope="module")
def tiny_htc():
    model = HTC(depth_blocks=(1, 1, 1, 1), num_proposals=16,
                rpn_pre_nms=16, max_dets=4)
    img = jax.random.uniform(jax.random.key(1), (1, *HW, 3), jnp.float32,
                             0, 255)
    vars_ = model.init(jax.random.key(0), img)
    rois = np.asarray(
        [[4, 4, 40, 30], [10, 8, 60, 50], [0, 0, 90, 60], [30, 20, 50, 44]],
        np.float32,
    )
    return model, vars_, img, rois


def test_roundtrip_self_match(tiny_htc, tmp_path):
    model, vars_, img, rois = tiny_htc
    acts = dump_jax_activations(model, vars_, img, rois)
    # every canonical tap is produced, none extra
    assert set(acts) == set(ACTIVATION_ORDER)
    p = str(tmp_path / "acts.npz")
    save_activations(acts, p)
    rows = compare_activations(load_activations(p), acts, atol=0, rtol=0)
    assert first_divergent(rows) is None
    assert all(r["max_abs"] == 0.0 for r in rows)


def _perturb(vars_, path, eps=0.5):
    node = vars_["params"]
    for k in path[:-1]:
        node = node[k]
    leaf = node[path[-1]]

    def set_in(tree, path, v):
        if len(path) == 1:
            return {**tree, path[0]: v}
        return {**tree, path[0]: set_in(tree[path[0]], path[1:], v)}

    params = set_in(vars_["params"], list(path), leaf + eps)
    return {**vars_, "params": params}


def test_backbone_perturbation_attributed_to_c4(tiny_htc):
    model, vars_, img, rois = tiny_htc
    ref = dump_jax_activations(model, vars_, img, rois)
    # layer3_* lives in backbone stage 2 → first divergent tap is c4;
    # c2/c3 (upstream) must stay exact
    name = next(k for k in vars_["params"]["backbone"] if "layer3" in k)
    wkey = next(iter(vars_["params"]["backbone"][name]))
    leafk = next(iter(vars_["params"]["backbone"][name][wkey]))
    pert = _perturb(vars_, ("backbone", name, wkey, leafk))
    rows = compare_activations(
        ref, dump_jax_activations(model, pert, img, rois))
    byname = {r["name"]: r for r in rows}
    assert byname["backbone.c2"]["ok"] and byname["backbone.c3"]["ok"]
    assert first_divergent(rows) == "backbone.c4"
    # FPN top-down pathway spreads the change to every pyramid level
    assert not byname["fpn.p2"]["ok"]


def test_head_perturbation_isolated_by_fixed_rois(tiny_htc):
    model, vars_, img, rois = tiny_htc
    ref = dump_jax_activations(model, vars_, img, rois)
    params = vars_["params"]["bbox_head1"]
    k1 = next(iter(params))
    k2 = next(iter(params[k1]))
    pert = _perturb(vars_, ("bbox_head1", k1, k2))
    rows = compare_activations(
        ref, dump_jax_activations(model, pert, img, rois))
    byname = {r["name"]: r for r in rows}
    # all image-level taps and stage-0 taps unaffected
    for k in ACTIVATION_ORDER[:ACTIVATION_ORDER.index("roi.bbox_feats1") + 1]:
        assert byname[k]["ok"], k
    assert first_divergent(rows) in ("bbox_head1.cls", "bbox_head1.reg")
    # stage-2 rois flow from stage-1 decode → downstream diverges
    assert not byname["bbox_head2.rois"]["ok"]


def test_compare_flags_shape_and_missing_keys(tiny_htc):
    model, vars_, img, rois = tiny_htc
    acts = dump_jax_activations(model, vars_, img)  # image-level taps only
    assert "bbox_head0.cls" not in acts
    other = dict(acts)
    other["backbone.c2"] = acts["backbone.c2"][:, :2]  # wrong shape
    del other["fpn.p3"]
    rows = compare_activations(acts, other)
    byname = {r["name"]: r for r in rows}
    assert not byname["backbone.c2"]["ok"]
    assert byname["backbone.c2"]["max_abs"] is None
    assert not byname["fpn.p3"]["ok"]
