"""HTC 2D pre-inference model: oracles + end-to-end smoke.

Reference: projects/configs/_base_/nuimages/htc_*; run path
tools/mask_tools/save_mask_nusc.py:195-218.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullysparsefusion_tpu.models.htc import (
    HTC, base_anchors, build_htc, delta_decode, level_anchors,
)
from fullysparsefusion_tpu.ops.roi_align import (
    map_rois_to_levels, multilevel_roi_align, roi_align,
)
from fullysparsefusion_tpu.ops.dcn import deform_conv2d


def test_roi_align_oracle_constant_map():
    # constant feature map: any valid roi pools to the constant
    feat = jnp.full((16, 16, 3), 2.5)
    rois = jnp.asarray([[4.0, 4.0, 12.0, 12.0], [0.0, 0.0, 15.0, 15.0]])
    valid = jnp.asarray([True, False])
    out = roi_align(feat, rois, valid, out_size=7, spatial_scale=1.0)
    assert out.shape == (2, 7, 7, 3)
    np.testing.assert_allclose(np.asarray(out[0]), 2.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)  # invalid → zeros


def test_roi_align_oracle_linear_ramp():
    # f(y, x) = x: bilinear sampling is exact on a linear ramp, so each
    # output bin equals the mean x-coordinate of its sample points
    h = w = 32
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (h, w))
    feat = xs[..., None]
    roi = jnp.asarray([[8.0, 8.0, 24.0, 24.0]])
    out = roi_align(feat, roi, jnp.asarray([True]), 4, 1.0)
    # bin j spans x ∈ [7.5 + 4j, 7.5 + 4(j+1)]; sample mean = center
    expect = 7.5 + 4.0 * (np.arange(4) + 0.5)
    np.testing.assert_allclose(np.asarray(out[0, 0, :, 0]), expect, atol=1e-4)


def test_map_rois_to_levels():
    rois = jnp.asarray([
        [0, 0, 40, 40],      # 40 px → level 0
        [0, 0, 112, 112],    # level 1
        [0, 0, 224, 224],    # level 2
        [0, 0, 900, 900],    # level 3 (clamped)
    ], jnp.float32)
    lvl = map_rois_to_levels(rois, 4)
    assert lvl.tolist() == [0, 1, 2, 3]


def test_multilevel_matches_single_level():
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(64 // s, 64 // s, 8)), jnp.float32)
             for s in (4, 8, 16, 32)]
    rois = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])  # 32 px → level 0
    valid = jnp.asarray([True])
    out = multilevel_roi_align(feats, (4, 8, 16, 32), rois, valid, 7)
    ref = roi_align(feats[0], rois, valid, 7, 1.0 / 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_anchors_and_decode():
    base = base_anchors(4)
    # ratio 1.0 anchor is a 32×32 square at origin
    np.testing.assert_allclose(np.asarray(base[1]), [-16, -16, 16, 16])
    anchors = level_anchors(4, 2, 3)
    assert anchors.shape == (2 * 3 * 3, 4)
    # anchor at cell (1, 2) is shifted by (stride·2, stride·1)
    np.testing.assert_allclose(
        np.asarray(anchors[(1 * 3 + 2) * 3 + 1]),
        [8 - 16, 4 - 16, 8 + 16, 4 + 16])
    # zero deltas decode to the roi itself (clipped)
    rois = jnp.asarray([[10.0, 10.0, 50.0, 30.0]])
    out = delta_decode(rois, jnp.zeros((1, 4)), (1, 1, 1, 1), (64, 64))
    np.testing.assert_allclose(np.asarray(out[0]), [10, 10, 50, 30], atol=1e-5)
    # dx = +1 std=0.1 moves the 40-px-wide box right by 4 px
    out = delta_decode(rois, jnp.asarray([[1.0, 0, 0, 0]]),
                       (0.1, 0.1, 0.2, 0.2), (640, 640))
    np.testing.assert_allclose(np.asarray(out[0]),
                               [14, 10, 54, 30], atol=1e-4)


def test_grouped_dcn_matches_plain_grouped_conv():
    # zero offsets → deform conv == plain conv; groups=4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 8)), jnp.float32)  # cin/g=2
    off = jnp.zeros((1, 8, 8, 18))
    out = deform_conv2d(x, off, w, None, groups=4)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def small_htc():
    # tiny config: short backbone would change weights shape — keep the
    # real depth but a small image so CPU can run it
    model = HTC(num_proposals=64, rpn_pre_nms=64, max_dets=8)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), dummy)
    return model, vars_


def test_htc_smoke(small_htc):
    model, vars_ = small_htc
    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3)),
        jnp.float32)
    dets = jax.jit(lambda v, im: model.apply(v, im))(vars_, img)
    (d,) = dets
    assert d.boxes.shape == (8, 4)
    assert d.masks.shape == (8, 28, 28)
    b = np.asarray(d.boxes)
    assert np.all(b[:, 2] >= b[:, 0] - 1e-3) and np.all(b >= -1e-3)
    s = np.asarray(d.scores)[np.asarray(d.valid)]
    assert np.all((s >= 0) & (s <= 1))
    m = np.asarray(d.masks)
    assert np.all((m >= 0) & (m <= 1))


def test_htc_torch_map_roundtrip(small_htc):
    """Every flax leaf covered by the mmdet-HTC tensor map, bit-exact
    round-trip (VERDICT r1 #2 discipline applied to the 2D model)."""
    from fullysparsefusion_tpu.train.torch_map import (
        build_entries, convert_state_dict, synthesize_state_dict,
        _leaf_paths, _get,
    )
    _, vars_ = small_htc
    vars_np = jax.tree_util.tree_map(np.asarray, dict(vars_))
    entries = build_entries(vars_np["params"], "htc")
    covered = {(e.col, e.path) for e in entries}
    assert len(covered) == len(entries), "duplicate entries"
    for col in ("params", "batch_stats"):
        for path in _leaf_paths(vars_np[col]):
            assert (col, path) in covered, f"uncovered {col}/{'/'.join(path)}"
    sd = synthesize_state_dict(vars_np, "htc")
    # spot-check mmdet layouts
    assert sd["backbone.conv1.weight"].shape == (64, 3, 7, 7)
    assert sd["backbone.layer2.0.conv2.conv_offset.bias"].shape == (18,)
    assert sd["roi_head.bbox_head.0.shared_fcs.0.weight"].shape == (1024,
                                                                    12544)
    assert sd["roi_head.mask_head.1.upsample.weight"].shape == (256, 256, 2, 2)
    out, report = convert_state_dict(sd, vars_np, "htc")
    assert report["missing"] == [], report["missing"][:5]
    assert report["unmapped"] == [], report["unmapped"][:5]
    assert report["mismatch"] == [], report["mismatch"][:5]
    for col in ("params", "batch_stats"):
        for path in _leaf_paths(vars_np[col]):
            np.testing.assert_array_equal(
                _get(vars_np[col], path), _get(out[col], path),
                err_msg=f"{col}/{'/'.join(path)}")


def test_htc_param_count(small_htc):
    # ResNeXt-101-64x4d (81M) + FPN/RPN (4M) + 3×Shared2FC (42M) + masks/
    # semantic (11M) + DCN offset convs ≈ 143M — guards layer-shape slips
    _, vars_ = small_htc
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vars_["params"]))
    assert 135e6 < n < 150e6, n
