"""Real-data-shaped integration (VERDICT r4 #8): the byte-faithful mini
nuScenes tree from tools/make_fake_nuscenes.py through the ACTUAL reader
machinery the real dataset would hit — cams-dict-derived lidar2img (real
pickles store no lidar2img), multi-sweep ego-motion aggregation with
remove_close, raw-category-name mapping, NaN velocities — and then the full
CLI eval path in a subprocess.

The pre-existing fixture dataset (tests/test_cli_integration.py) bypasses
exactly those branches (direct lidar2img, sweeps=[], mapped names); this is
the missing field-name/layout drift coverage ROADMAP admits to.
"""
import json
import os
import pickle
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _write(tmp_path, **kw):
    from make_fake_nuscenes import write_dataset

    return write_dataset(str(tmp_path), **kw)


def test_reader_consumes_mmdet3d_schema(tmp_path):
    from fullysparsefusion_tpu.data.nuscenes import (
        NuScenesReader, load_points_bin)

    info_path, mask_dir = _write(
        tmp_path, n_samples=2, n_sweeps=2, num_cams=6, n_boxes=5)
    with open(info_path, "rb") as f:
        d = pickle.load(f)
    assert set(d) == {"infos", "metadata"}
    info = d["infos"][0]
    # the real-schema fields are present and lidar2img is ABSENT
    for k in ("lidar_path", "sweeps", "cams", "timestamp", "gt_boxes",
              "gt_names", "gt_velocity", "num_lidar_pts", "valid_flag"):
        assert k in info, k
    assert "lidar2img" not in info
    assert str(info["gt_names"][0]).startswith(("vehicle.", "human.",
                                                "movable_object."))

    rd = NuScenesReader(
        info_path=info_path, data_root=str(tmp_path),
        class_names=("car", "truck", "construction_vehicle", "bus",
                     "trailer", "barrier", "motorcycle", "bicycle",
                     "pedestrian", "traffic_cone"),
        num_sweeps=2, training=False, with_cbgs=False)
    s = rd.sample(0, augment=False)
    # lidar2img derived from the cams dict
    assert s["lidar2img"] is not None and s["lidar2img"].shape == (6, 4, 4)
    # sweeps aggregated: more points than the key frame, nonzero Δt channel
    key = load_points_bin(
        os.path.join(str(tmp_path), info["lidar_path"]))
    assert len(s["points"]) > len(key)
    dt = s["points"][:, 5]
    assert (dt > 0).any() and (dt == 0).any()
    # remove_close dropped the near-ego sweep returns: they were injected
    # at sensor-frame |x|,|y| < 0.9, z ∈ [-1.5, 0] and would land around the
    # sweep-0 ego offset (-0.5, 0.05) above the ground plane if kept. Only
    # ground points (z ≈ -1.9) legitimately live there.
    sw = s["points"][dt > 0]
    near = (np.hypot(sw[:, 0] + 0.5, sw[:, 1] - 0.05) < 0.5) \
        & (sw[:, 2] > -1.6)
    assert not near.any()
    # raw names mapped to class ids, NaN velocity sanitized
    assert (s["gt_labels"] >= 0).all()
    assert np.isfinite(s["gt_boxes"]).all()
    # velocity channels appended → 9-dim boxes
    assert s["gt_boxes"].shape[1] == 9

    # projection consistency: at least one GT center lands inside a camera
    pts4 = np.concatenate(
        [s["gt_boxes"][:, :3], np.ones((len(s["gt_boxes"]), 1))], 1)
    proj = np.einsum("nd,ckd->cnk", pts4, s["lidar2img"].astype(np.float64))
    depth = proj[..., 2]
    uv = proj[..., :2] / np.maximum(depth[..., None], 1e-3)
    inside = (depth > 0) & (uv[..., 0] >= 0) & (uv[..., 0] < 224) \
        & (uv[..., 1] >= 0) & (uv[..., 1] < 128)
    assert inside.any()


def test_cli_eval_on_fake_nuscenes_tree(tmp_path):
    """info-pkl → reader (sweeps + cams) → FSF → eval/format end-to-end."""
    info_path, mask_dir = _write(
        tmp_path, n_samples=2, n_sweeps=1, num_cams=2, n_boxes=4,
        img_h=64, img_w=96, fx=40.0, extent=12.0)
    out_path = str(tmp_path / "dets.json")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "test.py"),
        "--tiny", "--cpu", "--model", "fsf",
        "--info-pkl", info_path, "--data-root", str(tmp_path),
        "--mask-dir", mask_dir, "--img-h", "64", "--img-w", "96",
        "--mask-downsample", "1",
        "--out", out_path, "--eval", "--max-samples", "2",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out_path) as f:
        results = json.load(f)
    assert len(results) == 2
    assert results[0]["token"] == "faketok000"
    assert '"mAP"' in r.stdout, r.stdout[-500:]
