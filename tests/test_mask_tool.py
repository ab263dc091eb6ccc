"""Mask pre-inference tool: painting semantics + loader roundtrip."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from generate_masks import paint_sample, save_sample, backend_random
from fullysparsefusion_tpu.data.masks import load_sample_masks


def test_score_layering():
    """Higher-score instances must overwrite overlapping lower-score ones."""
    h, w = 32, 48
    lo = dict(cam_id=0, category=2, score=0.3, bbox=[0, 0, 20, 20],
              mask=np.zeros((h, w), bool))
    hi = dict(cam_id=0, category=2, score=0.9, bbox=[5, 5, 25, 25],
              mask=np.zeros((h, w), bool))
    lo["mask"][0:20, 0:20] = True
    hi["mask"][5:25, 5:25] = True
    masks, annos = paint_sample([lo, hi], 1, 3, (h, w))
    m = masks[(0, 2)]
    # anno row 0 = highest score (hi); overlap pixels belong to hi
    assert annos[0]["score"] == 0.9
    assert m[10, 10] == 1          # hi's row+1
    assert m[2, 2] == 2            # lo-only region keeps lo's id
    assert m[24, 24] == 1


def test_tool_loader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    dets = backend_random(rng, 4, 6, (64, 96), n=12)
    masks, annos = paint_sample(dets, 4, 6, (64, 96))
    save_sample(str(tmp_path), "tok", masks, annos)
    m, a = load_sample_masks(str(tmp_path), "tok", 4, 6, (64, 96), max_anno=32)
    assert m.shape == (4, 64, 96, 6) and m.dtype == np.uint8  # channel-last
    assert int(a[:, 8].sum()) == len(annos)
    # every painted plane survives the roundtrip
    for (cam, cls), plane in masks.items():
        np.testing.assert_array_equal(m[cam, :, :, cls], plane)


def test_virtual_points_loader(tmp_path):
    from fullysparsefusion_tpu.data.nuscenes import load_virtual_points

    vp = np.random.default_rng(1).normal(size=(40, 5)).astype(np.float32)
    p = tmp_path / "x.vp.npy"
    np.save(p, vp)
    got = load_virtual_points(str(p), 5)
    np.testing.assert_array_equal(got, vp)


def test_jax_htc_backend_cli(tmp_path):
    """End-to-end: tiny camera PNGs + info pkl → jax-htc backend → painted
    per-(cam, class) PNGs + anno.json (reference save_mask_nusc.py surface,
    phase-2 native model)."""
    import pickle
    import subprocess

    from PIL import Image

    rng = np.random.default_rng(0)
    cam_dir = tmp_path / "cams"
    cam_dir.mkdir()
    cams = {}
    for c in ("CAM_FRONT", "CAM_BACK"):
        p = cam_dir / f"{c}.png"
        Image.fromarray(
            rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(p)
        cams[c] = dict(data_path=str(p))
    info = dict(token="tok0", cams=cams)
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(dict(infos=[info]), f)
    out_dir = tmp_path / "masks"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "generate_masks.py"),
         "--backend", "jax-htc", "--weights", "none", "--score-thr", "0.0",
         "--info-pkl", str(pkl), "--out-dir", str(out_dir)],
        # the tiny-HTC CPU compile alone takes ~11 min on a 1-core box —
        # budget for contention (generate_masks now pins JAX_PLATFORMS=cpu
        # via jax.config, so the axon sitecustomize cannot re-route this to
        # the TPU tunnel)
        capture_output=True, text=True, timeout=2400,
        env=dict(os.environ, JAX_PLATFORMS="cpu", FSF_HTC_TINY="1"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    anno = json.load(open(out_dir / "tok0" / "anno.json"))
    assert isinstance(anno, list)
    # random-init net: detections may or may not clear NMS, but the sample
    # directory and anno table must exist and any PNG must load
    pngs = list((out_dir / "tok0").glob("*.png"))
    for p in pngs:
        arr = np.asarray(Image.open(p))
        assert arr.shape == (64, 96)
