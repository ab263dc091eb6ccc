"""TTA through the inference CLI (MyMultiScaleFlipAug3D surface):
``tools/test.py --tta`` runs the flip grid and fuses with rotated NMS."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from test_cli_integration import _build_fake_dataset  # noqa: E402


def test_cli_tta_flip_grid(tmp_path):
    info_path, mask_dir = _build_fake_dataset(str(tmp_path), n_samples=1)
    out_path = str(tmp_path / "dets_tta.json")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "test.py"),
            "--tiny", "--cpu", "--model", "fsd",
            "--info-pkl", info_path, "--data-root", str(tmp_path),
            "--out", out_path, "--max-samples", "1",
            "--tta", "--tta-rotations", "0", "--tta-scales", "1.0",
        ],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TTA over 4 variants" in r.stdout, r.stdout[-500:]
    with open(out_path) as f:
        results = json.load(f)
    assert len(results) == 1
    assert isinstance(results[0]["boxes"], list)
