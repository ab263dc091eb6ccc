"""Runtime schedule wiring: threshold buffer + detection gating in the step."""
import numpy as np
import jax
import jax.numpy as jnp

from fullysparsefusion_tpu.config import tiny_fsd_config
from fullysparsefusion_tpu.models.fsd import SingleStageFSD
from fullysparsefusion_tpu.train.hooks import RuntimeSchedule
from fixtures import make_scene


def test_schedule_values():
    rs = RuntimeSchedule(
        enable_detection_step=100, threshold_buffer_start=0.4,
        threshold_buffer_end_step=200, disable_aug_step=500,
    )
    assert not rs.enable_detection(50) and rs.enable_detection(100)
    # buffer is active only once detection enables, full at the enable step,
    # decaying to 0 over [enable, end] (fsd_hooks.py:86-89)
    assert rs.threshold_buffer(0) == 0.0
    assert rs.threshold_buffer(99) == 0.0
    assert rs.threshold_buffer(100) == 0.4
    assert abs(rs.threshold_buffer(150) - 0.2) < 1e-9
    assert rs.threshold_buffer(200) == 0.0
    assert rs.augmentation_enabled(499) and not rs.augmentation_enabled(500)


def test_detection_gating_and_buffer_in_step():
    cfg = tiny_fsd_config()
    pb, gt = make_scene(seed=0, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
    model = SingleStageFSD(cfg=cfg)
    vars_ = model.init(
        jax.random.key(0), pb, 2, gt, False, method=lambda m, *a, **k: m(*a, **k)
    )

    # detection_weight 0 (pretrain phase) zeroes the detection losses only
    out0 = model.apply(vars_, pb, 2, gt, False, 0.0, 0.0)
    l0 = out0["losses"]
    assert float(l0["loss_cls"]) == 0.0 and float(l0["loss_center"]) == 0.0
    assert float(l0["loss_sem_seg"]) > 0.0

    # a huge threshold buffer kills the foreground entirely
    out_buf = model.apply(vars_, pb, 2, None, False, 10.0, 1.0)
    assert int(out_buf["num_fg_points"]) == 0

    # default args unchanged
    out1 = model.apply(vars_, pb, 2, gt, False)
    assert float(out1["losses"]["loss_cls"]) > 0.0
