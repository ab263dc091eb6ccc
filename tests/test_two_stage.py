"""Two-stage FSD (RPN + GroupCorrectionHead): forward, loss, grads, decode."""
import numpy as np
import jax
import jax.numpy as jnp

from fullysparsefusion_tpu.config import tiny_fsd_config
from fullysparsefusion_tpu.models.two_stage import TwoStageFSD
from fixtures import make_scene


def test_two_stage_train_and_decode():
    cfg = tiny_fsd_config()
    pb, gt = make_scene(seed=0, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
    model = TwoStageFSD(cfg=cfg)
    vars_ = model.init(
        jax.random.key(0), pb, 2, gt, False, method=lambda m, *a, **k: m(*a, **k)
    )
    out = model.apply(vars_, pb, 2, gt, False)
    losses = out["losses"]
    assert "rcnn_loss_cls" in losses and "rcnn_loss_reg" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    # second stage receives gradient
    def loss_fn(p):
        o = model.apply({"params": p, "batch_stats": vars_["batch_stats"]},
                        pb, 2, gt, False)
        return sum(v for k, v in o["losses"].items() if "loss" in k)

    g = jax.grad(loss_fn)(vars_["params"])
    rc = g["roi_head"]
    norm = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(rc))))
    assert norm > 0

    res = model.apply(vars_, out, 2, method=TwoStageFSD.get_bboxes)
    assert res.boxes.shape[0] == 2
    assert np.isfinite(np.asarray(res.boxes)).all()
