"""Training-step tests: loss decreases; sharded DP step runs on the 8-device
CPU mesh and stays consistent with single-device."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fullysparsefusion_tpu.config import tiny_fsd_config
from fullysparsefusion_tpu.models.fsd import SingleStageFSD
from fullysparsefusion_tpu.parallel import (
    TrainState, make_optimizer, make_train_step, make_sharded_train_step,
    cyclic_lr_schedule,
)
from fixtures import make_scene


def _init(cfg, pb, gt):
    model = SingleStageFSD(cfg=cfg)
    vars_ = model.init(
        jax.random.key(0), pb, 2, gt, False, method=lambda m, *a, **k: m(*a, **k)
    )
    return model, vars_


def test_cyclic_lr_shape():
    s = cyclic_lr_schedule(1e-4, 100)
    lrs = [float(s(i)) for i in [0, 20, 40, 70, 100]]
    assert abs(lrs[0] - 1e-4) < 1e-9
    assert abs(lrs[2] - 1e-3) < 1e-6   # peak at 40%
    assert lrs[4] < 2e-7               # floor ~1e-8
    assert lrs[1] > lrs[0] and lrs[3] < lrs[2]


def test_train_step_reduces_loss():
    cfg = tiny_fsd_config()
    pb, gt = make_scene(seed=0, n_cap=cfg.caps.points, max_gt=cfg.caps.max_gt)
    model, vars_ = _init(cfg, pb, gt)
    tx = make_optimizer(base_lr=3e-4, total_steps=100, lr_mult_rules={"segmentor": 0.2})
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=vars_["params"],
        batch_stats=vars_["batch_stats"], opt_state=tx.init(vars_["params"]),
    )
    step = make_train_step(model, tx, 2)
    losses = []
    for _ in range(5):
        state, loss, loss_dict = step(state, pb, gt)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def test_sharded_train_step_runs_on_mesh():
    devs = jax.devices()
    assert len(devs) == 8, "conftest must force 8 CPU devices"
    mesh = Mesh(np.array(devs), ("dp",))
    cfg = tiny_fsd_config()
    # one sample per device; global arrays = 8 × local
    pbs, gts = [], []
    for d in range(8):
        pb_d, gt_d = make_scene(
            seed=d, batch_size=1, bg_points=200,
            n_cap=cfg.caps.points // 4, max_gt=cfg.caps.max_gt,
        )
        pbs.append(pb_d)
        gts.append(gt_d)
    pb = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *pbs)
    gt = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *gts)

    model, vars_ = _init(cfg, pbs[0], gts[0])
    tx = make_optimizer(base_lr=1e-4, total_steps=10)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=vars_["params"],
        batch_stats=vars_["batch_stats"], opt_state=tx.init(vars_["params"]),
    )
    step = make_sharded_train_step(model, tx, mesh, per_device_batch=1)
    sharding = NamedSharding(mesh, P("dp"))
    pb = jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), pb)
    gt = jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), gt)
    state2, loss, loss_dict = step(state, pb, gt)
    assert np.isfinite(float(loss))
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), k
    # params actually moved
    d0 = jax.tree_util.tree_leaves(state.params)[0]
    d1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
