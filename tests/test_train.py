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


def test_fused_clip_adamw_matches_optax():
    """The packed fused optimizer (flatten=True default) must match the
    per-leaf optax chain it replaces (clip 35 + AdamW + cyclic LR) to
    float32 roundoff over several steps."""
    from fullysparsefusion_tpu.parallel.train import make_optimizer

    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    params = {
        "a": jax.random.normal(ks[0], (7, 5)),
        "b": {"w": jax.random.normal(ks[1], (3, 11)),
              "bias": jax.random.normal(ks[2], (11,))},
    }
    tx_f = make_optimizer(base_lr=1e-3, total_steps=20, flatten=True)
    tx_r = make_optimizer(base_lr=1e-3, total_steps=20, flatten=False)
    sf, sr = tx_f.init(params), tx_r.init(params)
    pf = pr = params
    for i in range(4):
        g = jax.tree_util.tree_map(
            lambda x, k=ks[3 + i % 3]: jax.random.normal(
                jax.random.fold_in(k, i), x.shape) * (10.0 if i == 1 else 0.1),
            params)  # i==1 exercises the clip branch (norm > 35)
        uf, sf = tx_f.update(g, sf, pf)
        ur, sr = tx_r.update(g, sr, pr)
        import optax
        pf = optax.apply_updates(pf, uf)
        pr = optax.apply_updates(pr, ur)
    for lf, lr_ in zip(jax.tree_util.tree_leaves(pf),
                       jax.tree_util.tree_leaves(pr)):
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr_), rtol=2e-5, atol=2e-7)


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


def test_sharded_losses_match_single_device():
    """DDP-equivalence (VERDICT r1 #5): the shard_map DP step with pmean'd
    avg factors (layers.mesh_mean) must reproduce a single-device run on the
    concatenated global batch — loss and gradients, not just finiteness.
    Reference semantics: sparse_cluster_head.py:140-161 reduce_mean +
    DDP gradient averaging.

    Tolerances: segment sums run in a different order in the two layouts
    (scenes interleaved vs contiguous), so cluster centers differ at fp
    epsilon and a handful of borderline center-in-box assignments flip
    (~2% of positives on this data). Losses therefore match to ~1%, not
    bit-exactly; the BN-stat sync is checked tightly through loss_sem_seg
    (point-pathway losses have no discrete assignment and agree to 1e-4)."""
    from jax import shard_map
    from fullysparsefusion_tpu.parallel.train import total_loss, fsd_forward_fn
    from fullysparsefusion_tpu.models import layers as L

    import dataclasses

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("dp",))
    # capacities are PER GLOBAL BATCH and equality only holds when NEITHER
    # run truncates: give the per-shard model ample per-scene caps (an
    # untrained segmentor can dump every fg point into one class group) and
    # the single-device model ×8 of that, so both see identical cluster
    # sets (params are caps-independent).
    cfg = tiny_fsd_config()
    caps1 = dataclasses.replace(
        cfg.caps, fg_per_group=512, cluster_voxels_per_group=384, clusters=256,
    )
    cfg = dataclasses.replace(cfg, caps=caps1)
    caps8 = dataclasses.replace(
        caps1,
        points=caps1.points * 8, voxels=caps1.voxels * 8,
        prevox=caps1.prevox * 8, fg_per_group=caps1.fg_per_group * 8,
        cluster_voxels_per_group=caps1.cluster_voxels_per_group * 8,
        clusters=caps1.clusters * 8,
        frustum_points=caps1.frustum_points * 8,
        frustum_objects=caps1.frustum_objects * 8,
        roi_points=caps1.roi_points * 8,
    )
    cfg8 = dataclasses.replace(cfg, caps=caps8)
    pbs, gts = [], []
    for d in range(8):
        pb_d, gt_d = make_scene(
            seed=100 + d, batch_size=1, boxes_per_sample=2, bg_points=120,
            n_cap=cfg.caps.points // 4, max_gt=cfg.caps.max_gt,
        )
        pbs.append(pb_d)
        gts.append(gt_d)
    # sharded layout: batch_idx 0 within every shard
    pb_sh = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *pbs)
    gt_sh = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *gts)
    # single-device layout: one global batch with batch_idx 0..7
    from fullysparsefusion_tpu.utils.containers import PointBatch
    pb_1 = PointBatch(
        points=pb_sh.points,
        batch_idx=jnp.concatenate(
            [p.batch_idx + d for d, p in enumerate(pbs)]
        ),
        valid=pb_sh.valid,
    )

    model, vars_ = _init(cfg, pbs[0], gts[0])
    model8 = SingleStageFSD(cfg=cfg8)  # same params, scaled data-path caps
    params, stats = vars_["params"], vars_["batch_stats"]
    fwd_local = fsd_forward_fn(model, 1)
    fwd_global = fsd_forward_fn(model8, 8)

    def single_loss(p):
        losses, _ = fwd_global(p, stats, pb_1, gt_sh)
        return total_loss(losses), losses

    (loss_1, losses_1), grads_1 = jax.value_and_grad(single_loss, has_aux=True)(params)

    def local_loss_grad(p, pb, gt):
        # mirror the production step: grad of the pmean'd GLOBAL loss (the
        # per-shard-grad + pmean pattern is wrong under syncBN coupling)
        def lf(p):
            with L.bn_axis("dp"):
                losses, _ = fwd_local(p, stats, pb, gt)
            return jax.lax.pmean(total_loss(losses), "dp"), losses

        (loss, losses), grads = jax.value_and_grad(lf, has_aux=True)(p)
        return loss, jax.lax.pmean(losses, "dp"), grads

    smapped = jax.jit(shard_map(
        local_loss_grad, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")), out_specs=(P(), P(), P()),
    ))
    sharding = NamedSharding(mesh, P("dp"))
    pb_put = jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), pb_sh)
    gt_put = jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), gt_sh)
    loss_8, losses_8, grads_8 = smapped(params, pb_put, gt_put)

    np.testing.assert_allclose(float(loss_8), float(loss_1), rtol=5e-3)
    for k in losses_1:
        # diagnostics like num_pos are per-shard means under DP (the
        # reference's reduce_mean avg factor), i.e. global/8; assign_recall
        # is a globally-synced RATIO (mesh_mean numerator AND denominator,
        # heads.py:225-234) so it matches single-device directly
        mult = 1.0 if ("loss" in k or "recall" in k) else 8.0
        tight = k in ("loss_sem_seg", "loss_vote")  # no discrete assignment
        np.testing.assert_allclose(
            float(losses_8[k]) * mult, float(losses_1[k]),
            rtol=1e-3 if tight else (5e-2 if mult > 1 else 1e-2), atol=1e-5,
            err_msg=k,
        )
    flat_1 = jax.tree_util.tree_leaves_with_path(grads_1)
    flat_8 = dict(jax.tree_util.tree_leaves_with_path(grads_8))
    checked = 0
    for path, g1 in flat_1:
        g8 = flat_8[path]
        n1 = float(jnp.linalg.norm(g1))
        n8 = float(jnp.linalg.norm(g8))
        # per-leaf: borderline assignment flips + fp summation order through
        # deep BN chains give a few-% scatter (seg-only losses measure 3.7%
        # worst-leaf / 0.2% total); the systematic error this guards against
        # — per-shard grads + pmean under syncBN coupling — was 800%
        np.testing.assert_allclose(n8, n1, rtol=1.5e-1, atol=1e-6, err_msg=str(path))
        checked += 1
    assert checked > 20
    # aggregate: total gradient norm matches tightly
    tot1 = float(jnp.sqrt(sum(jnp.sum(g**2) for _, g in flat_1)))
    tot8 = float(jnp.sqrt(sum(jnp.sum(g**2) for g in flat_8.values())))
    np.testing.assert_allclose(tot8, tot1, rtol=2e-2)


def test_fsf_all_branches_receive_gradient():
    """ADVICE r1 (high): total_loss must include the prefixed FSF keys
    (frustum_loss_*, fsd_loss_*, stage{i}_loss_*) — otherwise only the
    segmentor trains. Assert nonzero grads on every major FSF submodule."""
    from fullysparsefusion_tpu.config import tiny_fsf_config
    from fullysparsefusion_tpu.models.fsf import FSF
    from fullysparsefusion_tpu.parallel.train import total_loss, fsf_forward_fn
    from fixtures import make_camera_data, with_noaug_channels

    cfg = tiny_fsf_config()
    pb, gt = make_scene(seed=3, n_cap=cfg.fsd.caps.points, max_gt=cfg.fsd.caps.max_gt)
    cam = make_camera_data(pb, gt, num_cams=cfg.num_cams, num_classes=cfg.num_classes)
    pb = with_noaug_channels(pb)
    model = FSF(cfg=cfg)
    vars_ = model.init(
        jax.random.key(0), pb, cam, 2, gt, gt, False,
        method=lambda m, *a, **k: m(*a, **k),
    )
    fwd = fsf_forward_fn(model, 2)

    def loss_fn(p):
        losses, _ = fwd(p, vars_["batch_stats"], pb, cam, gt, gt)
        return total_loss(losses)

    grads = jax.grad(loss_fn)(vars_["params"])
    must_train = [
        "frustum_head", "fsd_branch", "combine_frustum_mlp", "combine_fsd_mlp",
        "refine_sir_0", "refined_head_0", "out_proj_0", "position_encoder_0",
        "lidar_img_mlp_0", "refine_img_mlp_0", "frustum", "seg_enhance_mlp",
    ]
    for name in must_train:
        sub = grads.get(name)
        assert sub is not None, f"missing param group {name}: {list(grads)}"
        norm = float(
            jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(sub)))
        )
        assert norm > 0.0, f"zero gradient reaching {name}"


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
