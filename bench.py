"""Benchmark: frames/sec/chip for flagship FSF inference at nuScenes scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no speed numbers (SURVEY.md §6); BASELINE.json's
target is ≥2× an A100's frames/sec on FSF nuScenes inference. We use 10 fps
as the working A100 estimate for `vs_baseline` (FSF runs its two-branch
fusion + cascade refinement at ~100 ms/frame-class latencies on A100-class
GPUs) until a measured baseline lands.

Scene: synthetic nuScenes-scale input — 131k points (10-sweep scale after
range filter) generated with the surface-like scan model (fixtures
``make_lidar_scene``: ground rings + facades + object shells, re-scanned per
sweep) whose per-stage voxel occupancies match real frames (~50k stage-0,
~37k/20k/7k/2k deeper — ROADMAP profile ~60k/15-25k); 6 cameras with
450×800 instance masks (2× downsampled from 900×1600), batch 1, full-size
UNet/SIR/head channels. UNet stage capacities are sized to those measured
occupancies +~10% headroom instead of the generic halving schedule.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

A100_FPS_ESTIMATE = 10.0


def _wait_for_backend(max_wait_s: float = 2400.0, probe_timeout_s: float = 300.0):
    """Block until the JAX backend answers (the axon TPU tunnel drops for
    minutes-to-hours at a time; observed 2 h+ outages).

    A failed/hung PJRT init poisons the process, so probe `jax.devices()`
    in SUBPROCESSES until one succeeds, then initialize here. Returns
    silently for healthy backends (CPU runs answer on the first probe).
    """
    import subprocess
    import time as _t

    deadline = _t.time() + max_wait_s
    attempt = fast_failures = 0
    while True:
        attempt += 1
        t0 = _t.time()
        err = ""
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=probe_timeout_s, capture_output=True, text=True,
            )
            if r.returncode == 0:
                return
            err = (r.stderr or "").strip().splitlines()[-3:]
            # an immediate nonzero exit is a broken env, not an outage —
            # don't burn 40 min retrying it
            fast_failures = fast_failures + 1 if _t.time() - t0 < 10 else 0
        except subprocess.TimeoutExpired:
            err = ["probe timed out (tunnel dialing)"]
            fast_failures = 0
        if _t.time() > deadline or fast_failures >= 3:
            # proceed anyway: let the real init produce the loud error
            print(f"# backend probe gave up after {attempt} attempts: "
                  + " | ".join(err), file=sys.stderr)
            return
        print(f"# backend unavailable (attempt {attempt}): "
              + " | ".join(err), file=sys.stderr)
        _t.sleep(30)


def _enable_compile_cache():
    from fullysparsefusion_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def _cached_init(init_fn, key, *args):
    """Run a flax ``init`` with an on-disk value cache.

    Key = sha1 of the param pytree's (path, shape, dtype) signature from
    ``jax.eval_shape`` PLUS the PRNG key material and a cache-version salt
    (ADVICE r4: shape-only keys silently returned stale params after a seed
    or initializer change) — any config change that alters the parameter
    tree misses; A/B knobs that only change dispatch (window spec, occupancy
    thresholds) hit. Values are exact: init is deterministic given the key.
    Writes are atomic (temp file + ``os.replace``) and loads fall back to
    recomputation on any corruption (a killed bench mid-``savez`` must not
    poison every later run).
    """
    import hashlib

    import jax

    shapes = jax.eval_shape(init_fn, key, *args)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    key_mat = np.asarray(jax.random.key_data(key)).tolist()
    sig = hashlib.sha1(
        ("params-cache-v2"
         + repr(key_mat)
         + repr(treedef)
         + repr([(l.shape, str(l.dtype)) for l in leaves])).encode()
    ).hexdigest()
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    path = os.path.join(cache_dir, f"params-{sig}.npz")
    if not os.path.exists(path):
        # one-time migration: pre-v2 files were keyed by shape signature
        # alone; they were all produced with jax.random.key(0) (the only key
        # bench ever used), so for that key the cached values are identical
        legacy_sig = hashlib.sha1(
            (repr(treedef)
             + repr([(l.shape, str(l.dtype)) for l in leaves])).encode()
        ).hexdigest()
        legacy = os.path.join(cache_dir, f"params-{legacy_sig}.npz")
        if key_mat == np.asarray(
                jax.random.key_data(jax.random.key(0))).tolist() \
                and os.path.exists(legacy):
            try:
                os.replace(legacy, path)
            except OSError:
                pass
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                vals = [z[f"a{i}"] for i in range(len(leaves))]
            return jax.tree_util.tree_unflatten(
                treedef,
                [jax.numpy.asarray(v, dtype=l.dtype)
                 for v, l in zip(vals, leaves)],
            )
        except Exception as e:  # noqa: BLE001 — fall through to re-init
            print(f"# param cache load failed ({e}); re-initializing",
                  file=sys.stderr)
    vars_ = jax.jit(init_fn)(key, *args)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        flat = jax.tree_util.tree_leaves(vars_)
        # must end in .npz or np.savez appends the suffix itself
        tmp = path + f".tmp{os.getpid()}.npz"
        np.savez(tmp, **{f"a{i}": np.asarray(v) for i, v in enumerate(flat)})
        os.replace(tmp, path)
    except Exception as e:  # noqa: BLE001 — cache write is best-effort
        print(f"# param cache write failed: {e}", file=sys.stderr)
    return vars_


def build_bench_model():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    from fullysparsefusion_tpu.config import (
        FSDConfig, FSFConfig, Capacities, VoteSegmentorConfig,
    )
    from fullysparsefusion_tpu.models.fsf import FSF

    batch = int(os.environ.get("FSF_BENCH_BATCH", 1))
    vox = int(os.environ.get("FSF_BENCH_VOXELS", 57344)) * batch
    caps = Capacities(
        points=131072 * batch, voxels=vox, prevox=65536 * batch,
        fg_per_group=4096 * batch, cluster_voxels_per_group=1024 * batch,
        clusters=1024 * batch,
        max_gt=128, frustum_points=16384 * batch,
        frustum_objects=256 * batch,
        roi_points=32768 * batch, max_roi_points=512,
    )
    # per-stage active-set capacities from measured scan occupancy (+10%)
    # window-gather conv spec: env seeds the CONFIG here (bench-only knob —
    # the model itself reads config, VERDICT r3 weakness 6); default ON at
    # W=192 with the per-stage table cache: 119.2 vs 130.3 ms/frame
    # (docs/performance.md round-4 A/B follow-up)
    win_w = int(os.environ.get("FSF_WINDOW_CONV", "192") or 0)
    win_resid = int(os.environ.get("FSF_WINDOW_RESID", "64"))
    # 4th spec element: window dispatch in conv BACKWARDS (1=on) — A/B knob
    win_bwd = int(os.environ.get("FSF_WINDOW_BWD", "1") or 0)
    if os.environ.get("FSF_DENSE_UNIQUE", "0") not in ("", "0"):
        # A/B toggle: re-enable the sort-free dense unique (default off —
        # measured 9.5 ms/frame loss, docs/performance.md round-4 A/B)
        from fullysparsefusion_tpu.ops import sparse_conv as _sc

        _sc.DENSE_UNIQUE_MAX_CELLS = 160 * 1024 * 1024
    seg = VoteSegmentorConfig(
        unet_stage_capacities=tuple(
            c * batch for c in (57344, 40960, 24576, 8192, 2560)),
        unet_dense_min_occupancy=float(
            os.environ.get("FSF_BENCH_DENSE_OCC", 0.15)),
        unet_window_conv=(win_w, 256, win_resid, win_bwd),
        # window dispatch under train: default OFF (train A/B —
        # 257.4 ms/step gather vs 320.7/331.8 with the window path)
        unet_window_conv_train=(
            os.environ.get("FSF_WINDOW_TRAIN", "0") not in ("", "0")),
    )
    cfg = FSFConfig(fsd=FSDConfig(caps=caps, segmentor=seg))

    from fixtures import make_lidar_scene, make_camera_data, with_noaug_channels
    from fullysparsefusion_tpu.utils.containers import PointBatch

    per = 131072
    pbs, gts = [], []
    for b in range(batch):
        pb_b, gt_b = make_lidar_scene(
            seed=b, n_cap=per, max_gt=caps.max_gt, n_boxes=32, extent=48.0,
        )
        pbs.append(pb_b)
        gts.append(gt_b)
    pb = PointBatch(
        points=jnp.concatenate([p.points for p in pbs]),
        batch_idx=jnp.concatenate(
            [p.batch_idx + b for b, p in enumerate(pbs)]),
        valid=jnp.concatenate([p.valid for p in pbs]),
    )
    gt = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs), *gts)
    cam = make_camera_data(
        pb, gt, batch_size=batch, num_cams=cfg.num_cams,
        num_classes=cfg.num_classes, img_h=450, img_w=800, max_anno=250,
        fx=400.0,
    )
    pb = with_noaug_channels(pb)
    model = FSF(cfg=cfg)
    # Init on the host CPU (eager init over the axon tunnel is one RPC per
    # op — minutes), then transfer the pytree to the TPU once.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pb_cpu = jax.device_put(pb, cpu)
        cam_cpu = jax.device_put(cam, cpu)

        def init_fn(k, p, c):
            return FSF(cfg=cfg).init(
                k, p, c, batch, None, None, False,
                method=lambda m, *a, **k_: m(*a, **k_),
            )

        # The init jit traces the FULL forward; XLA-compiling it on this
        # 1-core host costs ~25 min, and the persistent XLA cache does not
        # transfer across hosts (AOT feature mismatch). Params are
        # deterministic (seed 0), so cache the VALUES on disk keyed by the
        # param-tree shape signature (eval_shape — seconds, no compile).
        vars_ = _cached_init(init_fn, jax.random.key(0), pb_cpu, cam_cpu)
    dev = jax.devices()[0]
    vars_ = jax.device_put(vars_, dev)
    pb = jax.device_put(pb, dev)
    cam = jax.device_put(cam, dev)
    return cfg, model, vars_, pb, cam


def measure_train_step(cfg, model, vars_, pb, cam):
    """One full-fusion training step at bench scale (opt-in:
    FSF_BENCH_TRAIN=1) — returns ms/step or None on OOM."""
    import jax
    import jax.numpy as jnp

    from fixtures import make_scene
    from fullysparsefusion_tpu.parallel import (
        TrainState, make_optimizer, make_generic_train_step, fsf_forward_fn,
    )
    from fullysparsefusion_tpu.utils.containers import GroundTruth

    batch = int(os.environ.get("FSF_BENCH_BATCH", 1))
    _, gt = make_scene(
        seed=1, batch_size=batch, boxes_per_sample=32, pts_per_box=10,
        bg_points=100, n_cap=1024, max_gt=cfg.fsd.caps.max_gt, extent=45.0,
    )
    gt = jax.device_put(gt, jax.devices()[0])
    tx = make_optimizer(base_lr=1e-4, total_steps=100)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        opt_state = tx.init(jax.device_put(vars_["params"], cpu))
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=vars_["params"], batch_stats=vars_["batch_stats"],
        opt_state=jax.device_put(opt_state, jax.devices()[0]),
    )
    step = make_generic_train_step(fsf_forward_fn(model, batch), tx)
    try:
        t0 = time.time()
        state, loss, _ = step(state, pb, cam, gt, gt)
        np.asarray(loss)
        compile_s = time.time() - t0
        # the SECOND call through the axon tunnel carries a one-time ~2 min
        # buffer-layout/dispatch cost (measured: 119.6 s then 0.38 s steady
        # state) — sync two warmup steps before timing
        state, loss, _ = step(state, pb, cam, gt, gt)
        np.asarray(loss)
        n = 5
        t0 = time.time()
        for _ in range(n):
            state, loss, _ = step(state, pb, cam, gt, gt)
        np.asarray(loss)
        return (time.time() - t0) / n * 1000, compile_s
    except Exception as e:  # noqa: BLE001 — OOM reporting
        print(f"# train-step bench failed: {type(e).__name__}", file=sys.stderr)
        return None, None


def main():
    _wait_for_backend()
    import jax

    cfg, model, vars_, pb, cam = build_bench_model()

    batch = int(os.environ.get("FSF_BENCH_BATCH", 1))

    @jax.jit
    def fwd(vars_, pb, cam):
        # params as arguments — closed-over pytrees become HLO constants and
        # blow past the remote-compile request size limit
        out = model.apply(vars_, pb, cam, batch, None, None, False)
        fin = out["final"]
        return fin["cls_logits"], fin["reg_preds"], fin["centers"], fin["q_valid"]

    t0 = time.time()
    r = fwd(vars_, pb, cam)
    np.asarray(r[0][:1])  # hard sync through the tunnel
    compile_s = time.time() - t0

    n_iter = 20
    t0 = time.time()
    for _ in range(n_iter):
        out = fwd(vars_, pb, cam)
    np.asarray(out[0][:1])
    dt = (time.time() - t0) / n_iter
    fps = batch / dt  # frames (samples) per second per chip

    extra = {}
    # train-step timing is on by default (FSF_BENCH_TRAIN=0 to skip): the
    # number is stable (0.38 s/step steady state) and failures are caught
    # and reported without affecting the primary inference metric
    if os.environ.get("FSF_BENCH_TRAIN", "1") not in ("", "0"):
        train_ms, train_compile = measure_train_step(cfg, model, vars_, pb, cam)
        if train_ms is not None:
            extra["train_ms_per_step"] = round(train_ms, 1)
            extra["train_compile_s"] = round(train_compile, 1)

    print(
        json.dumps(
            {
                "metric": "frames/sec/chip FSF nuScenes val inference (full fusion, synthetic scene+masks)",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / A100_FPS_ESTIMATE, 3),
                "detail": {
                    "ms_per_frame": round(dt * 1000, 1),
                    "compile_s": round(compile_s, 1),
                    # vs_baseline divisor is an ESTIMATE (no A100 here to
                    # measure): self-describe it so the number is auditable
                    "a100_fps_estimate": A100_FPS_ESTIMATE,
                    "scene": "synthetic-occupancy-matched",
                    "device": str(jax.devices()[0]),
                    "points_capacity": 131072 * batch,
                    "batch": batch,
                    "queries": int(cfg.caps.frustum_objects + cfg.caps.clusters),
                    **extra,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
