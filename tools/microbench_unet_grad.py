"""Grad-of-UNet microbench: where does the window forward lose under AD?

Times value_and_grad of (SparseUNet.apply → masked sum) at bench scale for
three dispatch configs in one process:

  off       gather conv everywhere (train default)
  window    window fwd + exact-fallback cond, gather bwd (spec (192,256,64,0))
  nocond    window fwd without the cond (FSF_WINDOW_NOCOND=1), gather bwd

The full-train A/B (tools/profile_train.py, 2026-08-20) measured grad
232.4 / 290.1 / 258.4 ms for these configs — the cond alone costs ~32 ms
under grad and another ~+26 net remains attached to the window forward.
This isolates the UNet so the residual suspects (pallas operand
materialization, residual-repair scatter, WindowTables residuals) can be
probed without 250 s train compiles.

    python tools/microbench_unet_grad.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_bench_model
    from fullysparsefusion_tpu.ops.voxelize import voxelize_points, grid_dims
    from fullysparsefusion_tpu.ops.sparse_conv import SparseTensor
    from fullysparsefusion_tpu.models.sparse_unet import SparseUNet
    from fullysparsefusion_tpu.utils.containers import PointBatch

    cfg, model, vars_, pb, cam = build_bench_model()
    sc = cfg.fsd.segmentor
    caps = cfg.fsd.caps
    pb_in = PointBatch(
        points=pb.points[:, :-3], batch_idx=pb.batch_idx, valid=pb.valid)
    seg, _, vb, vc = jax.jit(lambda p: voxelize_points(
        p.xyz, p.batch_idx, p.valid, sc.voxel_size, sc.point_cloud_range,
        caps.voxels))(pb_in)
    dims = grid_dims(sc.voxel_size, sc.point_cloud_range)
    feats = jax.random.normal(
        jax.random.key(0), (caps.voxels, sc.vfe_channels[-1]), jnp.float32)
    st0 = SparseTensor(
        feats=feats, coords=vc, batch=vb, valid=seg.seg_valid,
        dims=dims, batch_size=1)
    st0 = jax.device_put(st0, jax.devices()[0])

    def run_config(name, window, nocond):
        os.environ["FSF_WINDOW_NOCOND"] = "1" if nocond else "0"
        unet = SparseUNet(
            base_channels=sc.unet_base_channels,
            output_channels=sc.unet_output_channels,
            encoder_channels=sc.unet_encoder_channels,
            encoder_strided_paddings=sc.unet_strided_paddings,
            decoder_channels=sc.unet_decoder_channels,
            stage_capacity_divisors=sc.unet_capacity_divisors,
            stage_capacities=sc.unet_stage_capacities,
            window_conv=window,
            window_conv_train=window is not None,
        )
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            up = jax.jit(lambda st: unet.init(
                jax.random.key(0), st, True))(jax.device_put(st0, cpu))
        up = jax.device_put(up, jax.devices()[0])

        def loss(params, st):
            out, _ = unet.apply(
                params, st, True, mutable=["batch_stats"])
            return jnp.sum(out * st.valid[:, None])

        jfn = jax.jit(jax.value_and_grad(loss))
        t0 = time.time()
        l, g = jfn(up, st0)
        np.asarray(l.reshape(-1)[:1])
        print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
        l, g = jfn(up, st0)
        np.asarray(l.reshape(-1)[:1])
        t0 = time.time()
        for _ in range(10):
            l, g = jfn(up, st0)
        np.asarray(l.reshape(-1)[:1])
        print(f"{name}: {(time.time()-t0)/10*1000:.2f} ms", flush=True)

    run_config("unet-grad off", None, False)
    run_config("unet-grad window+cond bwd0", (192, 256, 64, 0), False)
    run_config("unet-grad window nocond bwd0", (192, 256, 64, 0), True)
    run_config("unet-grad window nocond bwd1", (192, 256, 64, 1), True)


if __name__ == "__main__":
    main()
