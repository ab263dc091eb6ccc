"""fullysparsefusion_tpu — a TPU-native (JAX/XLA/Pallas) fully-sparse LiDAR+camera
3D detection framework.

Re-designed from scratch with the capabilities of BraveGroup/FullySparseFusion
(FSF, TPAMI 2024): a multi-modal fully-sparse 3D detector that never builds a
dense BEV map. The compute path is pure JAX (XLA + Pallas kernels); parallelism
is expressed over a `jax.sharding.Mesh`.

Design principles (see SURVEY.md §7):
  * static shapes everywhere — every data-dependent set (foreground points,
    voxels, clusters, RoI points) lives in a fixed-capacity container with a
    validity mask;
  * segment reduces (sort + segment_sum/max) replace torch_scatter;
  * the sparse 3D UNet is an implicit-GEMM gather-matmul-scatter over padded
    active-voxel sets;
  * clustering is iterative label propagation under `lax.while_loop`;
  * data-parallel training is a sharded `jit` step — gradient/pmean collectives
    ride ICI via GSPMD, not hand-written NCCL calls.
"""

__version__ = "0.1.0"
