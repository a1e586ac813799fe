"""Practical Deep Stereo — TPU-native framework.

A from-scratch JAX/XLA/Pallas re-design of the Practical Deep Stereo (PDS)
pipeline ("Practical Deep Stereo: Toward applications-friendly deep stereo
matching", Tulyakov, Ivanov, Fleuret — NeurIPS 2018).

Capability parity target: tlkvstepan/PracticalDeepStereo_NIPS2018
(mounted read-only at /root/reference). This package is NOT a port: the
reference is single-GPU PyTorch with batch-size-1 Python loops; this framework
is a functional, jit-compiled, mesh-shardable TPU program:

  * channels-last layouts (NHWC images, [B, D, H, W, C] cost volumes,
    disparity-last similarity maps) so reductions/softmaxes run on the
    128-wide lane dimension;
  * the per-disparity matching loop (reference ``matching.py:52-63``) is
    replaced by a linearity-factored cost-volume build plus disparity-batched
    MXU convolutions (see :mod:`.ops.costvolume`);
  * parallelism via ``jax.sharding.Mesh`` + GSPMD (data axis + cost-volume
    spatial sharding with compiler-inserted halo exchanges), not NCCL/MPI;
  * pure-functional model/optimizer state (pytrees), single jitted train step.

Subpackages
-----------
``ops``       numerics kernels: padding, cost volume, subpixel MAP estimator,
              subpixel cross-entropy loss, error metrics.
``models``    the PDS network: embedding / matching / 3D-hourglass
              regularization composed functionally.
``parallel``  device meshes and sharding rules.
``data``      FlyingThings3D / KITTI datasets, PFM/PNG IO, prefetching loader.
``training``  trainer, optimizer, LR schedule, checkpointing.
``utils``     logging and visualization.
"""

__version__ = "0.1.0"
