"""dfu3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of DFU3D.

Reference capabilities (see SURVEY.md): OpenPCDet-style 3D detection (CenterPoint first),
KITTI-protocol evaluation, nuScenes→KITTI conversion, and the DFU3D pseudo-box factory
(LiDAR-camera data-level fusion, noise suppression, L-shape box fitting, self-evolution).

This is a ground-up TPU-first design: static-shape mask-padded tensors, pure-functional
transforms, `jax.sharding.Mesh` data parallelism, and Pallas kernels for hot ops.
"""

__version__ = "0.1.0"
