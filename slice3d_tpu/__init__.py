"""slice3d_tpu — TPU-native single-view 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the Slice3D
reference pipeline (regression slicing, latent-diffusion slice generation,
implicit SDF decoding, and mesh extraction), designed for TPU hardware:
NHWC/bfloat16 convs on the MXU, jit-compiled static-shape inference paths,
pjit/shard_map data- and point-parallelism over a device mesh, and host-side
native (C++) mesh extraction overlapped with device SDF queries.
"""

__version__ = "0.1.0"
