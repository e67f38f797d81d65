"""voxblox_tpu: a TPU-native volumetric TSDF/ESDF mapping framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
ethz-asl/voxblox (see SURVEY.md): block-pool voxel layers, fused
ray-casting TSDF integration, parallel-sweep ESDF propagation, marching
cubes meshing, trilinear map queries, ICP alignment, a differentiable
sphere-tracing renderer, protobuf-compatible serialization, and
multi-chip sharding via jax device meshes.
"""

__version__ = "0.1.0"

from .core import grid, hash, layer  # noqa: F401
from .core.layer import VoxelLayer, make_layer  # noqa: F401
