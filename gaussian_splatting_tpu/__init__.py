"""gaussian_splatting_tpu — a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the
reference PyTorch+CUDA implementation (joeyan/gaussian_splatting):

- per-gaussian geometry (projection, covariance, conic) as pure, fully
  differentiable jnp functions (reference: src/projection.cu,
  src/projection_backward.cu),
- tile assignment + depth ordering as a static-shape tiered expansion and
  lexicographic key sort (reference: src/tile_culling.cu),
- the tile rasterizer forward/backward as Pallas TPU kernels wrapped in
  jax.custom_vjp (reference: src/render.cu, src/render_backward.cu),
- a functional trainer with optax, fixed-capacity adaptive density control,
  and data-parallel multi-chip training over a jax.sharding.Mesh
  (reference: splat_py/trainer.py, splat_py/optimizer_manager.py).
"""

from gaussian_splatting_tpu.structs import Camera, GaussianScene, TILE_PX
from gaussian_splatting_tpu.config import SplatConfig

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "GaussianScene",
    "SplatConfig",
    "TILE_PX",
    "__version__",
]
