from gaussian_splatting_tpu.ops.render import render_tiles, splat_features
from gaussian_splatting_tpu.ops.depth import render_depth_tiles

__all__ = ["render_tiles", "splat_features", "render_depth_tiles"]
