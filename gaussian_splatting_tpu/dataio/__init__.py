from gaussian_splatting_tpu.dataio.colmap import (
    read_cameras_bin,
    read_images_bin,
    read_points3d_bin,
    qvec_to_rotation,
)
from gaussian_splatting_tpu.dataio.dataset import ColmapDataset, SceneData

__all__ = [
    "read_cameras_bin",
    "read_images_bin",
    "read_points3d_bin",
    "qvec_to_rotation",
    "ColmapDataset",
    "SceneData",
]
