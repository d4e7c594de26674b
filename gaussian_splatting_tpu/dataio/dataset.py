"""Dataset loading + gaussian initialisation from COLMAP reconstructions.

Mirrors splat_py/dataloader.py: Mip-NeRF-360-style layout

    dataset_dir/
        images_{N}/        downsampled images
        sparse/0/{cameras,images,points3D}.bin

Init parity (dataloader.py:43-67, utils.py:19-37):
- opacity  <- inverse_sigmoid(initial_opacity)
- scale    <- log(min(mean dist to k nearest neighbours, cap) * factor)
- quat     <- identity
- rgb      <- point_rgb / 255 / SH_0   (SH DC convention)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List

import numpy as np

from gaussian_splatting_tpu.config import SplatConfig
from gaussian_splatting_tpu.dataio import colmap
from gaussian_splatting_tpu.geometry import SH_0
from gaussian_splatting_tpu.structs import GaussianScene

@dataclasses.dataclass
class CameraInfo:
    K: np.ndarray  # (3, 3) f32
    width: int
    height: int


@dataclasses.dataclass
class ImageInfo:
    path: str
    camera_id: int
    camera_T_world: np.ndarray  # (4, 4) f32


@dataclasses.dataclass
class SceneData:
    xyz: np.ndarray  # (N, 3) f32
    rgb: np.ndarray  # (N, 3) f32 (already / 255 / SH_0)
    images: List[ImageInfo]
    cameras: Dict[int, CameraInfo]

    def load_image(self, idx: int) -> np.ndarray:
        """uint8 (H, W, 3) RGB."""
        import cv2

        img = cv2.imread(self.images[idx].path)
        if img is None:
            raise FileNotFoundError(self.images[idx].path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def knn_mean_distance(points: np.ndarray, k: int) -> np.ndarray:
    """Mean distance to the k nearest neighbours (excluding self) per point.

    NOTE parity detail: the reference queries KDTree with k=num_neighbors
    which INCLUDES the point itself at distance 0 (utils.py:30-33), so its
    'mean of 3 neighbours' is actually mean(0, d1, d2).  We replicate that.
    The reference also uses scipy's KDTree (one slow python query per
    point, utils.py:25-36); the single batched query here is the same
    C tree with none of the per-point overhead.
    """
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    dist, _ = tree.query(points, k=k, workers=-1)
    return dist.mean(axis=1)


def initial_scale(points: np.ndarray, config: SplatConfig) -> np.ndarray:
    d = knn_mean_distance(points, config.initial_scale_num_neighbors)
    s = np.minimum(d, config.max_initial_scale) * config.initial_scale_factor
    return np.log(np.clip(s, 1e-10, None)).astype(np.float32)[:, None].repeat(3, 1)


def create_scene(
    data: SceneData, config: SplatConfig, capacity: int
) -> GaussianScene:
    n = data.xyz.shape[0]
    opacity = np.full((n, 1), np.log(
        config.initial_opacity / (1 - config.initial_opacity)
    ), np.float32)
    scale = initial_scale(data.xyz, config)
    quat = np.zeros((n, 4), np.float32)
    quat[:, 0] = 1.0
    return GaussianScene.create(
        xyz=data.xyz, rgb=data.rgb, opacity=opacity, scale=scale,
        quaternion=quat, capacity=capacity,
    )


class ColmapDataset:
    """Loads a COLMAP/Mip-NeRF-360 dataset (splat_py/dataloader.py:84-188)."""

    def __init__(self, root: str, downsample_factor: int):
        self.root = root
        self.downsample = downsample_factor
        sparse = os.path.join(root, "sparse", "0")
        xyz, rgb = colmap.read_points3d_bin(
            os.path.join(sparse, "points3D.bin")
        )
        self.xyz = xyz.astype(np.float32)
        self.rgb = (rgb.astype(np.float32) / 255.0 / SH_0).astype(np.float32)

        images = colmap.read_images_bin(os.path.join(sparse, "images.bin"))
        cameras = colmap.read_cameras_bin(os.path.join(sparse, "cameras.bin"))

        self.images: List[ImageInfo] = []
        img_dir = os.path.join(root, f"images_{downsample_factor}")
        for _, im in sorted(images.items()):
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = colmap.qvec_to_rotation(im.qvec)
            T[:3, 3] = im.tvec
            self.images.append(
                ImageInfo(
                    path=os.path.join(img_dir, im.name),
                    camera_id=im.camera_id,
                    camera_T_world=T,
                )
            )

        # probe actual image size (downsampled images may round dimensions)
        import cv2

        probe = cv2.imread(self.images[0].path)
        if probe is None:
            raise FileNotFoundError(
                f"cannot read {self.images[0].path} — is images_"
                f"{downsample_factor}/ present?"
            )
        height, width = probe.shape[:2]

        self.cameras: Dict[int, CameraInfo] = {}
        for cam_id, cam in cameras.items():
            K = np.zeros((3, 3), np.float32)
            d = float(downsample_factor)
            if cam.model == "SIMPLE_PINHOLE":
                K[0, 0] = K[1, 1] = cam.params[0] / d
                K[0, 2] = cam.params[1] / d
                K[1, 2] = cam.params[2] / d
            elif cam.model == "PINHOLE":
                K[0, 0] = cam.params[0] / d
                K[1, 1] = cam.params[1] / d
                K[0, 2] = cam.params[2] / d
                K[1, 2] = cam.params[3] / d
            else:
                raise NotImplementedError(
                    f"camera model {cam.model} not supported (reference "
                    "supports SIMPLE_PINHOLE and PINHOLE only, "
                    "dataloader.py:166-181)"
                )
            K[2, 2] = 1.0
            self.cameras[cam_id] = CameraInfo(K=K, width=width, height=height)

    def scene_data(self) -> SceneData:
        return SceneData(
            xyz=self.xyz, rgb=self.rgb, images=self.images,
            cameras=self.cameras,
        )
