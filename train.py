#!/usr/bin/env python
"""Train a 3D gaussian splat from a COLMAP dataset (or synthetic data).

Usage (mirrors the reference CLI, colmap_splat.py):

    python train.py 7k  --dataset_path /path/to/garden --downsample_factor 4
    python train.py 30k --dataset_path /path/to/counter --downsample_factor 2
    python train.py synthetic --num_iters 300          # no dataset needed

Every SplatConfig field is exposed as a flag (--num_iters, --base_lr, ...).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np


def build_parser():
    from gaussian_splatting_tpu.config import FIELD_HELP, SplatConfig, preset

    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="preset", required=True)
    for name in ("7k", "30k", "synthetic"):
        p = sub.add_parser(
            name, formatter_class=argparse.ArgumentDefaultsHelpFormatter
        )
        base = preset("7k" if name == "synthetic" else name)
        for f in dataclasses.fields(SplatConfig):
            default = getattr(base, f.name)
            help_text = FIELD_HELP.get(f.name, "")
            if f.type == "bool" or isinstance(default, bool):
                p.add_argument(
                    f"--{f.name}", type=lambda s: s.lower() in ("1", "true", "yes"),
                    default=default, help=help_text,
                )
            elif default is None or isinstance(default, tuple):
                # tuple knobs (tier_capacities): comma-separated ints,
                # empty string = None (derive defaults)
                p.add_argument(
                    f"--{f.name}",
                    type=lambda s: tuple(int(x) for x in s.split(","))
                    if s else None,
                    default=default, help=help_text,
                )
            else:
                p.add_argument(
                    f"--{f.name}", type=type(default), default=default,
                    help=help_text,
                )
    return parser


def make_synthetic_scene_data(
    n_points=20000, n_images=48, seed=0, width=640, height=480
):
    # 48 ring views (7.5 degrees apart, 6 held out for test): with only 16
    # views the trainer overfits hard — train PSNR ~38 while the 22.5
    # degrees-away test views collapse — which measures the benchmark's
    # view sparsity, not the framework
    """A camera ring around a colourful box of points; gt images are
    rendered from a denser gaussian set so training has a real target."""
    from gaussian_splatting_tpu.dataio.dataset import SceneData, CameraInfo, ImageInfo

    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-2, 2, (n_points, 3)).astype(np.float32)
    rgb_raw = (np.abs(np.sin(xyz * 3.0)) * 255).astype(np.uint8)
    from gaussian_splatting_tpu.geometry import SH_0

    rgb = rgb_raw.astype(np.float32) / 255.0 / SH_0
    W, H = width, height
    f = 500.0 * (W / 640.0)  # keep the 640px field of view at any size
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    cameras = {0: CameraInfo(K=K, width=W, height=H)}
    images = []
    for i in range(n_images):
        th = 2 * np.pi * i / n_images
        # camera on a ring of radius 8 looking at the origin
        c = np.array([8 * np.sin(th), 0.0, -8 * np.cos(th)], np.float32)
        fwd = -c / np.linalg.norm(c)
        right = np.cross(np.array([0, 1, 0], np.float32), fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd])  # world->camera rows
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = -R @ c
        images.append(ImageInfo(path=f"synthetic_{i}", camera_id=0,
                                camera_T_world=T))
    return SceneData(xyz=xyz, rgb=rgb, images=images, cameras=cameras)


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    # the TPU backend's sort compiles are expensive (minutes); persist
    # them across runs so only the first run of a bucket shape pays
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from gaussian_splatting_tpu.config import SplatConfig

    cfg_fields = {f.name for f in dataclasses.fields(SplatConfig)}
    config = SplatConfig(
        **{k: v for k, v in vars(args).items() if k in cfg_fields}
    )

    os.makedirs(config.output_dir, exist_ok=True)
    with open(os.path.join(config.output_dir, "config.yaml"), "w") as f:
        f.write(config.to_yaml())

    from gaussian_splatting_tpu.runner import TrainingRunner

    if args.preset == "synthetic":
        data = make_synthetic_scene_data(
            n_points=config.synthetic_points,
            n_images=config.synthetic_images,
            seed=config.seed,
            width=config.synthetic_width,
            height=config.synthetic_height,
        )
        synthetic = True
    else:
        from gaussian_splatting_tpu.dataio.dataset import ColmapDataset

        data = ColmapDataset(
            config.dataset_path, config.downsample_factor
        ).scene_data()
        synthetic = False

    runner = TrainingRunner(data, config, synthetic=synthetic)
    start = time.time()
    runner.train()
    mins, secs = divmod(time.time() - start, 60)
    print(f"Total training time: {int(mins)}min {int(secs)}sec")
    if runner.metrics.test_psnr:
        print("Max Test PSNR:", max(runner.metrics.test_psnr))


if __name__ == "__main__":
    main()
