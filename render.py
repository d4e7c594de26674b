#!/usr/bin/env python
"""Render a trained scene from a checkpoint (.npz) or 3DGS .ply.

Inference-only companion to train.py (the reference has no standalone
renderer — colmap_splat.py only trains).  Renders either the views of a
COLMAP dataset or a circular orbit around the scene, optionally with
depth maps.

    python render.py scene_final.ply --orbit 8 --out renders/
    python render.py ckpt_final.npz --dataset_path garden \
        --downsample_factor 4 --out renders/ --depth
"""

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("scene", help="ckpt .npz or 3DGS .ply")
    p.add_argument("--out", default="renders")
    p.add_argument("--dataset_path", default="")
    p.add_argument("--downsample_factor", type=int, default=4)
    p.add_argument("--orbit", type=int, default=0,
                   help="render N orbit views instead of dataset views")
    p.add_argument("--width", type=int, default=1296)
    p.add_argument("--height", type=int, default=840)
    p.add_argument("--focal", type=float, default=1100.0)
    p.add_argument("--sh_band", type=int, default=3)
    p.add_argument("--depth", action="store_true",
                   help="also save depth maps (-1 = no surface)")
    p.add_argument("--alpha_threshold", type=float, default=0.5,
                   help="accumulated-alpha crossing that defines the depth "
                   "surface (reference knob: splat_py/depth.py:18)")
    p.add_argument("--splat_capacity", type=int, default=1 << 22)
    return p


def orbit_poses(xyz, n, height_frac=0.15):
    """n cameras on a circle around the scene centroid, looking at it."""
    c = xyz.mean(0)
    r = float(np.quantile(np.linalg.norm(xyz - c, axis=1), 0.95)) * 2.2
    poses = []
    for t in np.linspace(0, 2 * np.pi, n, endpoint=False):
        eye = c + r * np.array(
            [np.sin(t), -height_frac, np.cos(t)], np.float32
        )
        fwd = c - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, np.array([0, -1.0, 0], np.float32))
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        R = np.stack([right, up, fwd])  # world -> camera rows
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = -R @ eye
        poses.append(T)
    return poses


def main():
    args = build_parser().parse_args()
    import jax.numpy as jnp

    from gaussian_splatting_tpu import checkpoint as ckpt
    from gaussian_splatting_tpu.config import SplatConfig
    from gaussian_splatting_tpu.rasterize import rasterize, render_depth
    from gaussian_splatting_tpu.structs import Camera, GaussianScene

    cfg = SplatConfig(splat_capacity=args.splat_capacity)
    if args.scene.endswith(".ply"):
        scene = ckpt.import_ply(args.scene)
        params, alive = scene.params(), scene.alive
    else:
        state, _it, _key = ckpt.load_checkpoint(args.scene, cfg)
        params, alive = state.params, state.alive
    n_alive = int(np.asarray(alive).sum())
    print(f"{args.scene}: {n_alive} gaussians")

    os.makedirs(args.out, exist_ok=True)
    views = []
    if args.orbit > 0:
        xyz = np.asarray(params["xyz"])[np.asarray(alive)]
        K = np.array(
            [[args.focal, 0, args.width / 2],
             [0, args.focal, args.height / 2], [0, 0, 1]], np.float32,
        )
        for j, pose in enumerate(orbit_poses(xyz, args.orbit)):
            views.append((f"orbit_{j:03d}", K, pose,
                          args.width, args.height))
    else:
        from gaussian_splatting_tpu.dataio.dataset import ColmapDataset

        data = ColmapDataset(
            args.dataset_path, args.downsample_factor
        ).scene_data()
        for j, im in enumerate(data.images):
            cam = data.cameras[im.camera_id]
            views.append((f"view_{j:03d}", np.asarray(cam.K),
                          np.asarray(im.camera_T_world),
                          cam.width, cam.height))

    from PIL import Image

    for name, K, pose, w, h in views:
        cam = Camera(K=jnp.asarray(K), width=w, height=h)
        res = rasterize(
            params, alive, jnp.asarray(pose), cam,
            near_thresh=cfg.near_thresh, far_thresh=cfg.far_thresh,
            cull_mask_padding=cfg.cull_mask_padding, mh_dist=cfg.mh_dist,
            background_rgb=jnp.zeros(3, jnp.float32),
            n_sh_band=args.sh_band,
            splat_capacity=cfg.splat_capacity, chunk=cfg.chunk,
        )
        img = (np.clip(np.asarray(res.image), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(args.out, f"{name}.png"))
        if args.depth:
            d = render_depth(
                params, alive, jnp.asarray(pose), cam,
                alpha_threshold=args.alpha_threshold,
                near_thresh=cfg.near_thresh,
                cull_mask_padding=cfg.cull_mask_padding,
                mh_dist=cfg.mh_dist, splat_capacity=cfg.splat_capacity,
                chunk=cfg.chunk,
            )
            d = np.asarray(d)[..., 0]
            vmax = max(float(d.max()), 1e-6)
            dimg = np.where(d < 0, 0, d / vmax)
            Image.fromarray(
                (dimg * 255).astype(np.uint8)
            ).save(os.path.join(args.out, f"{name}_depth.png"))
        print(f"  wrote {name} ({w}x{h}, {int(res.num_splats)} splats)")


if __name__ == "__main__":
    main()
