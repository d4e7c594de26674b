#!/usr/bin/env python
"""Extract a compact bootstrap sample from a trained checkpoint for bench.py.

VERDICT r2 item 5: the bench scene must match a TRAINED scene's statistics
(heavy-tailed scales, surface-clustered positions -> deep tiles), not an
i.i.d. uniform draw.  A full reference-scale checkpoint is ~0.5 GB; instead
this stores a 50k-gaussian subsample (positions, log-scales, pre-sigmoid
opacities, quaternions) plus each kept point's nearest-neighbor distance
within the subsample.  bench.py bootstrap-resamples it to garden scale:
pick a stored gaussian, jitter its position by a fraction of its local NN
distance — spatial clustering (and therefore per-tile splat depth) is
preserved while every resampled gaussian is distinct.

Usage: python experiments/make_bench_scene.py CKPT.npz [--out PATH] [--n N]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--out", default="/root/repo/bench_scene_sample.npz")
    ap.add_argument("--n", type=int, default=50_000)
    args = ap.parse_args()

    from gaussian_splatting_tpu import checkpoint as ckpt
    from gaussian_splatting_tpu.config import SplatConfig

    state, it, _key = ckpt.load_checkpoint(args.ckpt, SplatConfig())
    alive = np.asarray(state.alive)
    idx = np.where(alive)[0]
    print(f"checkpoint @ iter {it}: {idx.size} alive gaussians")
    rng = np.random.default_rng(0)
    keep = rng.choice(idx, size=min(args.n, idx.size), replace=False)

    xyz = np.asarray(state.params["xyz"])[keep].astype(np.float32)
    scale = np.asarray(state.params["scale"])[keep].astype(np.float32)
    opacity = np.asarray(state.params["opacity"])[keep].astype(np.float32)
    quat = np.asarray(state.params["quaternion"])[keep].astype(np.float32)

    from scipy.spatial import cKDTree

    tree = cKDTree(xyz)
    # distance to the 2nd neighbor (1st is self)
    d, _ = tree.query(xyz, k=2)
    nn = d[:, 1].astype(np.float32)

    np.savez_compressed(
        args.out, xyz=xyz, scale=scale, opacity=opacity, quat=quat, nn=nn,
        n_alive=np.int64(idx.size), iteration=np.int64(it),
    )
    print(f"wrote {args.out} ({keep.size} samples)")


if __name__ == "__main__":
    main()
