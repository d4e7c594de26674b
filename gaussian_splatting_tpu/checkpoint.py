"""Checkpoint save/restore.

Improves on the reference (which saves only the Gaussians module and loses
optimizer state, iteration and schedules on resume — trainer.py:454-459,
colmap_splat.py:56-57): we save the full train state (params, alive mask,
Adam moments, densify accumulators) plus the iteration counter and RNG key
as a flat .npz, so resume is exact.
"""

from __future__ import annotations

import io
import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatting_tpu import optim
from gaussian_splatting_tpu.trainer import TrainState


def save_checkpoint(
    path: str, state: TrainState, iteration: int, key, extra: dict = None
) -> None:
    """``extra``: optional flat dict of small numpy arrays saved under
    ``extra.*`` keys — runner-owned sticky state (the learned capacity
    buckets) that makes resume skip the recompile ladder."""
    adam = optim.adam_moments(state.opt_state)
    flat = dict(
        iteration=np.asarray(iteration),
        rng_key=np.asarray(key),
        alive=np.asarray(state.alive),
        adam_count=np.asarray(adam.count),
        uv_grad_accum=np.asarray(state.uv_grad_accum),
        xyz_grad_accum=np.asarray(state.xyz_grad_accum),
        grad_accum_count=np.asarray(state.grad_accum_count),
    )
    for k, v in state.params.items():
        flat[f"param.{k}"] = np.asarray(v)
        flat[f"mu.{k}"] = np.asarray(adam.mu[k])
        flat[f"nu.{k}"] = np.asarray(adam.nu[k])
    for k, v in (extra or {}).items():
        flat[f"extra.{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_checkpoint_extra(path: str) -> dict:
    """The ``extra.*`` entries of a checkpoint (empty for older files)."""
    z = np.load(path)
    return {
        k[len("extra."):]: z[k] for k in z.files if k.startswith("extra.")
    }


def load_checkpoint(path: str, config) -> tuple:
    """Returns (state, iteration, key)."""
    z = np.load(path)
    params = {
        k[len("param."):]: jnp.asarray(z[k])
        for k in z.files
        if k.startswith("param.")
    }
    opt = optim.make_optimizer(config)
    opt_state = opt.init(params)
    adam = opt_state[0]
    adam = adam._replace(
        count=jnp.asarray(z["adam_count"]),
        mu={k: jnp.asarray(z[f"mu.{k}"]) for k in params},
        nu={k: jnp.asarray(z[f"nu.{k}"]) for k in params},
    )
    opt_state = (adam,) + tuple(opt_state[1:])
    state = TrainState(
        params=params,
        alive=jnp.asarray(z["alive"]),
        opt_state=opt_state,
        uv_grad_accum=jnp.asarray(z["uv_grad_accum"]),
        xyz_grad_accum=jnp.asarray(z["xyz_grad_accum"]),
        grad_accum_count=jnp.asarray(z["grad_accum_count"]),
    )
    return state, int(z["iteration"]), jnp.asarray(z["rng_key"])


def export_ply(path: str, state: TrainState) -> int:
    """Export alive gaussians as a standard 3DGS .ply (binary LE).

    The attribute layout is the community convention every 3DGS viewer
    reads (x/y/z, zero normals, f_dc_0..2, f_rest_0..44 channel-major,
    opacity pre-sigmoid, scale_0..2 log-space, rot_0..3 wxyz) — the
    reference exports only a torch module pickle (colmap_splat.py:76),
    which no external viewer can open.  Returns the vertex count.
    """
    alive = np.asarray(state.alive)
    idx = np.where(alive)[0]
    p = {k: np.asarray(v)[idx] for k, v in state.params.items()}
    n = idx.size
    cols = (
        [("x", p["xyz"][:, 0]), ("y", p["xyz"][:, 1]), ("z", p["xyz"][:, 2])]
        + [("nx", None), ("ny", None), ("nz", None)]
        + [(f"f_dc_{c}", p["rgb"][:, c]) for c in range(3)]
        # sh is (N, 3, 15): channel-major flatten == the reference-
        # community transpose(1, 2).flatten layout
        + [
            (f"f_rest_{c * 15 + k}", p["sh"][:, c, k])
            for c in range(3)
            for k in range(15)
        ]
        + [("opacity", p["opacity"][:, 0])]
        + [(f"scale_{c}", p["scale"][:, c]) for c in range(3)]
        + [(f"rot_{c}", p["quaternion"][:, c]) for c in range(4)]
    )
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {name}\n" for name, _ in cols)
        + "end_header\n"
    )
    data = np.zeros((n, len(cols)), dtype="<f4")
    for j, (_, v) in enumerate(cols):
        if v is not None:
            data[:, j] = v.astype(np.float32)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(data.tobytes())
    os.replace(tmp, path)
    return n


def import_ply(path: str, capacity: int | None = None):
    """Load a community-layout 3DGS .ply as a GaussianScene.

    Inverse of export_ply; also accepts files from other 3DGS trainers
    (any SH degree 0..3 — missing f_rest columns load as zeros).
    """
    from gaussian_splatting_tpu.structs import GaussianScene

    with open(path, "rb") as f:
        raw = f.read()
    head, _, payload = raw.partition(b"end_header\n")
    lines = head.decode("ascii", "replace").splitlines()
    if lines[0].strip() != "ply" or "binary_little_endian" not in lines[1]:
        raise ValueError(f"{path}: not a binary little-endian ply")
    n = None
    props = []
    for ln in lines:
        if ln.startswith("element vertex"):
            n = int(ln.split()[-1])
        elif ln.startswith("property"):
            parts = ln.split()
            if parts[1] != "float":
                raise ValueError(f"{path}: non-float property {parts[-1]}")
            props.append(parts[-1])
    if n is None:
        raise ValueError(f"{path}: no vertex element")
    data = np.frombuffer(
        payload, dtype="<f4", count=n * len(props)
    ).reshape(n, len(props))
    col = {name: data[:, j] for j, name in enumerate(props)}

    def grab(names, default=0.0):
        return np.stack(
            [
                col.get(nm, np.full(n, default, np.float32))
                for nm in names
            ],
            axis=1,
        )

    xyz = grab(["x", "y", "z"])
    rgb = grab(["f_dc_0", "f_dc_1", "f_dc_2"])
    opacity = grab(["opacity"])
    scale = grab(["scale_0", "scale_1", "scale_2"])
    quat = grab(["rot_0", "rot_1", "rot_2", "rot_3"])
    sh = np.stack(
        [
            grab([f"f_rest_{c * 15 + k}" for k in range(15)])
            for c in range(3)
        ],
        axis=1,
    )  # (N, 3, 15)
    return GaussianScene.create(
        xyz, rgb, opacity, scale, quat, sh=sh, capacity=capacity
    )
