"""Core data structures: cameras, the fixed-capacity gaussian scene, tile grids.

Reference parity notes
----------------------
The reference keeps the scene in a ``torch.nn.Module`` whose parameter
tensors change shape at runtime (``splat_py/structs.py:46-114``).  XLA wants
static shapes, so :class:`GaussianScene` is a pytree of fixed-*capacity*
arrays plus an ``alive`` mask; adaptive density control edits slots in place
instead of re-allocating (see ``trainer.py``).  Parameterisation matches the
reference exactly: ``opacity`` is pre-sigmoid, ``scale`` is log-space,
``quaternion`` is wxyz (normalised on use, not on store).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Side length of a rasterization tile in pixels (reference:
# splat_py/structs.py:4 `TILE_EDGE_LENGTH_PX = 16`).
TILE_PX = 16

# Max number of SH coefficients per channel including the DC term
# (bands 0..3 -> 1+3+5+7 = 16; the DC term is stored in `rgb`, the other 15
# in `sh`; reference: splat_py/trainer.py:77-112).
MAX_SH_COEFFS = 16


class GSMetricsLog:
    """Training metric traces (reference: splat_py/structs.py:7-11, plus
    eval SSIM / iteration markers / ADC events / overflow counts the
    reference keeps only in stdout)."""

    def __init__(self):
        self.train_psnr = []
        self.test_psnr = []
        self.test_ssim = []
        self.eval_iters = []
        self.num_gaussians = []
        self.adc_events = []  # dicts: iter, deleted, cloned, split, alive
        self.overflow_steps = 0
        # oversized-window truncation (culling.SplatLayout.truncated):
        # steps where any window tail was dropped, and the total dropped
        # cell count — quantifies the quality cost of the TIER_CELLS[-1]
        # window cap over a whole run
        self.truncated_steps = 0
        self.truncated_cells = 0

    def to_dict(self) -> dict:
        return dict(
            train_psnr=self.train_psnr,
            test_psnr=self.test_psnr,
            test_ssim=self.test_ssim,
            eval_iters=self.eval_iters,
            num_gaussians=self.num_gaussians,
            adc_events=self.adc_events,
            overflow_steps=self.overflow_steps,
            truncated_steps=self.truncated_steps,
            truncated_cells=self.truncated_cells,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera (reference: splat_py/structs.py:30-43).

    ``K`` is the 3x3 intrinsic matrix; width/height are static python ints so
    the image shape is known at trace time.
    """

    K: jax.Array  # (3, 3) float32
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianScene:
    """The whole scene as a fixed-capacity pytree of parameter arrays.

    Entries at slots where ``alive`` is False are inert: they are excluded
    from rendering via the visibility mask and receive zero gradients.

    Fields (C = capacity):
      xyz        (C, 3)  world positions
      rgb        (C, 3)  SH DC coefficients (colour / SH_0 convention,
                         reference: splat_py/dataloader.py:126-128)
      opacity    (C, 1)  pre-sigmoid opacity
      scale      (C, 3)  log-space scales
      quaternion (C, 4)  wxyz rotation (normalised on use)
      sh         (C, 3, 15) higher-band SH coefficients (bands 1..3); always
                 allocated, gated by `n_active_sh` in the pipeline so the
                 band schedule never changes array shapes (reference grows
                 the tensor: splat_py/trainer.py:77-112)
      alive      (C,)   bool slot-occupancy mask
    """

    xyz: jax.Array
    rgb: jax.Array
    opacity: jax.Array
    scale: jax.Array
    quaternion: jax.Array
    sh: jax.Array
    alive: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    def params(self) -> dict:
        """The trainable-leaf dict (what the optimizer sees)."""
        return dict(
            xyz=self.xyz,
            rgb=self.rgb,
            opacity=self.opacity,
            scale=self.scale,
            quaternion=self.quaternion,
            sh=self.sh,
        )

    def replace(self, **kw) -> "GaussianScene":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def from_params(params: dict, alive: jax.Array) -> "GaussianScene":
        return GaussianScene(alive=alive, **params)

    @staticmethod
    def create(
        xyz: np.ndarray,
        rgb: np.ndarray,
        opacity: np.ndarray,
        scale: np.ndarray,
        quaternion: np.ndarray,
        sh: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
        dtype=jnp.float32,
    ) -> "GaussianScene":
        """Build a scene from N gaussians, padded up to ``capacity`` slots."""
        n = xyz.shape[0]
        cap = int(capacity) if capacity is not None else n
        assert cap >= n, f"capacity {cap} < n {n}"

        def pad(a, shape_tail):
            a = jnp.asarray(a, dtype=dtype).reshape((n,) + shape_tail)
            return jnp.zeros((cap,) + shape_tail, dtype=dtype).at[:n].set(a)

        quat = pad(quaternion, (4,))
        # dead slots keep an identity quaternion so normalisation stays finite
        quat = quat.at[n:, 0].set(1.0)
        sh_full = jnp.zeros((cap, 3, MAX_SH_COEFFS - 1), dtype=dtype)
        if sh is not None:
            sh_arr = jnp.asarray(sh, dtype=dtype)
            sh_full = sh_full.at[:n, :, : sh_arr.shape[2]].set(sh_arr)
        alive = jnp.zeros((cap,), dtype=jnp.bool_).at[:n].set(True)
        return GaussianScene(
            xyz=pad(xyz, (3,)),
            rgb=pad(rgb, (3,)),
            opacity=pad(opacity, (1,)),
            scale=pad(scale, (3,)),
            quaternion=quat,
            sh=sh_full,
            alive=alive,
        )


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Static tile-grid geometry for an image (reference:
    splat_py/structs.py:117-138 `Tiles`)."""

    image_height: int
    image_width: int

    @property
    def image_height_padded(self) -> int:
        return -(-self.image_height // TILE_PX) * TILE_PX

    @property
    def image_width_padded(self) -> int:
        return -(-self.image_width // TILE_PX) * TILE_PX

    @property
    def y_tiles(self) -> int:
        return self.image_height_padded // TILE_PX

    @property
    def x_tiles(self) -> int:
        return self.image_width_padded // TILE_PX

    @property
    def tile_count(self) -> int:
        return self.y_tiles * self.x_tiles
