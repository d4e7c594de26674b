"""Training configuration.

A flat dataclass mirroring every knob of the reference SplatConfig
(splat_py/config.py:30-157), with the same defaults, plus TPU-specific
capacity/parallelism knobs.  Presets ``7k`` and ``30k`` match
splat_py/config.py:161-173.  Yaml round-trip is supported for the
``config.yaml`` dump the CLI writes (reference: colmap_splat.py:46).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import yaml


@dataclass(frozen=True)
class SplatConfig:
    # --- dataset / io -----------------------------------------------------
    dataset_path: str = "garden"
    downsample_factor: int = 4
    output_dir: str = "splat_output"
    checkpoint_interval: int = 10000
    load_checkpoint: bool = False
    checkpoint_path: str = ""
    save_debug_image_interval: int = 200
    print_interval: int = 100

    # --- initialisation ---------------------------------------------------
    initial_opacity: float = 0.2
    initial_scale_num_neighbors: int = 3
    initial_scale_factor: float = 0.8
    max_initial_scale: float = 0.1

    # --- culling ----------------------------------------------------------
    near_thresh: float = 0.3
    far_thresh: float = 500.0
    mh_dist: float = 3.0
    cull_mask_padding: int = 100
    saturated_pixel_value: float = 255.0

    # --- optimisation -----------------------------------------------------
    num_iters: int = 7000
    ssim_frac: float = 0.2
    base_lr: float = 0.002
    xyz_lr_multiplier: float = 0.1
    quat_lr_multiplier: float = 2.0
    scale_lr_multiplier: float = 5.0
    opacity_lr_multiplier: float = 10.0
    rgb_lr_multiplier: float = 2.0
    sh_lr_multiplier: float = 0.1

    # --- evaluation -------------------------------------------------------
    test_eval_interval: int = 500
    test_split_ratio: int = 8

    # --- background schedule ----------------------------------------------
    use_background: bool = True
    use_background_end: int = 6600

    # --- opacity reset schedule --------------------------------------------
    reset_opacity_interval: int = 3001
    reset_opacity_value: float = 0.20
    reset_opacity_start: int = 1050
    reset_opacity_end: int = 6500

    # --- spherical harmonics ------------------------------------------------
    use_sh_precompute: bool = True
    max_sh_band: int = 3
    add_sh_band_interval: int = 1000

    # --- adaptive density control -------------------------------------------
    use_split: bool = True
    use_clone: bool = True
    use_delete: bool = True
    adaptive_control_start: int = 750
    adaptive_control_end: int = 6500
    adaptive_control_interval: int = 100
    max_gaussians: int = 4250000
    delete_opacity_threshold: float = 0.1
    clone_scale_threshold: float = 0.01
    max_scale_norm: float = 0.5
    use_fractional_densification: bool = True
    use_adaptive_fractional_densification: bool = True
    uv_grad_percentile: float = 0.96
    scale_norm_percentile: float = 0.99
    uv_grad_threshold: float = 0.0002
    split_scale_factor: float = 1.6
    num_split_samples: int = 2

    # --- TPU-specific: static capacities & kernels ---------------------------
    # gaussian slot capacity; <=0 derives it from the initial point count
    # (next power of two with at least 8x headroom, capped by max_gaussians)
    gaussian_capacity: int = 0
    # flat splat-list capacity per frame (tile-gaussian intersections)
    splat_capacity: int = 1 << 23
    # hard ceiling for the runner's automatic splat-capacity growth
    max_splat_capacity: int = 1 << 24
    # visible-gaussian compaction capacity per frame; 0 = gaussian capacity
    # (the runner right-sizes this from the observed visible count)
    visible_capacity: int = 0
    # per-tier member capacities (one per culling.TIER_CELLS entry); None
    # derives a conservative default from splat_capacity.  The runner
    # right-sizes these from the observed per-tier member counts — the
    # splat-list width (and so sort/kernel cost) is sum(K_i * cap_i).
    tier_capacities: tuple | None = None
    # rasterizer chunk length (splats per grid step)
    chunk: int = 256
    # reduced-precision mode: "f32" (exact) or "bf16" (gradient rows ride
    # the reduction sorts as packed bf16 pairs — half the sort operands,
    # ~0.4% relative gradient noise).  The rasterizer kernels themselves
    # always run f32 (bf16 MXU casts measured net-negative on v5e).
    # Default bf16: synthetic-convergence PSNR is identical to f32 to the
    # second decimal (PERF.md) and the step is ~10% faster.
    kernel_precision: str = "bf16"
    # random seed
    seed: int = 0
    # number of data-parallel devices (cameras per step); 1 = reference
    # semantics (one camera per iteration)
    data_parallel: int = 1

    def __post_init__(self):
        # configs are static jit arguments: tier_capacities must be
        # hashable (yaml round-trips tuples as lists)
        if isinstance(self.tier_capacities, list):
            object.__setattr__(
                self, "tier_capacities", tuple(self.tier_capacities)
            )

    def replace(self, **kw) -> "SplatConfig":
        return dataclasses.replace(self, **kw)

    def to_yaml(self) -> str:
        d = dataclasses.asdict(self)
        if d.get("tier_capacities") is not None:
            d["tier_capacities"] = list(d["tier_capacities"])
        return yaml.safe_dump(d, sort_keys=False)

    @staticmethod
    def from_yaml(text: str) -> "SplatConfig":
        return SplatConfig(**yaml.safe_load(text))


def preset(name: str) -> SplatConfig:
    """`7k` / `30k` presets (reference: splat_py/config.py:161-173)."""
    if name == "7k":
        return SplatConfig()
    if name == "30k":
        return SplatConfig(
            num_iters=30000,
            adaptive_control_start=1500,
            adaptive_control_end=27500,
            adaptive_control_interval=300,
            reset_opacity_end=27500,
            use_background_end=28000,
        )
    raise ValueError(f"unknown preset {name!r} (expected '7k' or '30k')")
