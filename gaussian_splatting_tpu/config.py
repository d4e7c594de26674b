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
    # initialise / fine-tune from a community 3DGS .ply instead of
    # SfM points (checkpoint.import_ply)
    load_ply: str = ""
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
    # apply optimisation updates even on frames whose layout overflowed a
    # tier capacity (rendering with the tier's smallest members dropped).
    # Default off: overflowing frames are skipped and the runner grows the
    # capacity buckets.  The runner flips this on automatically when the
    # max_splat_capacity clamp stops capacities from growing any further —
    # degraded rendering beats a silent training stall (ADVICE r2).
    overflow_updates: bool = False
    # --- synthetic benchmark scene (train.py `synthetic` preset) -----------
    # target/secret point count (the gt renderer's scene density)
    synthetic_points: int = 20000
    # number of ring views (every test_split_ratio-th is held out)
    synthetic_images: int = 48
    # train-init point count; 0 initialises from every synthetic point.
    # A sparse init against the dense secret scene forces ADC to grow the
    # scene toward reference-scale gaussian counts (VERDICT r2 item 3)
    synthetic_init_points: int = 0
    # synthetic camera resolution
    synthetic_width: int = 640
    synthetic_height: int = 480
    # random seed
    seed: int = 0
    # number of data-parallel devices (cameras per step); 1 = reference
    # semantics (one camera per iteration)
    data_parallel: int = 1
    model_parallel: int = 1
    # train this many steps per device dispatch (lax.scan inside one
    # jit; trainer.train_steps_scan).  1 = the reference's per-step
    # Python loop; >1 amortises per-dispatch host latency and needs
    # the train images pre-staged on device (single-device mode only)
    steps_per_dispatch: int = 1
    # capture a device trace (jax.profiler) covering iterations
    # [profile_start, profile_start + profile_steps) into
    # output_dir/trace; 0 steps = off
    profile_start: int = 20
    profile_steps: int = 0

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


# one-line help per field, rendered by the CLI (train.py) — the reference
# documents its knobs via tyro-rendered docstrings (splat_py/config.py:30-157)
FIELD_HELP = {
    "dataset_path": "COLMAP dataset directory (sparse/0 + images)",
    "downsample_factor": "image downsample factor (1, 2, 4, 8)",
    "output_dir": "directory for config.yaml, checkpoints, debug images",
    "checkpoint_interval": "save a checkpoint every N iterations",
    "load_checkpoint": "resume from checkpoint_path instead of initialising",
    "checkpoint_path": "checkpoint .npz to resume from",
    "load_ply": "initialise from a 3DGS .ply (viewer/community layout)",
    "save_debug_image_interval": "save a render of train view 0 every N "
    "iterations (0 disables)",
    "print_interval": "print train PSNR/size every N iterations",
    "initial_opacity": "initial opacity of every gaussian",
    "initial_scale_num_neighbors": "K for the KNN that sets initial scales",
    "initial_scale_factor": "initial scale = factor * mean KNN distance",
    "max_initial_scale": "upper clamp on the initial scale",
    "near_thresh": "cull gaussians closer than this camera-space depth",
    "far_thresh": "cull gaussians farther than this camera-space depth",
    "mh_dist": "Mahalanobis distance defining a splat's tile footprint",
    "cull_mask_padding": "pixels outside the image still considered visible",
    "saturated_pixel_value": "white level used to normalise images",
    "num_iters": "total training iterations",
    "ssim_frac": "loss = (1-frac)*L1 + frac*(1-SSIM)",
    "base_lr": "Adam base learning rate",
    "xyz_lr_multiplier": "xyz lr = base_lr * this",
    "quat_lr_multiplier": "quaternion lr = base_lr * this",
    "scale_lr_multiplier": "scale lr = base_lr * this",
    "opacity_lr_multiplier": "opacity lr = base_lr * this",
    "rgb_lr_multiplier": "rgb (SH DC) lr = base_lr * this",
    "sh_lr_multiplier": "higher SH band lr = base_lr * this",
    "test_eval_interval": "evaluate the test split every N iterations",
    "test_split_ratio": "every Nth image is held out for test",
    "use_background": "cycle the background colour during early training",
    "use_background_end": "stop the background cycle at this iteration",
    "reset_opacity_interval": "reset opacities every N iterations",
    "reset_opacity_value": "opacity value applied by a reset",
    "reset_opacity_start": "first iteration a reset may fire",
    "reset_opacity_end": "last iteration a reset may fire",
    "use_sh_precompute": "evaluate SH once per gaussian per view (vs "
    "per-pixel ray directions in the kernel)",
    "max_sh_band": "highest spherical-harmonics band (0-3)",
    "add_sh_band_interval": "unlock one more SH band every N iterations",
    "use_split": "ADC: split large high-gradient gaussians",
    "use_clone": "ADC: clone small high-gradient gaussians",
    "use_delete": "ADC: delete transparent/stale gaussians",
    "adaptive_control_start": "first iteration ADC may fire",
    "adaptive_control_end": "last iteration ADC may fire",
    "adaptive_control_interval": "run ADC every N iterations",
    "max_gaussians": "stop densifying above this many alive gaussians",
    "delete_opacity_threshold": "delete gaussians below this opacity",
    "clone_scale_threshold": "clone below this max scale, split above",
    "max_scale_norm": "upper clamp on scale norms (reference parity knob)",
    "use_fractional_densification": "percentile-based densify thresholds "
    "instead of a fixed uv-grad threshold",
    "use_adaptive_fractional_densification": "anneal the densify "
    "percentiles toward the end of ADC",
    "uv_grad_percentile": "uv-gradient percentile that triggers densify",
    "scale_norm_percentile": "scale percentile that triggers split",
    "uv_grad_threshold": "fixed uv-grad densify threshold (non-fractional)",
    "split_scale_factor": "each split sample shrinks scale by this factor",
    "num_split_samples": "samples per split (fixed-capacity impl: 2)",
    "gaussian_capacity": "gaussian slot capacity; <=0 derives it from the "
    "initial point count (8x headroom, capped by max_gaussians)",
    "splat_capacity": "flat per-frame splat-list capacity used to derive "
    "default tier capacities",
    "max_splat_capacity": "hard ceiling for automatic splat-capacity growth",
    "visible_capacity": "visible-gaussian compaction capacity per frame "
    "(0 = gaussian capacity; the runner right-sizes it)",
    "tier_capacities": "per-tier member capacities, comma-separated (one "
    "per culling.TIER_CELLS entry); empty derives from splat_capacity",
    "chunk": "rasterizer chunk length (splats per grid step)",
    "kernel_precision": "'f32' (exact) or 'bf16' (sort operands ride as "
    "packed bf16 pairs; ~0.4%% gradient noise, ~25%% faster step)",
    "overflow_updates": "apply updates even on tier-capacity-overflowing "
    "frames (runner flips this on at the max_splat_capacity ceiling)",
    "synthetic_points": "synthetic preset: secret-scene (gt) point count",
    "synthetic_images": "synthetic preset: number of ring views",
    "synthetic_init_points": "synthetic preset: train-init point count "
    "(0 = all synthetic points; a sparse init forces ADC growth)",
    "synthetic_width": "synthetic preset: image width",
    "synthetic_height": "synthetic preset: image height",
    "seed": "random seed",
    "data_parallel": "data-parallel devices (cameras per step); 1 = "
    "reference semantics",
    "model_parallel": "gaussian-sharded devices (scene + image bands "
    "sharded over the mesh); 1 = single-device",
    "steps_per_dispatch": "steps per device dispatch (lax.scan chunks "
    "between schedule events); 1 = per-step dispatch",
    "profile_start": "first iteration of the device-trace window",
    "profile_steps": "device-trace window length (0 = no profiling)",
}


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
