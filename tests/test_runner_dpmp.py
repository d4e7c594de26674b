"""Composed dp x mp parallelism driven through the REAL CLI entry point.

VERDICT r3 item 3: `dp_mp_train_step` was dryrun-verified but unreachable
from train.py.  This drives `train.py synthetic --data_parallel 2
--model_parallel 4` end-to-end on an 8-device virtual CPU mesh (subprocess,
so the device-count flag applies before JAX initialises) and checks the
run trains, evaluates (mp_eval_step on the 2D mesh), ADC re-shards, and
checkpoints.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ~8 min on one CPU core: a full (if tiny) training run through the real
# CLI.  The fast dp/mp/dp x mp step + ADC + eval coverage that stays in the
# default run lives in test_parallel.py / test_gsharded.py (and the driver's
# dryrun_multichip exercises the same loop shape on the 8-device mesh).
pytestmark = pytest.mark.slow


def test_train_cli_dp_mp_cpu_mesh(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 "
        + env.get("XLA_FLAGS", "")
    )
    env["JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "run"
    argv = [
        "train.py", "synthetic",
        "--num_iters", "6",
        "--synthetic_points", "192",
        "--synthetic_init_points", "96",
        "--synthetic_images", "6",
        "--synthetic_width", "96",
        "--synthetic_height", "64",
        "--max_gaussians", "512",
        "--splat_capacity", "16384",
        "--data_parallel", "2",
        "--model_parallel", "4",
        "--adaptive_control_start", "2",
        "--adaptive_control_interval", "3",
        "--adaptive_control_end", "6",
        "--test_eval_interval", "5",
        "--print_interval", "2",
        "--use_background", "false",
        "--output_dir", str(out),
    ]
    # this environment pre-imports jax (sitecustomize), so JAX_PLATFORMS
    # alone cannot switch the subprocess off the TPU backend — set the
    # platform in-process before first backend use
    boot = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import sys; sys.argv = {argv!r}; "
        "import runpy; runpy.run_path('train.py', run_name='__main__')"
    )
    r = subprocess.run(
        [sys.executable, "-c", boot], env=env, capture_output=True,
        text=True, timeout=1500, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
    assert "ADC:" in r.stdout, r.stdout[-2000:]
    metrics = json.loads((out / "metrics.json").read_text())
    # the run must have produced finite train metrics and a test eval
    assert metrics["train_psnr"], metrics
    assert metrics["test_psnr"], metrics
    assert all(p == p for p in metrics["test_psnr"])  # not NaN
    assert (out / "ckpt_final.npz").exists()
