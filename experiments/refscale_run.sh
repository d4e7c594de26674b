#!/bin/bash
# Reference-scale end-to-end training (VERDICT r2 item 3): a 1.2M-point
# synthetic secret scene at garden resolution, trained from a 200k sparse
# init so ADC must grow the scene through ~1M+ alive slots over the full
# 7k schedule stack.  Produces the checkpoint bench.py's trained-scene
# bootstrap samples from (experiments/make_bench_scene.py).
#
# Run on the real TPU chip (takes tens of minutes + compiles):
#   bash experiments/refscale_run.sh [outdir]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-runs/refscale7k}
mkdir -p "$OUT"
python -u train.py synthetic \
  --num_iters 7000 \
  --synthetic_points 1200000 \
  --synthetic_init_points 200000 \
  --synthetic_images 96 \
  --synthetic_width 1296 --synthetic_height 840 \
  --max_gaussians 4000000 \
  --steps_per_dispatch 25 \
  --checkpoint_interval 3500 \
  --output_dir "$OUT" 2>&1 | tee "$OUT/run.log"
python experiments/make_bench_scene.py "$OUT/ckpt_final.npz" \
  --out bench_scene_sample.npz
