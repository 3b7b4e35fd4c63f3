#!/usr/bin/env bash
# Seed-depth head v5 — exact pinned recipe (pairs with weights/tpu_encoder_v6.pt).
#
# Corpus deltas vs v4 (git f4f7f9e, trained with the then-default corpus):
#   - texture_octaves drawn from {1:0.2, 2:0.2, 3:0.6} (v4: single-octave only;
#     the held-out family renders with texture_octaves=3)
#   - look drawn from {sweep:0.3, across:0.35, outward:0.35} (v4: rings only)
#   - 96 scenes (v4: 64)
# Training hyperparameters unchanged (8000 steps, batch 32, lr 1e-3 cosine,
# silog lambda 0.85 + 0.5x gradient-matching loss).
#
# MEASURED OUTCOME (results/heldout/DEPTH_PROBE.jsonl @6e9eb62): a wash.
# Scale-aligned shape error vs v4 on held-out scenes — chesslike_a 6.3% vs
# 6.3%, sweep_a 6.9% vs 5.2%, sweep_b 3.6% vs 3.9% — and raw scale bias got
# WORSE (raw-rel 0.36-0.42 vs 0.11-0.34). The corpus-statistics hypothesis
# (octave/look domain gap) is refuted: the head's shape error plateaus at
# ~4-6% regardless of corpus regime, so the learned-depth ring collapse in
# results/heldout/REPORT.md is not a depth-quality artifact at this level.
# v4 therefore REMAINS the shipped default; this recipe is kept as the
# reproducible negative result and as the corpus baseline for any future
# higher-capacity depth head.
#
# Validate with: python scripts/depth_probe.py --head weights/tpu_depth_v5.pt
set -euo pipefail
cd "$(dirname "$0")/.."

python3 pretrain_depth.py weights/tpu_depth_v5.pt \
    --encoder_path weights/tpu_encoder_v6.pt \
    --num_scenes 96 \
    --views_per_scene 16 \
    --image_height 240 --image_width 320 \
    --steps 8000 \
    --batch_images 32 \
    --learning_rate 1e-3 \
    --seed 97 \
    --corpus v5
