#!/usr/bin/env bash
# Reconstruct the 7-Scenes dataset with ACE0 (TPU-native build).
# Mirrors the reference recipe: known focal 525, 5 seed trials.
# Usage: scripts/reconstruct_7scenes.sh [datasets_folder] [out_folder] [scenes...]
set -euo pipefail

datasets_folder="${1:-datasets/7scenes_ace}"
out_folder="${2:-results/7scenes}"
shift 2 2>/dev/null || true
scenes=("${@:-chess fire heads office pumpkin redkitchen stairs}")
[ $# -eq 0 ] && scenes=(chess fire heads office pumpkin redkitchen stairs)

for scene in "${scenes[@]}"; do
  scene_out_dir="${out_folder}/${scene}"
  mkdir -p "${scene_out_dir}"
  ./ace_zero.py "${datasets_folder}/${scene}/train/*.png" "${scene_out_dir}" \
    --try_seeds 5 \
    --use_external_focal_length 525 \
    --depth_files "${datasets_folder}/${scene}/train/*_depth.png" \
    2>&1 | tee "${scene_out_dir}/log_${scene}.txt"

  ./eval_poses.py "${scene_out_dir}/poses_final.txt" \
    "${datasets_folder}/${scene}/train/*_pose.txt" \
    2>&1 | tee "${scene_out_dir}/eval_${scene}.txt"
done
