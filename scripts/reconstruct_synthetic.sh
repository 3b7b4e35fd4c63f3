#!/usr/bin/env bash
# Hermetic smoke recipe: generate a synthetic room and reconstruct it.
set -euo pipefail

out_folder="${1:-results/synthetic}"
scene_folder="${2:-datasets/synthetic_room}"

python3 datasets/setup_synthetic.py --out "${scene_folder}" --views 60 --look across
focal=$(cat "${scene_folder}/focal_length.txt")

./ace_zero.py "${scene_folder}/*.png" "${out_folder}" \
  --depth_files "${scene_folder}/*_depth.npy" \
  --use_external_focal_length "${focal}" \
  --encoder_path weights/tpu_encoder_v2.pt \
  2>&1 | tee "${out_folder}/log.txt"

./eval_poses.py "${out_folder}/poses_final.txt" "${scene_folder}/*_pose.txt"
