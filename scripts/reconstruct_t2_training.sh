#!/usr/bin/env bash
# Reconstruct Tanks & Temples training scenes from still images.
set -euo pipefail

datasets_folder="${1:-datasets/t2}"
out_folder="${2:-results/t2_training}"
shift 2 2>/dev/null || true
scenes=("${@:-Barn Caterpillar Church Courthouse Ignatius Meetingroom Truck}")
[ $# -eq 0 ] && scenes=(Barn Caterpillar Church Courthouse Ignatius Meetingroom Truck)

for scene in "${scenes[@]}"; do
  scene_out_dir="${out_folder}/${scene}"
  mkdir -p "${scene_out_dir}"
  focal=$(cat "${datasets_folder}/${scene}/focal_length.txt" 2>/dev/null || echo "-1")
  ./ace_zero.py "${datasets_folder}/${scene}/*.jpg" "${scene_out_dir}" \
    --try_seeds 5 \
    --use_external_focal_length "${focal}" \
    2>&1 | tee "${scene_out_dir}/log_${scene}.txt"
done
