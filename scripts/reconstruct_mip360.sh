#!/usr/bin/env bash
# Reconstruct Mip-NeRF 360 scenes: unknown focal -> heuristic guess +
# calibration refinement (the refine_calibration path).
set -euo pipefail

datasets_folder="${1:-datasets/mip360}"
out_folder="${2:-results/mip360}"
shift 2 2>/dev/null || true
scenes=("${@:-bicycle bonsai counter garden kitchen room stump}")
[ $# -eq 0 ] && scenes=(bicycle bonsai counter garden kitchen room stump)

for scene in "${scenes[@]}"; do
  scene_out_dir="${out_folder}/${scene}"
  mkdir -p "${scene_out_dir}"
  ./ace_zero.py "${datasets_folder}/${scene}/images/*.JPG" "${scene_out_dir}" \
    --try_seeds 5 \
    2>&1 | tee "${scene_out_dir}/log_${scene}.txt"

  ./eval_poses.py "${scene_out_dir}/poses_final.txt" \
    "${datasets_folder}/${scene}/images/*_pose.txt" \
    2>&1 | tee "${scene_out_dir}/eval_${scene}.txt"
done
