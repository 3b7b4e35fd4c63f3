#!/usr/bin/env bash
# 7-Scenes warm start / self-supervised reloc: one mapping round with MLP
# pose refinement on the (pseudo-)GT poses, then re-register everything.
set -euo pipefail

datasets_folder="${1:-datasets/7scenes_ace}"
out_folder="${2:-results/7scenes_warmstart}"
shift 2 2>/dev/null || true
scenes=("${@:-chess fire heads office pumpkin redkitchen stairs}")
[ $# -eq 0 ] && scenes=(chess fire heads office pumpkin redkitchen stairs)

for scene in "${scenes[@]}"; do
  scene_out_dir="${out_folder}/${scene}"
  mkdir -p "${scene_out_dir}"
  network_name="iteration0"

  ./train_ace.py "${datasets_folder}/${scene}/train/*.png" "${scene_out_dir}/${network_name}.pt" \
    --pose_files "${datasets_folder}/${scene}/train/*_pose.txt" \
    --use_external_focal_length 525 \
    --refine_calibration True \
    --pose_refinement mlp \
    --pose_refinement_wait 5000

  focal=$(awk '{if (NR==1) print $9}' "${scene_out_dir}/poses_${network_name}_preliminary.txt")
  ./register_mapping.py "${datasets_folder}/${scene}/train/*.png" "${scene_out_dir}/${network_name}.pt" \
    --use_external_focal_length "${focal}" \
    --session "${network_name}"

  cp "${scene_out_dir}/poses_${network_name}.txt" "${scene_out_dir}/poses_final.txt"
done
