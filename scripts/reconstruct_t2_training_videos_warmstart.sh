#!/usr/bin/env bash
# T2 video warm start: map COLMAP-posed stills first (no refinement), then
# seed the video reconstruction with that network, focal halved for 540p.
set -euo pipefail

datasets_folder="${1:-datasets/t2}"
out_folder="${2:-results/t2_videos_warmstart}"
shift 2 2>/dev/null || true
scenes=("${@:-Barn Caterpillar Church Courthouse Ignatius Meetingroom Truck}")
[ $# -eq 0 ] && scenes=(Barn Caterpillar Church Courthouse Ignatius Meetingroom Truck)

for scene in "${scenes[@]}"; do
  scene_out_dir="${out_folder}/${scene}"
  mkdir -p "${scene_out_dir}"
  focal=$(cat "${datasets_folder}/${scene}/focal_length.txt")
  network_name="iteration0_seed0"

  # ACE mapping on the COLMAP-posed stills; trust COLMAP (no refinement)
  ./train_ace.py "${datasets_folder}/${scene}/*.jpg" "${scene_out_dir}/${network_name}.pt" \
    --pose_files "${datasets_folder}/${scene}/*_pose.txt" \
    --use_external_focal_length "${focal}" \
    2>&1 | tee "${scene_out_dir}/log_${scene}_init.txt"

  # video frames are 540p: half the COLMAP focal
  video_focal=$(python3 -c "print(${focal}/2)")
  ./ace_zero.py "${datasets_folder}/video_${scene}/*.jpg" "${scene_out_dir}" \
    --seed_network "${scene_out_dir}/${network_name}.pt" \
    --use_external_focal_length "${video_focal}" \
    --refine_calibration False \
    2>&1 | tee "${scene_out_dir}/log_${scene}.txt"
done
