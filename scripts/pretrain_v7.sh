#!/bin/bash
# Encoder pretraining provenance + the v7 recipe.
#
# The reference ships its encoder blob with no training recipe at all
# (/root/reference/ace_network.py:14-59 loads ace_encoder_pretrained.pt,
# listed in .MISSING_LARGE_BLOBS); this repo's encoders are reproducible
# from the procedural corpus in acezero_tpu/pretrain/.
#
# --- v6 (shipped weights/tpu_encoder_v6.pt, round 2) ---------------------
# Recipe class (reconstructed from the round-2 commit f4f7f9e and README —
# the exact argv was not recorded at the time, which is why THIS file now
# records every training invocation verbatim): 160-scene corpus, exact
# ray-cast supervision, adaptive-tau correspondence-contrastive loss at
# weight 0.2, best of 3 candidates by the encoder_eval probes:
#
#   ./pretrain_encoder.py weights/tpu_encoder_v6.pt \
#       --num_scenes 160 --steps 8000 --contrastive_weight 0.2 \
#       --texture_octaves_max 3 --candidates 3
#
# Measured (round 3, pretrain/encoder_eval.py): candidates 80.3 / 80.1 /
# 78.8% match@10cm on reserved held-out scenes (shipped v2: 52%).
#
# --- v7 (this round) -----------------------------------------------------
# Target: the ring/360 + photometric regimes (VERDICT round-3 item 5).
# Changes vs v6: ring-heavy camera mix (across_frac 0.5), photometric
# nuisances on, a texture-poor slice (low_texture_frac 0.25), steep-pitch
# views (pitch_frac 0.25), and wide-baseline contrastive pairs
# (far_pair_frac 0.5) so features stay matchable across ring-opposite
# views.
#
# STATUS: RUN IN ROUND 5 — MEASURED NEGATIVE RESULT. This exact
# invocation trained 3 candidates (~35 min total on one v5e chip with the
# round-5 pipeline) and ALL of them scored far below the shipped v6 on
# the held-out probes: match@10cm 57.5 / 50.1 / 55.4% (v6: 80.3%) with
# the short scene-map fit collapsed to ~0.6% inl10 (median ~300 px). The
# ring-heavy corpus as specified (far_pair_frac 0.5 + pitch_frac 0.25 +
# low_texture_frac 0.25 at the same 8k-step budget) DEGRADES the encoder;
# the weights were therefore NOT shipped and v6 remains the default.
# Suspected cause: the 0.5 far-pair contrastive fraction dominates the
# objective and destroys feature locality — a smaller fraction or a
# longer budget is the next thing to try, not this recipe.

set -ex
cd "$(dirname "$0")/.."

./pretrain_encoder.py weights/tpu_encoder_v7.pt \
    --num_scenes 160 \
    --views_per_scene 24 \
    --steps 8000 \
    --batch_images 8 \
    --seed 42 \
    --contrastive_weight 0.2 \
    --texture_octaves_max 3 \
    --across_frac 0.5 \
    --photometric \
    --low_texture_frac 0.25 \
    --pitch_frac 0.25 \
    --far_pair_frac 0.5 \
    --candidates 3
