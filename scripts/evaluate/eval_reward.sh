#!/bin/bash
# Reward evaluation over generated images (reference
# scripts/evaluate/eval_reward.sh).
set -euo pipefail
python -m mixgrpo_tpu.eval_rewards \
  --metadata "./out/inference" \
  --image_dir "./out/inference" \
  --output_dir "./out/eval" \
  --reward_model all \
  --batch_size 8 \
  "$@"
