#!/bin/bash
# Prompt-embedding preprocessing (reference
# scripts/preprocess/preprocess_flux_rl_embeddings.sh).
set -euo pipefail
MODEL_PATH=${MODEL_PATH:-"./data/flux"}
python -m mixgrpo_tpu.preprocess \
  --model_path "${MODEL_PATH}" \
  --prompt_dir "./data/prompts.txt" \
  --output_dir "./data/rl_embeddings" \
  --batch_size 8 \
  "$@"
