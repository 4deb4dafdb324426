#!/bin/bash
# Mixed-model inference (reference scripts/inference/inference_flux.sh:
# 50 steps @1024^2, tuned transformer for the first 30 steps).
set -euo pipefail
MODEL_PATH=${MODEL_PATH:-"./data/flux"}
CKPT=${CKPT:-"./out/part_mixgrpo/export_300/diffusion_pytorch_model.safetensors"}
python -m mixgrpo_tpu.sample \
  --model_path "${MODEL_PATH}" \
  --new_model_ckpt "${CKPT}" \
  --prompt_path "./data/prompts_test.txt" \
  --output_dir "./out/inference" \
  --h 1024 --w 1024 \
  --sampling_steps 50 \
  --mix_sampling_steps 30 \
  --guidance_scale 3.5 \
  --seed 42 \
  "$@"
