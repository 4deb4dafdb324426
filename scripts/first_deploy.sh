#!/bin/bash
# First-deployment checklist (VERDICT r3 item 9) — one command that turns
# the two environment-blocked validation items into a routine procedure on
# any box that HAS the released checkpoints:
#
#   1. verify-weights: record golden fingerprints on first run, check
#      against the committed goldens on every later run (loader parity —
#      catches name-mapping/activation bugs before they reach training);
#   2. preprocess: encode a handful of prompts with the real T5/CLIP;
#   3. smoke train: 3 real GRPO steps (rollout -> reward -> PPO update ->
#      checkpoint) at a small geometry;
#   4. serve: boot the inference server, generate ONE image over HTTP,
#      assert a non-trivial PNG comes back.
#
# Usage:
#   CKPT_ROOT=/path/to/ckpts ./scripts/first_deploy.sh [workdir]
#
# Expected checkpoint layout under $CKPT_ROOT (reference names,
# README.md / PERF.md "Real-checkpoint parity procedure"):
#   flux-dev/{transformer,vae,text_encoder,text_encoder_2,tokenizer}
#   HPS_v2.1_compressed.pt   PickScore_v1/   ImageReward.pt  med_config.json
#   DFN5B-CLIP-ViT-H-14-384.bin
# Optional: hunyuan-video-t2v-720p/vae, llava-llama-3-8b-text,
#   mochi-1-preview/{transformer,vae}
#
# Toggles: SKIP_VERIFY=1 SKIP_PREPROCESS=1 SKIP_TRAIN=1 SKIP_SERVE=1
set -euo pipefail

CKPT_ROOT=${CKPT_ROOT:?set CKPT_ROOT to the released-checkpoint directory}
WORK=${1:-./first_deploy_work}
FLUX="${CKPT_ROOT}/flux-dev"
GOLDENS=${GOLDENS:-goldens_real.npz}
PORT=${PORT:-8321}
mkdir -p "${WORK}"

# console scripts exist only after `pip install -e .`; fall back to module
# execution so the procedure also runs from a bare checkout (round-5
# rehearsal finding)
cmd() {  # cmd <console-script> <module>
  if command -v "$1" >/dev/null 2>&1; then echo "$1"
  else echo "python -m $2"; fi
}
VERIFY_CMD=$(cmd mixgrpo-verify-weights mixgrpo_tpu.verify_weights)
PREPROCESS_CMD=$(cmd mixgrpo-preprocess mixgrpo_tpu.preprocess)
SERVE_CMD=$(cmd mixgrpo-serve mixgrpo_tpu.serve)

# the FLUX HF layout ships the CLIP BPE table the reward tokenizers need
# (round-5 rehearsal finding: unset CLIP_BPE_PATH crashed the HPS scorer)
export CLIP_BPE_PATH=${CLIP_BPE_PATH:-${FLUX}/tokenizer/merges.txt}

say() { echo; echo "== first_deploy: $*"; }

opt_flag() {  # opt_flag <flag> <path> -> emits "<flag> <path>" if it exists
  [ -e "$2" ] && echo "$1 $2" || true
}

# ---------------------------------------------------------------- 1. weights
if [ "${SKIP_VERIFY:-0}" != "1" ]; then
  # checking is the CLI default; --record is the only mode flag
  # (round-5 rehearsal finding: a literal --check was rejected)
  MODE=
  [ -f "${GOLDENS}" ] || MODE=--record
  say "verify-weights ${MODE:-check} (goldens: ${GOLDENS})"
  # shellcheck disable=SC2046
  ${VERIFY_CMD} ${MODE} --goldens "${GOLDENS}" \
    --flux "${FLUX}/transformer" --flux-depth "${FLUX_DEPTH:-4,8}" \
    --flux-vae "${FLUX}/vae" \
    --t5 "${FLUX}/text_encoder_2" \
    --clip-l "${FLUX}/text_encoder" \
    $(opt_flag --hps "${CKPT_ROOT}/HPS_v2.1_compressed.pt") \
    $(opt_flag --pick-score "${CKPT_ROOT}/PickScore_v1") \
    $(opt_flag --clip-score "${CKPT_ROOT}/DFN5B-CLIP-ViT-H-14-384.bin") \
    $(opt_flag --image-reward "${CKPT_ROOT}/ImageReward.pt") \
    $(opt_flag --image-reward-med-config "${CKPT_ROOT}/med_config.json") \
    $(opt_flag --hunyuan-vae "${CKPT_ROOT}/hunyuan-video-t2v-720p/vae") \
    $(opt_flag --hunyuan-llm "${CKPT_ROOT}/llava-llama-3-8b-text") \
    $(opt_flag --mochi "${CKPT_ROOT}/mochi-1-preview/transformer") \
    $(opt_flag --mochi-vae "${CKPT_ROOT}/mochi-1-preview/vae")
  if [ "${MODE}" = "--record" ]; then
    echo "recorded ${GOLDENS} — commit it so every later environment checks"
  fi
fi

# ------------------------------------------------------------ 2. preprocess
EMB="${WORK}/rl_embeddings"
if [ "${SKIP_PREPROCESS:-0}" != "1" ]; then
  say "preprocess 4 prompts with the real T5-XXL/CLIP-L"
  PROMPTS="${WORK}/prompts"
  mkdir -p "${PROMPTS}"
  printf '%s\n' \
    "a photo of a corgi wearing sunglasses on a beach" \
    "an oil painting of a lighthouse in a storm" \
    "a macro shot of a dew-covered spider web at dawn" \
    "a futuristic city skyline at night, neon reflections" \
    > "${PROMPTS}/prompts.txt"
  ${PREPROCESS_CMD} --prompt_dir "${PROMPTS}" --output_dir "${EMB}" \
    --model_path "${FLUX}" --batch_size 4
fi

# ------------------------------------------------------------ 3. smoke train
if [ "${SKIP_TRAIN:-0}" != "1" ]; then
  say "3-step smoke train (small geometry, real weights + HPS reward)"
  python -m mixgrpo_tpu.train \
    --data_json_path "${EMB}" \
    --pretrained_model_name_or_path "${FLUX}" \
    --output_dir "${WORK}/smoke_train" \
    --experiment_name first_deploy_smoke \
    --train_batch_size 1 --num_generations 2 --use_group --init_same_noise \
    --sampling_steps 8 --eta 0.7 --shift 3 --flow_grpo_sampling \
    --training_strategy part --sample_strategy progressive \
    --iters_per_group 2 --group_size 2 --roll_back \
    --h 512 --w 512 --t 1 \
    --learning_rate 1e-5 --gradient_accumulation_steps 1 \
    --gradient_checkpointing \
    --reward_model hpsv2 --hps_path "${CKPT_ROOT}/HPS_v2.1_compressed.pt" \
    --hps_clip_path "${CKPT_ROOT}/open_clip_pytorch_model.bin" \
    --max_train_steps 3 --checkpointing_steps 3 \
    --seed 714 --sampler_seed 7144 \
    --mesh_dp 1 --mesh_fsdp -1 --mesh_sp 1 --mesh_tp 1
  test -d "${WORK}/smoke_train" || { echo "smoke train left no output"; exit 1; }
fi

# ----------------------------------------------------------------- 4. serve
if [ "${SKIP_SERVE:-0}" != "1" ]; then
  say "serve one image over HTTP (:${PORT})"
  ${SERVE_CMD} --model_path "${FLUX}" --port "${PORT}" \
    --batch_size 1 --height 512 --width 512 --num_steps 8 \
    --max_steps_per_call 8 &
  SERVE_PID=$!
  trap 'kill ${SERVE_PID} 2>/dev/null || true' EXIT
  for i in $(seq 1 180); do   # server compiles before first /healthz
    curl -sf "http://127.0.0.1:${PORT}/healthz" >/dev/null 2>&1 && break
    sleep 5
  done
  curl -sf -X POST "http://127.0.0.1:${PORT}/generate" \
    -d '{"prompt": "a photo of a corgi wearing sunglasses", "seed": 7}' \
    -o "${WORK}/first_image.png" --max-time 900
  PNG_SIZE=$(stat -c%s "${WORK}/first_image.png")
  [ "${PNG_SIZE}" -gt 10000 ] || { echo "suspiciously small PNG"; exit 1; }
  kill ${SERVE_PID} 2>/dev/null || true
  trap - EXIT
  echo "wrote ${WORK}/first_image.png (${PNG_SIZE} bytes) — eyeball it"
fi

say "ALL CHECKS PASSED"
echo "next: full recipe via scripts/finetune/finetune_flux_grpo_MixGRPO.sh"
echo "      (BASELINE.md north star: HPDv2 reward-curve parity at v5p-32)"
