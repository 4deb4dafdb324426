#!/bin/bash
# MixGRPO recipe — TPU counterpart of the reference launch script
# (zqqqqz2000/MixGRPO scripts/finetune/finetune_flux_grpo_MixGRPO.sh).
#
# Launch: run this same script on every TPU VM worker (e.g. via
# `gcloud compute tpus tpu-vm ssh ... --worker=all --command=...`);
# jax.distributed auto-initializes on TPU pods — no pdsh/torchrun,
# no NCCL/IB transport env tuning (collectives compile onto ICI/DCN).

set -euo pipefail

MODEL_PATH=${MODEL_PATH:-"./data/flux"}
DATA_DIR=${DATA_DIR:-"./data/rl_embeddings"}
OUTPUT_DIR=${OUTPUT_DIR:-"./out"}

# Mesh: weights + fp32 Adam state sharded over every chip (ZeRO-3 via the
# fsdp axis); the batch is data-parallel over the same axis
# (parallel/sharding.py::data_spec shards batch over dp AND fsdp), so
# fsdp=-1 is full data parallelism WITH sharded optimizer state.  Pure DP
# (--mesh_dp -1 --mesh_fsdp 1, the small-model default) would replicate
# ~144 GB of 12B fp32 AdamW state per chip and OOM on any TPU.
python -m mixgrpo_tpu.train \
  --data_json_path "${DATA_DIR}" \
  --pretrained_model_name_or_path "${MODEL_PATH}" \
  --output_dir "${OUTPUT_DIR}" \
  --experiment_name "mixgrpo" \
  --train_batch_size 1 \
  --num_generations 12 \
  --use_group \
  --init_same_noise \
  --sampling_steps 25 \
  --eta 0.7 \
  --shift 3 \
  --flow_grpo_sampling \
  --training_strategy part \
  --sample_strategy progressive \
  --iters_per_group 25 \
  --group_size 4 \
  --prog_overlap \
  --prog_overlap_step 1 \
  --roll_back \
  --h 720 --w 720 --t 1 \
  --learning_rate 1e-5 \
  --weight_decay 1e-4 \
  --max_grad_norm 1.0 \
  --gradient_accumulation_steps 3 \
  --gradient_checkpointing \
  --clip_range 1e-4 \
  --adv_clip_max 5.0 \
  --kl_coeff 0.0 \
  --advantage_rerange_strategy null \
  --reward_model multi_reward \
  --multi_reward_mix advantage_aggr \
  --hps_weight 1.0 --clip_score_weight 1.0 \
  --image_reward_weight 1.0 --pick_score_weight 1.0 \
  --max_train_steps 300 \
  --checkpointing_steps 50 \
  --seed 714 --sampler_seed 7144 \
  --mesh_dp 1 --mesh_fsdp -1 --mesh_sp 1 --mesh_tp 1 \
  "$@"
