#!/bin/bash
# DanceGRPO baseline: every timestep SDE, train a random 60% subset
# (reference "all" strategy, timestep_fraction 0.6).
set -euo pipefail
DIR="$(dirname "$0")"
exec "${DIR}/finetune_flux_grpo_MixGRPO.sh" \
  --experiment_name "dancegrpo" \
  --training_strategy all \
  --timestep_fraction 0.6 \
  "$@"
