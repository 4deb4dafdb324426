#!/bin/bash
# MixGRPO-Flash: DPM-Solver++ order-2 midpoint compresses the post-window
# ODE tail (reference ..._Flash.sh: dpm_algorithm_type=dpmsolver++,
# iters_per_group 20, compress ratio 0.4).
set -euo pipefail
DIR="$(dirname "$0")"
exec "${DIR}/finetune_flux_grpo_MixGRPO.sh" \
  --experiment_name "mixgrpo_flash" \
  --iters_per_group 20 \
  --dpm_algorithm_type dpmsolver++ \
  --dpm_apply_strategy post \
  --dpm_solver_order 2 \
  --dpm_solver_type midpoint \
  --dpm_post_compress_ratio 0.4 \
  "$@"
