#!/bin/bash
# MixGRPO-Flash* : Flash with no window overlap and ratio 0.2
# (reference ..._Flash*.sh diff: prog_overlap_step=0, compress 0.2).
set -euo pipefail
DIR="$(dirname "$0")"
exec "${DIR}/finetune_flux_grpo_MixGRPO_Flash.sh" \
  --experiment_name "mixgrpo_flash_star" \
  --prog_overlap_step 0 \
  --dpm_post_compress_ratio 0.2 \
  "$@"
