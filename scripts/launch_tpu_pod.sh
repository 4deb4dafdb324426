#!/bin/bash
# L0 cluster launch — TPU counterpart of the reference's pdsh fan-out
# (zqqqqz2000/MixGRPO scripts/finetune/finetune_flux_grpo_MixGRPO.sh:89-120
# pdsh -R ssh -w ^hostfile "torchrun --nnodes 4 --nproc_per_node 8 ...").
#
# On TPU pods there is no rank bookkeeping: every worker runs the SAME
# command; jax.distributed discovers coordinator/world from the TPU
# metadata.  This wrapper fans a repo sync + command out to all workers of
# a TPU VM pod slice with gcloud (the pdsh/hostfile/INDEX_CUSTOM layer and
# the NCCL/IB env tuning have no equivalent here).
#
# Usage:
#   scripts/launch_tpu_pod.sh <tpu-name> <zone> scripts/finetune/finetune_flux_grpo_MixGRPO.sh
#   TPU_SSH_EXTRA="--tunnel-through-iap" scripts/launch_tpu_pod.sh ...
set -euo pipefail

TPU_NAME=${1:?usage: launch_tpu_pod.sh <tpu-name> <zone> <script> [args...]}
ZONE=${2:?zone required}
SCRIPT=${3:?script required}
shift 3

REMOTE_DIR=${REMOTE_DIR:-"~/mixgrpo_tpu"}
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"

echo "[launch] syncing ${REPO_ROOT} -> ${TPU_NAME}:${REMOTE_DIR} (all workers)"
# remove any stale copy first: scp -r into an EXISTING dir would nest the
# local basename inside it; into a missing path it creates REMOTE_DIR
# itself, regardless of the local checkout's name
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --worker=all --zone="${ZONE}" \
  ${TPU_SSH_EXTRA:-} --command="rm -rf ${REMOTE_DIR}"
gcloud compute tpus tpu-vm scp --recurse --worker=all --zone="${ZONE}" \
  ${TPU_SSH_EXTRA:-} \
  "${REPO_ROOT}" "${TPU_NAME}:${REMOTE_DIR}"

echo "[launch] running ${SCRIPT} on all workers"
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --worker=all --zone="${ZONE}" \
  ${TPU_SSH_EXTRA:-} \
  --command="cd ${REMOTE_DIR} && pip install -q -e . && bash ${SCRIPT} $*"
