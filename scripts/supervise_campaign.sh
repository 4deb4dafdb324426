#!/usr/bin/env bash
# Keep re-running the resumable round-3 campaign until it logs
# completion.  The axon tunnel wedges intermittently (campaign aborts
# between phases by design); measured phases are skipped on re-entry, so
# each retry only pays for what is still missing.  campaign2 is chained
# separately (scripts/chain_campaign2.sh polls for the completion line).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-bench_results/round3}"
for i in $(seq 1 200); do
  if grep -q "campaign complete" "$OUT/campaign.log" 2>/dev/null; then
    echo "[supervise] main campaign complete"
    exit 0
  fi
  bash scripts/run_round3_campaign.sh "$OUT" && exit 0
  echo "[supervise] campaign aborted (attempt $i); sleeping 180s"
  sleep 180
done
echo "[supervise] gave up after 200 attempts"
exit 1
