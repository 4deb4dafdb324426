#!/usr/bin/env bash
# Wait for the round-3 main campaign to finish, then run the follow-on
# lever campaign.  Resilient to session restarts: poll the campaign log.
cd "$(dirname "$0")/.."
OUT="${1:-bench_results/round3}"
for i in $(seq 1 400); do
  if grep -q "^\[..:..:..\] campaign complete" "$OUT/campaign.log" 2>/dev/null; then
    echo "[chain] main campaign complete; launching campaign2"
    # same watchdog discipline: retry on tunnel wedge
    for j in $(seq 1 60); do
      bash scripts/run_round3_campaign2.sh "$OUT" && exit 0
      echo "[chain] campaign2 aborted (wedge); retry $j after 200s"
      sleep 200
    done
    exit 1
  fi
  sleep 60
done
echo "[chain] gave up waiting for main campaign"
