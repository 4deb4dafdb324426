#!/usr/bin/env bash
# Round-4 on-chip measurement campaign (VERDICT r3 items 1-5).
# Resumable and wedge-tolerant like round 3's: phases with a result JSON
# are skipped; a phase failing 3 times is abandoned; the tunnel is probed
# between phases and the campaign exits 1 when it wedges (relaunch later
# — only remaining phases run).  NEW in round 4 (verdict item 1):
#   - every bench uses validated (0,n,2n) timing (utils/timing.py) — no
#     negative rows can be recorded;
#   - bench.py is self-supervising (child process + retry/backoff);
#   - the campaign ENDS with a device health phase so a worker killed by
#     the run is detected now, not at the driver's harvest.
#
#   bash scripts/run_round4_campaign.sh [results_dir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-bench_results/round4}"
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

probe() {
  timeout 150 python -c 'from mixgrpo_tpu.utils.timing import backend_smoke; print(backend_smoke())' >/dev/null 2>&1
}

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  if [ -s "$OUT/$name.json" ] && grep -q '"' "$OUT/$name.json" \
     && ! grep -q '"failed_phases": {' "$OUT/$name.json"; then
    log "=== $name: already measured, skipping"
    return 0
  fi
  local fails=0
  [ -f "$OUT/$name.fails" ] && fails=$(cat "$OUT/$name.fails")
  if [ "$fails" -ge 3 ]; then
    log "=== $name: abandoned after $fails failures"
    return 0
  fi
  probe || { log "tunnel wedged before $name; aborting (resumable)"; exit 1; }
  log "=== $name: $*"
  timeout "$t" "$@" >"$OUT/$name.json.tmp" 2>"$OUT/$name.err"
  local rc=$?
  if [ $rc -eq 0 ] && [ -s "$OUT/$name.json.tmp" ] \
     && ! grep -q '"failed_phases": {' "$OUT/$name.json.tmp" \
     && ! grep -q '"valid": false' "$OUT/$name.json.tmp"; then
    mv "$OUT/$name.json.tmp" "$OUT/$name.json"
    rm -f "$OUT/$name.fails"
  else
    echo $((fails + 1)) > "$OUT/$name.fails"
    log "=== $name FAILED rc=$rc fail#$((fails + 1)) (stderr tail follows)"
    tail -c 400 "$OUT/$name.err" | tee -a "$OUT/campaign.log"
    rm -f "$OUT/$name.json.tmp"
  fi
  log "=== $name done rc=$rc"
  [ -f "$OUT/$name.json" ] && tail -c 600 "$OUT/$name.json" | tee -a "$OUT/campaign.log"
  return 0
}

# --- item 1: the scoreboard, first and with the supervisor's own retries
run headline 5400 python bench.py

# --- item 2: 720px fusion-gap attribution (profiles land in $OUT/prof*)
run prof_fwd_512 2400 python scripts/profile_forward.py --height 512 \
    --phase forward --out "$OUT/prof512_fwd" --analyze
run prof_fwd_720 2400 python scripts/profile_forward.py --height 720 \
    --phase forward --out "$OUT/prof720_fwd" --analyze
# ragged control: how much does pad_seq itself buy end-to-end now
run prof_fwd_720_ragged 2400 python scripts/profile_forward.py --height 720 \
    --phase forward --pad_seq 0 --out "$OUT/prof720_ragged" --analyze

# --- item 3: update-phase MFU levers
run prof_upd_512 3000 python scripts/profile_forward.py --height 512 \
    --phase update --out "$OUT/prof512_upd" --analyze
run update_full_512 2400 python scripts/bench_e2e.py \
    --phases update --update_vd 19,38 --remat full --pairs 4
run update_full_720 2400 python scripts/bench_e2e.py --height 720 \
    --phases update --update_vd 19,38 --remat full --pairs 4

# --- rollout re-captures at the recipe shapes (comparability after any
#     model changes this round)
run rollout_512 2400 python scripts/bench_e2e.py --phases rollout
run rollout_720 2400 python scripts/bench_e2e.py --height 720 --phases rollout

# --- item 4: latency serving tier (p50 at concurrency 1 ~= 1x image)
run serve_toy 2400 python scripts/bench_serve.py --mode toy
run serve_recipe 5400 python scripts/bench_serve.py --mode recipe
run serve_recipe_int8 5400 python scripts/bench_serve.py --mode recipe --quant int8

# --- item 5: attention sweep re-run under validated timing (the round-3
#     negative-slope row must be impossible now)
run attn_sweep 2400 python scripts/bench_attention.py \
    --seqs 2537,2560 --block_q 512 --block_k full --bwd

# --- final device health check (verdict item 1c): a campaign that killed
#     the worker must fail HERE
run device_health 300 python -c "
from mixgrpo_tpu.utils.timing import backend_smoke
import json; print(json.dumps({'metric': 'device_health', 'smoke_s': round(backend_smoke(), 2)}))"

log "campaign complete"
