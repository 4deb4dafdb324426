#!/usr/bin/env bash
# Round-3 follow-on campaign: update-MFU levers + update-path attention
# tuning.  Runs after run_round3_campaign.sh completes (chain via
# scripts/chain_campaign2.sh).  Same resumable contract.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-bench_results/round3}"
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

probe() {
  timeout 90 python -c 'import jax,jax.numpy as jnp; x=jnp.ones((256,256))@jnp.ones((256,256)); print(float(x.sum()))' >/dev/null 2>&1
}

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  if [ -s "$OUT/$name.json" ] && grep -q '"' "$OUT/$name.json" \
     && ! grep -q '"failed_phases": {' "$OUT/$name.json"; then
    log "=== $name: already measured, skipping"
    return 0
  fi
  probe || { log "tunnel wedged before $name; aborting (resumable)"; exit 1; }
  log "=== $name: $*"
  timeout "$t" "$@" >"$OUT/$name.json.tmp" 2>"$OUT/$name.err"
  local rc=$?
  if [ $rc -eq 0 ] && [ -s "$OUT/$name.json.tmp" ]; then
    mv "$OUT/$name.json.tmp" "$OUT/$name.json"
  else
    log "=== $name FAILED rc=$rc (stderr tail follows)"
    tail -c 400 "$OUT/$name.err" | tee -a "$OUT/campaign.log"
    rm -f "$OUT/$name.json.tmp"
  fi
  log "=== $name done rc=$rc"
  [ -f "$OUT/$name.json" ] && tail -c 600 "$OUT/$name.json" | tee -a "$OUT/campaign.log"
  return 0
}

# 0. serve-crash isolation probe (bf16 1024px sub-programs, hardest
#    first) + the bf16 serve retry with the VMEM-bounded auto block_k
run probe_serve_1024 2400 python scripts/probe_serve_crash.py
run serve_recipe 3600 python scripts/bench_serve.py --mode recipe

# 1. remat policy lever RESOLVED: checkpoint_dots at full (19,38) virtual
#    depth fails to compile (remote compile helper 500 — saving every dot
#    output across 57 block applications needs ~21 GB > HBM, so the
#    memory planner rejects it).  `full` remat (2.84 s / 4 pairs) is the
#    feasible full-depth policy; dots remains the right lever at real
#    resident depths (measured ~11% faster in the depth-(1,2) trainer).

# 2. update-path attention tuning: fwd+bwd block sweep at the 512px
#    joint length (S=1536) where the update spends its attention time.
run attn_sweep_1536 2400 python scripts/bench_attention.py \
    --seqs 1536 --block_q 256,512,1024 --block_k full,1024 --bwd

# 3. fixed-overhead probe: 2-pair update to separate per-pair cost from
#    per-call overhead (optimizer + weight-stack residency churn).
run update_full_512_p2 2400 python scripts/bench_e2e.py \
    --phases update --update_vd 19,38 --remat full --pairs 2


log "campaign2 complete"
