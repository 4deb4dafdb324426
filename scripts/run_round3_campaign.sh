#!/usr/bin/env bash
# Round-3 on-chip measurement campaign (VERDICT r2 items 1, 3, 8, 9).
# Resumable: phases whose .json already contains a result are skipped, so
# the tunnel watchdog can relaunch after a mid-campaign wedge and only the
# remaining phases run.  Probes the tunnel between phases and exits 1 when
# it wedges (the watchdog retries later).  Phases that fail 3 times are
# abandoned (counter in $OUT/<name>.fails) so one bad phase cannot starve
# the rest of the campaign.
#
#   bash scripts/run_round3_campaign.sh [results_dir]
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
     && ! grep -q '"failed_phases": {' "$OUT/$name.json.tmp"; then
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

# Ordered by VERDICT priority; the flaky reward phases go LAST so their
# remote-compile broken pipes cannot starve the pad/serve/trace phases.

run headline 1200 python bench.py

run update_full_512 2400 python scripts/bench_e2e.py \
    --phases update --update_vd 19,38 --remat full --pairs 4
run rollout_720 2400 python scripts/bench_e2e.py --height 720 --phases rollout
run update_full_512_p8 2400 python scripts/bench_e2e.py \
    --phases update --update_vd 19,38 --remat full --pairs 8
run update_full_720 2400 python scripts/bench_e2e.py --height 720 \
    --phases update --update_vd 19,38 --remat full --pairs 4
run e2e_512 3000 python scripts/bench_e2e.py --update_vd 19,38 --remat full
run e2e_720 3000 python scripts/bench_e2e.py --height 720 \
    --update_vd 19,38 --remat full

# model-level sequence alignment (pad_seq_multiple): re-measure the
# 720px rollout + update with the joint sequence padded 2537->2560
# (attn_sweep showed 2.1x faster attention at the aligned length)
run rollout_720_pad 2400 python scripts/bench_e2e.py --height 720 --phases rollout
run update_full_720_pad 2400 python scripts/bench_e2e.py --height 720 \
    --phases update --update_vd 19,38 --remat full --pairs 4

run attn_sweep 2400 python scripts/bench_attention.py \
    --seqs 2537,2560 --block_q 512 --block_k full --bwd

# serving at the reference inference recipe shape (item 8)
run serve_recipe 3600 python scripts/bench_serve.py --mode recipe
run serve_recipe_int8 3600 python scripts/bench_serve.py --mode recipe --quant int8

# 50-iteration production-loop trace (item 9)
run train_trace 5400 python scripts/train_trace_tpu.py --iters 50

# bf16 serve crash isolation (4 crashes; int8 passes, chunked-attention
# fix did NOT help): run the suspect sub-programs standalone
run probe_serve_1024 2400 python scripts/probe_serve_crash.py

run probe_serve2_1024 3600 python scripts/probe_serve_crash2.py

# reward phases: repeatedly lost to remote-compile broken pipes; tried
# last with a bounded retry budget
run reward_512 1800 python scripts/bench_e2e.py --phases reward
run reward_720 1800 python scripts/bench_e2e.py --height 720 --phases reward

log "campaign complete"
