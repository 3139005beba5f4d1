#!/usr/bin/env bash
# Round-5 on-chip queue, phase 1: the jobs that need no new code, in
# VERDICT-r4 priority order — the single-view inverse CONTROL (weak #5),
# and the two new zoo chains (missing #2/#3: ad + exp). Each job is
# idempotent (done-files written only when every constituent rc is 0, the
# ADVICE-r4 fix), probes the TPU before starting, and auto-commits its
# artifacts pathspec-limited. Phase 2 (stream profile/bench rerun, bighbm,
# final bench) ships as chipq_r5b.sh once the round-5 fixes land.
# Run:  nohup setsid bash benchmarks/chipq_r5.sh >> benchmarks/results/r5/queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
R=benchmarks/results/r5
mkdir -p "$R"
PY=python

log() { echo "[chipq $(date +%H:%M:%S)] $*"; }

harvest() {
  git add "$R" data/Zoo >/dev/null 2>&1
  git commit -q -m "Record on-chip round-5 queue artifacts (auto-harvest)" \
    -- "$R" data/Zoo >/dev/null 2>&1 || true
}

probe() { # wait up to $1 minutes for the TPU pool
  local i
  for i in $(seq 1 "$1"); do
    if timeout 120 $PY -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16); (x @ x).block_until_ready()" \
      >/dev/null 2>&1; then return 0; fi
    sleep 55
  done
  return 1
}

train_loop() { # $1 total-seconds, rest = cli.run args; honors 114/115 reruns
  local budget=$1; shift
  local end=$(( $(date +%s) + budget )) n=0 left rc
  while :; do
    n=$((n + 1))
    left=$(( end - $(date +%s) ))
    if [ "$left" -le 60 ]; then
      log "train_loop budget exhausted after ${budget}s (partial schedule)"
      return 124
    fi
    RENI_TPU_HANG_EXIT_S=1200 RENI_TPU_MAX_SCAN_STEPS=300 \
      timeout "$left" $PY -m reni_tpu.cli.run "$@" --retries 6
    rc=$?
    log "train_loop attempt $n rc=$rc"
    if [ $rc -ne 114 ] && [ $rc -ne 115 ]; then return $rc; fi
    [ $n -ge 10 ] && return 99
    probe 10 || return 98
  done
}

newest() { # newest checkpoint file matching $1 under $2
  find "$2" -name "$1" -printf '%T@ %p\n' 2>/dev/null | sort -n | tail -1 | cut -d' ' -f2-
}

# ---- 1. single-view teapot control (VERDICT r4 weak #5 / next #4) ----
# Train rc and eval rc are tracked separately and BOTH must be 0 before
# the done-file is written (ADVICE r4: the r4 queue let a stale
# checkpoint's eval overwrite a failed train's rc).
if [ ! -f "$R/inverse_sv.done" ]; then
  probe 15 || { log "TPU gone before inverse_sv"; exit 1; }
  log "START inverse_sv"
  if [ ! -d /tmp/reni_zoo_data/Test ]; then
    $PY examples/make_synthetic_dataset.py --out /tmp/reni_zoo_data \
      --train 1000 --test 21 --width 128 --seed 1 >> "$R/inverse_sv.log" 2>&1
  fi
  train_loop 4200 --cfg_path benchmarks/cfg_r4/inverse_sv.yaml >> "$R/inverse_sv.log" 2>&1
  train_rc=$?
  eval_rc=1
  if [ $train_rc -eq 0 ]; then
    ck=$(newest "fit_inverse_final.npz" /tmp/reni_r4_inv_sv_runs)
    if [ -n "$ck" ]; then
      timeout 1200 $PY -m reni_tpu.cli.evaluate --checkpoint "${ck%.npz}" \
        --cfg_path benchmarks/cfg_r4/inverse_sv.yaml \
        > "$R/inverse_sv_eval.json" 2>> "$R/inverse_sv.log"
      eval_rc=$?
    fi
  fi
  log "DONE inverse_sv train_rc=$train_rc eval_rc=$eval_rc"
  [ $train_rc -eq 0 ] && [ $eval_rc -eq 0 ] && touch "$R/inverse_sv.done"
  harvest
fi

# ---- 2. non-variational (ad) zoo entry (VERDICT r4 missing #2) ----
if [ ! -f "$R/zoo_ad.done" ]; then
  probe 15 || { log "TPU gone before zoo_ad"; exit 1; }
  log "START zoo_ad"
  RENI_TPU_HANG_EXIT_S=1200 timeout 9000 $PY examples/make_zoo.py \
    --work /tmp/reni_zoo5 \
    --entries latent_dim_49_net_5_256_ad_cbc_tanh_hdr \
    >> "$R/zoo_ad.log" 2>&1
  rc=$?
  log "DONE zoo_ad rc=$rc"
  [ $rc -eq 0 ] && touch "$R/zoo_ad.done"
  harvest
fi

# ---- 3. exp-activation zoo chain (VERDICT r4 missing #3) ----
if [ ! -f "$R/zoo_exp.done" ]; then
  probe 15 || { log "TPU gone before zoo_exp"; exit 1; }
  log "START zoo_exp"
  RENI_TPU_HANG_EXIT_S=1200 timeout 9000 $PY examples/make_zoo.py \
    --work /tmp/reni_zoo5 \
    --entries latent_dim_49_net_5_256_vad_cbc_exp_hdr \
    >> "$R/zoo_exp.log" 2>&1
  rc=$?
  log "DONE zoo_exp rc=$rc"
  [ $rc -eq 0 ] && touch "$R/zoo_exp.done"
  harvest
fi

log "phase-1 queue complete"
harvest
