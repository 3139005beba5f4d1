#!/usr/bin/env bash
# Round-5 queue, phase 3: the EXTENDED beyond-HBM chain (120 epochs) —
# a production exercise of RENI_TPU_RSS_EXIT_GB planned restarts (the
# ~215 GB of transfers cross the 60 GB bound repeatedly) plus a better
# prior than the 45-epoch completion run.
# Run:  nohup setsid bash benchmarks/chipq_r5c.sh >> benchmarks/results/r5/queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
R=benchmarks/results/r5
mkdir -p "$R"
PY=python
log() { echo "[chipq $(date +%H:%M:%S)] $*"; }
harvest() {
  git add "$R" >/dev/null 2>&1
  git commit -q -m "Record on-chip round-5 queue artifacts (auto-harvest)" -- "$R" >/dev/null 2>&1 || true
}
probe() {
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
train_loop() {
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
      RENI_TPU_CKPT_WALL_S=300 RENI_TPU_RSS_EXIT_GB=60 \
      timeout "$left" $PY -m reni_tpu.cli.run "$@" --retries 6
    rc=$?
    log "train_loop attempt $n rc=$rc"
    if [ $rc -ne 114 ] && [ $rc -ne 115 ]; then return $rc; fi
    [ $n -ge 20 ] && return 99
    probe 10 || return 98
  done
}
newest() {
  find "$2" -name "$1" -printf '%T@ %p\n' 2>/dev/null | sort -n | tail -1 | cut -d' ' -f2-
}
rss_watch() {
  while [ -f /tmp/reni_r5c_bighbm.running ]; do
    ps -eo rss,comm | awk '/python/ {if ($1 > m) m = $1} END {print strftime("%H:%M:%S"), m/1048576, "GB"}' >> "$R/bighbm_ext_rss.log"
    sleep 60
  done
}
if [ ! -f "$R/bighbm_ext.done" ]; then
  probe 15 || { log "TPU gone before bighbm_ext"; exit 1; }
  [ -f /tmp/reni_r4_bighbm/.staged ] || { log "dataset missing"; exit 1; }
  log "START bighbm_ext (120 epochs, bf16, RSS_EXIT_GB=60)"
  touch /tmp/reni_r5c_bighbm.running
  rss_watch &
  t0=$(date +%s)
  train_loop 16200 --cfg_path benchmarks/cfg_r5_bighbm_ext.yaml >> "$R/bighbm_ext.log" 2>&1
  train_rc=$?
  t1=$(date +%s)
  rm -f /tmp/reni_r5c_bighbm.running
  echo "{\"bighbm_ext_wall_s\": $((t1 - t0)), \"train_rc\": $train_rc}" >> "$R/bighbm_ext_wall.json"
  eval_rc=1
  if [ $train_rc -eq 0 ]; then
    ck=$(newest "fit_latent_final.npz" /tmp/reni_r5_bighbm_ext_runs)
    if [ -n "$ck" ]; then
      timeout 2400 $PY -m reni_tpu.cli.evaluate --checkpoint "${ck%.npz}" \
        --cfg_path benchmarks/cfg_r5_bighbm_ext.yaml --resolution 256 512 \
        > "$R/bighbm_ext_eval.json" 2>> "$R/bighbm_ext.log"
      eval_rc=$?
    fi
  fi
  log "DONE bighbm_ext train_rc=$train_rc eval_rc=$eval_rc"
  [ $train_rc -eq 0 ] && [ $eval_rc -eq 0 ] && touch "$R/bighbm_ext.done"
  harvest
fi
log "phase-3 queue complete"
harvest
