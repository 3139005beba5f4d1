#!/usr/bin/env bash
# Round-4b on-chip queue: the r4 jobs the TPU-pool outage killed, in
# VERDICT priority order. Each job is idempotent (done-files), probes the
# TPU before starting, auto-commits its artifacts (pathspec-limited so it
# never sweeps up unrelated staged work), and trainer jobs ride the
# --retries / hang-watchdog / relaunch-adoption machinery (cli/run.py).
# Run:  nohup setsid bash benchmarks/chipq_r4b.sh >> benchmarks/results/r4/queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
R=benchmarks/results/r4
mkdir -p "$R"
PY=python

log() { echo "[chipq $(date +%H:%M:%S)] $*"; }

harvest() {
  git add "$R" >/dev/null 2>&1
  git commit -q -m "Record on-chip round-4 queue artifacts (auto-harvest)" -- "$R" >/dev/null 2>&1 || true
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
    [ "$left" -le 60 ] && return 124
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

# ---- 1. streaming residency tiers at flagship shapes (VERDICT #1a) ----
if [ ! -f "$R/resid.done" ]; then
  probe 15 || { log "TPU gone before resid"; exit 1; }
  log "START resid"
  STREAM_BENCH_DIR=/tmp/reni_r4_streamexr timeout 3300 \
    $PY benchmarks/streaming_residency.py --epochs 3 > "$R/resid.log" 2>&1
  rc=$?
  cp -f /tmp/stream_bench.json "$R/stream_bench.json" 2>/dev/null
  log "DONE resid rc=$rc"
  [ $rc -eq 0 ] && touch "$R/resid.done"
  harvest
fi

# ---- 2. backward-kernel anatomy at the saturated batch (VERDICT #3) ----
if [ ! -f "$R/anatomy.done" ]; then
  probe 15 || { log "TPU gone before anatomy"; exit 1; }
  log "START anatomy"
  timeout 2700 $PY benchmarks/bwd_anatomy.py --batch 400 \
    > "$R/anatomy.out" 2> "$R/anatomy.log"
  rc=$?
  tail -1 "$R/anatomy.out" > "$R/anatomy.json" 2>/dev/null
  log "DONE anatomy rc=$rc"
  [ $rc -eq 0 ] && touch "$R/anatomy.done"
  harvest
fi

# ---- 3. headline bench at HEAD ----
if [ ! -f "$R/bench.done" ]; then
  probe 15 || { log "TPU gone before bench"; exit 1; }
  log "START bench"
  timeout 2400 $PY bench.py > "$R/bench.json" 2> "$R/bench.log"
  rc=$?
  log "DONE bench rc=$rc"
  [ $rc -eq 0 ] && touch "$R/bench.done"
  harvest
fi

# ---- 4. FIRST_LAYER_INIT_SCALE=2.0 A/B on the N=100 chain (VERDICT #4) ----
if [ ! -f "$R/flis.done" ]; then
  probe 15 || { log "TPU gone before flis"; exit 1; }
  log "START flis"
  if [ ! -d /tmp/reni_r4_synth100/Train ]; then
    $PY examples/make_synthetic_dataset.py --out /tmp/reni_r4_synth100 \
      --train 100 --test 21 --width 128 --seed 0 >> "$R/flis.log" 2>&1
  fi
  train_loop 2400 --cfg_path benchmarks/cfg_r4/flis_n100.yaml >> "$R/flis.log" 2>&1
  rc=$?
  ck=$(newest "fit_latent_final.npz" /tmp/reni_r4_flis_runs)
  if [ -n "$ck" ]; then
    timeout 900 $PY -m reni_tpu.cli.evaluate --checkpoint "${ck%.npz}" \
      --cfg_path benchmarks/cfg_r4/flis_n100.yaml \
      > "$R/flis_eval.json" 2>> "$R/flis.log"
    rc=$?
  fi
  log "DONE flis rc=$rc"
  [ $rc -eq 0 ] && touch "$R/flis.done"
  harvest
fi

# ---- 5. multi-view teapot inverse at published scale (VERDICT #5) ----
if [ ! -f "$R/inverse_mv.done" ]; then
  probe 15 || { log "TPU gone before inverse_mv"; exit 1; }
  log "START inverse_mv"
  if [ ! -d /tmp/reni_zoo_data/Test ]; then
    $PY examples/make_synthetic_dataset.py --out /tmp/reni_zoo_data \
      --train 1000 --test 21 --width 128 --seed 1 >> "$R/inverse_mv.log" 2>&1
  fi
  train_loop 4200 --cfg_path benchmarks/cfg_r4/inverse_mv.yaml >> "$R/inverse_mv.log" 2>&1
  rc=$?
  ck=$(newest "fit_inverse_final.npz" /tmp/reni_r4_inv_mv_runs)
  if [ -n "$ck" ]; then
    timeout 1200 $PY -m reni_tpu.cli.evaluate --checkpoint "${ck%.npz}" \
      --cfg_path benchmarks/cfg_r4/inverse_mv.yaml \
      > "$R/inverse_mv_eval.json" 2>> "$R/inverse_mv.log"
    rc=$?
  fi
  log "DONE inverse_mv rc=$rc"
  [ $rc -eq 0 ] && touch "$R/inverse_mv.done"
  harvest
fi

# ---- 6. TPU.PRECOMPILE wall-clock A/B (VERDICT #7) ----
if [ ! -f "$R/precomp.done" ]; then
  probe 15 || { log "TPU gone before precomp"; exit 1; }
  log "START precomp"
  if [ ! -d /tmp/reni_r4_synth100/Train ]; then
    $PY examples/make_synthetic_dataset.py --out /tmp/reni_r4_synth100 \
      --train 100 --test 21 --width 128 --seed 0 >> "$R/precomp.log" 2>&1
  fi
  ok=1
  for v in off on; do
    t0=$(date +%s)
    train_loop 2400 --cfg_path "benchmarks/cfg_r4/precomp_$v.yaml" \
      >> "$R/precomp.log" 2>&1
    rc=$?
    t1=$(date +%s)
    echo "{\"precompile\": \"$v\", \"wall_s\": $((t1 - t0)), \"rc\": $rc}" \
      >> "$R/precomp.json"
    [ $rc -eq 0 ] || ok=0
  done
  log "DONE precomp ok=$ok"
  [ $ok -eq 1 ] && touch "$R/precomp.done"
  harvest
fi

# ---- 7. single-view teapot control (same decoder/schedule) ----
if [ ! -f "$R/inverse_sv.done" ]; then
  probe 15 || { log "TPU gone before inverse_sv"; exit 1; }
  log "START inverse_sv"
  train_loop 4200 --cfg_path benchmarks/cfg_r4/inverse_sv.yaml >> "$R/inverse_sv.log" 2>&1
  rc=$?
  ck=$(newest "fit_inverse_final.npz" /tmp/reni_r4_inv_sv_runs)
  if [ -n "$ck" ]; then
    timeout 1200 $PY -m reni_tpu.cli.evaluate --checkpoint "${ck%.npz}" \
      --cfg_path benchmarks/cfg_r4/inverse_sv.yaml \
      > "$R/inverse_sv_eval.json" 2>> "$R/inverse_sv.log"
    rc=$?
  fi
  log "DONE inverse_sv rc=$rc"
  [ $rc -eq 0 ] && touch "$R/inverse_sv.done"
  harvest
fi

# ---- 8. beyond-HBM out-of-core chain (VERDICT #1b) — the long tail ----
if [ ! -f "$R/bighbm.done" ]; then
  probe 15 || { log "TPU gone before bighbm"; exit 1; }
  log "START bighbm"
  # staging (10500 maps at 256x512, float/NONE, ~16.5 GB decoded) runs as
  # a separate nice'd CPU process in parallel with the earlier chip jobs;
  # wait for its marker rather than re-generating serially here
  w=0
  while [ ! -f /tmp/reni_r4_bighbm/.staged ] && [ $w -lt 90 ]; do
    if ! ls /tmp/reni_r4_bighbm >/dev/null 2>&1 && [ $w -gt 5 ]; then
      log "stager never started; generating inline"
      nice -n 19 timeout 5400 $PY examples/make_synthetic_dataset.py \
        --out /tmp/reni_r4_bighbm --train 10500 --test 21 --width 512 \
        --seed 3 --pixel_type float --compression NONE >> "$R/bighbm.log" 2>&1 \
        && touch /tmp/reni_r4_bighbm/.staged
      break
    fi
    sleep 60; w=$((w + 1))
  done
  [ -f /tmp/reni_r4_bighbm/.staged ] || { log "bighbm staging missing; skipping"; harvest; exit 1; }
  t0=$(date +%s)
  train_loop 10800 --cfg_path benchmarks/cfg_r4/bighbm.yaml >> "$R/bighbm.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "{\"bighbm_wall_s\": $((t1 - t0)), \"rc\": $rc}" >> "$R/bighbm_wall.json"
  ck=$(newest "fit_latent_final.npz" /tmp/reni_r4_bighbm_runs)
  if [ -n "$ck" ]; then
    timeout 1800 $PY -m reni_tpu.cli.evaluate --checkpoint "${ck%.npz}" \
      --cfg_path benchmarks/cfg_r4/bighbm.yaml --resolution 256 512 \
      > "$R/bighbm_eval.json" 2>> "$R/bighbm.log"
    rc=$?
  fi
  log "DONE bighbm rc=$rc"
  [ $rc -eq 0 ] && touch "$R/bighbm.done"
  harvest
fi

log "queue complete"
harvest
