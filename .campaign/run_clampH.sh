#!/bin/bash
# clampH — round-3 closing RECOVERY campaign: fresh-draw 18-parameter
# NaKL at the doubled record (N=6001) with the DRAW-ANCHORED weak MAP
# prior (--prior-own-draw): each member's parameters are softly anchored
# to its own draw (lambda 10, width 0.25 box-widths, per-member centers
# frozen via batched bounds), countering the measured annealing-path
# drift (PARITY.md: truth-seeded members are expelled by rung 40 even at
# N=6001 without an anchor; with one, the full f32 ladder holds the
# basin). At N=6001 the truth basin ranks FIRST on action (measured
# flip), so the best-by-action anchored member is the recovery estimate;
# phase 2 (run_clampG_polish.sh TAG=clampH) polishes prior-free in f64.
# Recipe otherwise = clampG (K=3, log-tau+log-g, slaved gates, B=64).
set -u
DIR=${DIR:-/tmp/nakl_r3}
TAG=${TAG:-clampH}
MAXITER=${MAXITER:-40}
REPEATS=${REPEATS:-5}
STALE=${STALE:-900}
NINIT=${NINIT:-64}
EXTRA=${EXTRA:-}
mkdir -p "$DIR"
LOG=$DIR/$TAG.log
SAVE=$DIR/$TAG.npz
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
# persistent XLA compilation cache (measured on this backend:
# 166 s -> 1.5 s second-process compile; the f64 polish program
# takes >16 min to compile on a 1-core box, so crash-relaunches
# are otherwise dominated by recompiles)
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}

probe_tpu() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0" >/dev/null 2>&1
}

while true; do
  until probe_tpu; do
    echo "$(date -u +%FT%TZ) TPU probe failed; waiting 120s" >> "$LOG"
    sleep 120
  done
  LAUNCH=$(date +%s)
  python -u examples/nakl_ensemble.py --all-params --fix-cm --protocols 3 \
    --ninit "$NINIT" --record-n 6001 --log-tau --log-g \
    --gate-rf-scale 1e7 --gates-own-ss \
    --param-prior 10 --prior-own-draw \
    --maxiter "$MAXITER" --repeats "$REPEATS" --chunk 1 \
    --no-polish --save "$SAVE" --seed 5 $EXTRA >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > "$DIR/$TAG.pid"
  echo "$(date -u +%FT%TZ) launched pid=$PID" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    M=$LAUNCH
    CK=${SAVE%.npz}_p1_ckpt.npz
    if [ -f "$CK" ]; then
      CM=$(stat -c %Y "$CK")
      [ "$CM" -gt "$M" ] && M=$CM
    fi
    NOW=$(date +%s)
    if [ $((NOW - M)) -gt "$STALE" ]; then
      echo "$(date -u +%FT%TZ) stale $((NOW - M))s; killing $PID" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"
  RC=$?
  # completion = the save file exists and was written by THIS
  # launch (the log is append-only across reruns of a TAG, so
  # grepping it alone can false-positive on a stale line)
  if [ -f "$SAVE" ] && [ "$(stat -c %Y "$SAVE")" -ge "$LAUNCH" ] \
      && grep -q "saved phase-1 state" "$LOG"; then
    echo "$(date -u +%FT%TZ) $TAG phase 1 COMPLETE" >> "$LOG"
    touch "$DIR/${TAG}_DONE"
    break
  fi
  echo "$(date -u +%FT%TZ) exited rc=$RC before completion; retrying" >> "$LOG"
  sleep 30
done
