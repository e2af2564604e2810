#!/bin/bash
# Generalized phase-1 screen runner for the N=6001 18-parameter NaKL
# campaigns (round 3 closing runs). Same recipe as run_clampG.sh
# (K=3 joint protocols, slaved gates 1e7, --gates-own-ss, log-tau +
# log-g boxes, f32 ladder, 61 rungs x REPEATS repeats at MAXITER per
# dispatch, snapshot rung 40, chunk=1) with TAG/NINIT/SEED/EXTRA env
# parameters so one script covers:
#   probeT6: TAG=probeT6 NINIT=8 EXTRA="--seed-truth"   (truth retention)
#   clampH:  TAG=clampH  NINIT=256                      (fresh-draw screen)
# Operational wrapper per CLAUDE.md measured gotchas: probe-then-launch,
# per-PID watchdog with staleness from max(ckpt mtime, launch time),
# auto-resume from the per-rung checkpoint, never pattern-kill.
set -u
DIR=${DIR:-/tmp/nakl_r3}
TAG=${TAG:?set TAG}
NINIT=${NINIT:-64}
SEED=${SEED:-3}
MAXITER=${MAXITER:-40}
REPEATS=${REPEATS:-5}
STALE=${STALE:-900}
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
  # CM_FLAG: "--fix-cm" (default, the 18-param campaigns) or "" for the
  # 19-parameter all-params mode (round-5 VERDICT #6: Cm free)
  python -u examples/nakl_ensemble.py --all-params ${CM_FLAG---fix-cm} \
    --protocols 3 \
    --ninit "$NINIT" --record-n 6001 --log-tau --log-g \
    --gate-rf-scale 1e7 --gates-own-ss \
    --maxiter "$MAXITER" --repeats "$REPEATS" --chunk 1 \
    --no-polish --save "$SAVE" --seed "$SEED" $EXTRA >> "$LOG" 2>&1 &
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
