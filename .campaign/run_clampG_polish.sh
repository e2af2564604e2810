#!/bin/bash
# clampG phase 2 — f64 polish of the top snapshot members ON THE TPU
# (round-3 LuDecomposition fix made the f64 bounded SH ladder compile on
# device; measured ~79 member-evals/s at N=3001 B=4 — an order of
# magnitude above the single CPU core). Chunked at POLISH_MAXITER per
# dispatch x POLISH_REPEATS warm-started repeats per rung to stay under
# the testbed's ~60 s dispatch kill; auto-resumes from the _pol_ckpt.
set -u
DIR=${DIR:-/tmp/nakl_r3}
TAG=${TAG:-clampG}
POLISH_TOP=${POLISH_TOP:-8}
POLISH_MAXITER=${POLISH_MAXITER:-100}
POLISH_REPEATS=${POLISH_REPEATS:-10}
STALE=${STALE:-2700}
mkdir -p "$DIR"
LOG=$DIR/${TAG}_polish.log
SAVE=$DIR/$TAG.npz
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
# persistent XLA compilation cache (measured on this backend:
# 166 s -> 1.5 s second-process compile; the f64 polish program
# takes >16 min to compile on a 1-core box, so crash-relaunches
# are otherwise dominated by recompiles)
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}

probe_tpu() {
  timeout 600 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0" >/dev/null 2>&1
}

while true; do
  until probe_tpu; do
    echo "$(date -u +%FT%TZ) TPU probe failed; waiting 120s" >> "$LOG"
    sleep 120
  done
  LAUNCH=$(date +%s)
  python -u examples/nakl_ensemble.py --load "$SAVE" \
    --polish-top "$POLISH_TOP" --polish-maxiter "$POLISH_MAXITER" \
    --polish-batch "${POLISH_BATCH:-4}" \
    --polish-repeats "$POLISH_REPEATS" --chunk 1 >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > "$DIR/${TAG}_polish.pid"
  echo "$(date -u +%FT%TZ) launched pid=$PID" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    M=$LAUNCH
    CK=${SAVE%.npz}_pol_ckpt.npz
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
  POL="${SAVE%.npz}_polished.npz"
  # completion = the polished save exists and was written by THIS
  # launch (append-only log can carry a stale completion line)
  if [ -f "$POL" ] && [ "$(stat -c %Y "$POL")" -ge "$LAUNCH" ] \
      && grep -q "saved polished estimate" "$LOG"; then
    echo "$(date -u +%FT%TZ) $TAG polish COMPLETE" >> "$LOG"
    touch "$DIR/${TAG}_polish_DONE"
    break
  fi
  echo "$(date -u +%FT%TZ) exited rc=$RC before completion; retrying" >> "$LOG"
  sleep 30
done
