#!/bin/bash
# Round-4 chip queue (reordered): the f64 polish batch-dimension
# bisection FIRST (VERDICT item 4 "Done" row; bounded wall-time), then
# the tightbox64b replicate for the remaining round time (its per-rung
# checkpoint survives round end). Stop by PID: /tmp/session13.pid.
set -u
DIR=${DIR:-/root/repo/.campaign/ckpt}
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}

if [ ! -f "$DIR/batch_bisect_DONE" ]; then
  timeout 21600 python benchmarks/f64_crash_repro.py --batch-bisect \
    > "$DIR/batch_bisect.log" 2>&1
  [ -f /tmp/f64_batch_bisect.json ] && \
    cp /tmp/f64_batch_bisect.json "$DIR/batch_bisect.json" && \
    touch "$DIR/batch_bisect_DONE"
fi

if [ ! -f "$DIR/tightbox64b_DONE" ]; then
  env DIR="$DIR" STALE=2700 TAG=tightbox64b NINIT=64 SEED=25 \
    EXTRA="--param-prior 10 --prior-own-draw --box-shrink 6 --box-offset 0.5" \
    bash .campaign/run_screen.sh
fi

echo "$(date -u +%FT%TZ) session-13 chip queue COMPLETE"
touch "$DIR/session13_DONE"
