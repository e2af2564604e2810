#!/bin/bash
# Round-4 session 1, TPU queue after offset1: the bounded whole-solve
# A/B (VERDICT r4 item 1 "Done" criterion), then the tightbox64b
# robustness replicate, then the f64 polish batch-dimension bisection
# (VERDICT item 4). Sequential single-chip discipline.
# Stop by PID: /tmp/session12.pid; per-stage pids in $DIR.
set -u
DIR=${DIR:-/root/repo/.campaign/ckpt}
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}

while [ ! -f "$DIR/offset1_DONE" ]; do
  sleep 120
done

# --- bounded whole-solve A/B (retry loop per CLAUDE.md crash gotchas) ---
if [ ! -f "$DIR/bounded_ab_DONE" ]; then
  for i in 1 2 3; do
    timeout 3000 python benchmarks/bounded_solve_ab.py \
      > "$DIR/bounded_ab.log" 2>&1 && break
    echo "$(date -u +%FT%TZ) bounded A/B attempt $i failed" >> "$DIR/bounded_ab.log"
    sleep 120
  done
  [ -f /tmp/bounded_ab.json ] && cp /tmp/bounded_ab.json "$DIR/bounded_ab.json" \
    && touch "$DIR/bounded_ab_DONE"
fi

# --- packed-member kernel A/B (VERDICT item 7) --------------------------
if [ ! -f "$DIR/pack_ab_DONE" ]; then
  for i in 1 2 3; do
    timeout 3000 python benchmarks/pack_ab.py \
      > "$DIR/pack_ab.log" 2>&1 && break
    echo "$(date -u +%FT%TZ) pack A/B attempt $i failed" >> "$DIR/pack_ab.log"
    sleep 120
  done
  [ -f /tmp/pack_ab.json ] && cp /tmp/pack_ab.json "$DIR/pack_ab.json" \
    && touch "$DIR/pack_ab_DONE"
fi

# --- tightbox64b replicate (seed 25, B=64) ------------------------------
if [ ! -f "$DIR/tightbox64b_DONE" ]; then
  env DIR="$DIR" STALE=2700 TAG=tightbox64b NINIT=64 SEED=25 \
    EXTRA="--param-prior 10 --prior-own-draw --box-shrink 6 --box-offset 0.5" \
    bash .campaign/run_screen.sh
fi

# --- f64 polish batch-dimension bisection -------------------------------
if [ ! -f "$DIR/batch_bisect_DONE" ]; then
  timeout 28800 python benchmarks/f64_crash_repro.py --batch-bisect \
    > "$DIR/batch_bisect.log" 2>&1
  [ -f /tmp/f64_batch_bisect.json ] && \
    cp /tmp/f64_batch_bisect.json "$DIR/batch_bisect.json" && \
    touch "$DIR/batch_bisect_DONE"
fi

echo "$(date -u +%FT%TZ) session-12 TPU queue COMPLETE"
touch "$DIR/session12_DONE"
