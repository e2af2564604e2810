#!/bin/bash
# Round-3 session 9: prior-width dose-response for the tight-box
# positive. The shrink-6 physiological prior measured 80/80 fresh draws
# in the truth watershed (tightbox16 + tightbox64, PARITY.md); this
# sweep measures how WEAK the prior can get before coverage fails —
# shrink 4, 3, 2 at B=32 each (fresh seeds, fresh offset-jittered box
# centers per run), same recipe otherwise (K=3, slaved gates, log-tau +
# log-g, own-draw anchors, N=6001, f32 ladder, no polish — hit-rate is
# a phase-1 statistic via benchmarks/nakl_coverage.py).
# Sequential so the single chip is never contended. Resumable: each
# stage skips itself when its _DONE marker exists.
set -u
DIR=${DIR:-/tmp/nakl_r3}
mkdir -p "$DIR"
cd /root/repo

for CFG in "shrink4 4 21 0.5" "shrink3 3 22 0.5" "shrink2 2 23 0.5" \
           "offset1 6 24 1.0"; do
  set -- $CFG
  TAG=$1; S=$2; SEED=$3; OFF=$4
  if [ ! -f "$DIR/${TAG}_DONE" ]; then
    env TAG="$TAG" NINIT=32 SEED="$SEED" \
      EXTRA="--param-prior 10 --prior-own-draw --box-shrink $S --box-offset $OFF" \
      bash .campaign/run_screen.sh
  fi
done

echo "$(date -u +%FT%TZ) shrink sweep COMPLETE"
touch "$DIR/shrink_sweep_DONE"
