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

# TAG shrink seed offset B — the three prior-width points, the
# center-offset robustness probe (truth allowed at the box edge), and a
# third-seed B=64 replicate of the shrink-6 positive (→ 144 draws over
# three seeds if all hold).
for CFG in "shrink4 4 21 0.5 32" "shrink3 3 22 0.5 32" \
           "shrink2 2 23 0.5 32" "offset1 6 24 1.0 32" \
           "tightbox64b 6 25 0.5 64"; do
  set -- $CFG
  TAG=$1; S=$2; SEED=$3; OFF=$4; B=$5
  if [ ! -f "$DIR/${TAG}_DONE" ]; then
    env TAG="$TAG" NINIT="$B" SEED="$SEED" \
      EXTRA="--param-prior 10 --prior-own-draw --box-shrink $S --box-offset $OFF" \
      bash .campaign/run_screen.sh
  fi
done

echo "$(date -u +%FT%TZ) shrink sweep COMPLETE"
touch "$DIR/shrink_sweep_DONE"
