#!/bin/bash
# Session-5 stage C: the tight-box positive workflow at REAL ensemble
# scale. tightbox16 (stage B) demonstrated that fresh draws from the
# literature-style physiological prior (--box-shrink 6 on kinetics/
# reversals, wide conductances, own-draw anchors) reach the truth
# watershed; this run measures the HIT-RATE at B=64 — the coverage
# statistic that closes PARITY.md's coverage analysis — and polishes
# the top 6 members for the f64 ordering/error table.
set -u
DIR=${DIR:-/tmp/nakl_r3}
mkdir -p "$DIR"
cd /root/repo

until [ -f "$DIR/session5b_DONE" ]; do
  sleep 120
done

if [ ! -f "$DIR/tightbox64_DONE" ]; then
  env TAG=tightbox64 NINIT=64 SEED=7 \
    EXTRA="--param-prior 10 --prior-own-draw --box-shrink 6" \
    bash .campaign/run_screen.sh
fi

if [ ! -f "$DIR/tightbox64_polish_DONE" ]; then
  env TAG=tightbox64 POLISH_TOP=6 POLISH_REPEATS=3 \
    bash .campaign/run_clampG_polish.sh
fi

echo "$(date -u +%FT%TZ) session-5c sequence COMPLETE"
touch "$DIR/session5c_DONE"
