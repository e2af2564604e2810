#!/bin/bash
# Session-5 stage B: the tight-box (literature-prior) positive campaign.
# Waits for the primary f64-ordering sequence (run_session5.sh) to
# finish so the single chip is never contended, then runs:
#   5. tightbox16 phase 1 — fresh draws, kinetics/reversals in boxes
#      shrunk x6 around offset-jittered truth (--box-shrink 6),
#      conductances WIDE (the cell-specific unknowns), own-draw anchors
#   6. tightbox16 f64 polish (top 4 x 3 repeats)
# This measures the workflow PARITY.md's coverage analysis says the
# literature actually uses: a physiological prior on kinetics +
# estimation of conductances — the designed positive counterpart to
# the measured clampG/clampH negatives.
set -u
DIR=${DIR:-/tmp/nakl_r3}
mkdir -p "$DIR"
cd /root/repo

until [ -f "$DIR/session5_DONE" ]; do
  sleep 120
done

if [ ! -f "$DIR/tightbox16_DONE" ]; then
  env TAG=tightbox16 NINIT=16 SEED=3 \
    EXTRA="--param-prior 10 --prior-own-draw --box-shrink 6" \
    bash .campaign/run_screen.sh
fi

if [ ! -f "$DIR/tightbox16_polish_DONE" ]; then
  env TAG=tightbox16 POLISH_TOP=4 POLISH_REPEATS=3 \
    bash .campaign/run_clampG_polish.sh
fi

echo "$(date -u +%FT%TZ) session-5b sequence COMPLETE"
touch "$DIR/session5b_DONE"
