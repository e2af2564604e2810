#!/bin/bash
# Round-5 (VERDICT r4 #6): the 19-parameter NaKL (Cm FREE) attacked
# with the measured dose-response machinery — tight physiological boxes
# (x6 shrink on kinetics/reversals; Cm and conductances wide), log-tau
# + log-g, own-draw anchors, gate-RF weighting, K=3 protocols, N=6001.
# Same recipe as the 18-param tightbox campaigns; the ONLY change is
# CM_FLAG="" (Cm estimated). Phase 1 screen + f64 polish of the top 4.
# Optionally waits for a prior campaign's DONE marker (WAIT_FOR=).
set -u
export DIR=${DIR:-/tmp/nakl_r5}
WAIT_FOR=${WAIT_FOR:-}
if [ -n "$WAIT_FOR" ]; then
  while [ ! -f "$DIR/$WAIT_FOR" ]; do sleep 60; done
fi
if [ ! -f "$DIR/cm19_DONE" ]; then
  env TAG=cm19 NINIT=${NINIT:-16} SEED=${SEED:-7} \
    REPEATS=${REPEATS:-3} MAXITER=${MAXITER:-40} CM_FLAG="" \
    EXTRA="--param-prior 10 --prior-own-draw --box-shrink 6" \
    bash "$(dirname "$0")/run_screen.sh"
fi
if [ ! -f "$DIR/cm19_polish_DONE" ]; then
  env TAG=cm19 POLISH_TOP=${POLISH_TOP:-4} \
    POLISH_REPEATS=${POLISH_REPEATS:-3} \
    bash "$(dirname "$0")/run_clampG_polish.sh"
fi
