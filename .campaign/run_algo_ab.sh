#!/bin/bash
# Round-5 (VERDICT r4 #2): methodology-clean projection-vs-subspace
# comparison at the 18-parameter campaign shape. Two phase-1 screens
# with IDENTICAL seeds/draws/ladder/B — the tightbox recipe (x6
# physiological boxes, own-draw anchors, K=3, N=6001, 61 rungs) — run
# SEQUENTIALLY (no device contention skewing wall), differing ONLY in
# the bounded L-BFGS algorithm:
#   algoP: --algo projection  (active-set masked direction +
#          projected-path Armijo)
#   algoS: --algo subspace    (full L-BFGS-B: GCP + subspace solves —
#          the campaigns' historical default)
# Decision inputs (PARITY round-5): hit rate (nakl_coverage), action
# ordering (nakl_eval), wall clock + nfev from the runner logs/saves.
set -u
export DIR=${DIR:-/tmp/nakl_r5}
NINIT=${NINIT:-32}
SEED=${SEED:-7}
REPEATS=${REPEATS:-3}
MAXITER=${MAXITER:-40}
BASE_EXTRA="--param-prior 10 --prior-own-draw --box-shrink 6"
mkdir -p "$DIR"

for ALGO in projection subspace; do
  TAG=$([ "$ALGO" = projection ] && echo algoP || echo algoS)
  if [ ! -f "$DIR/${TAG}_DONE" ]; then
    echo "$(date -u +%FT%TZ) === arm $TAG (--algo $ALGO) ===" \
      >> "$DIR/algo_ab.log"
    T0=$(date +%s)
    env TAG="$TAG" NINIT="$NINIT" SEED="$SEED" REPEATS="$REPEATS" \
      MAXITER="$MAXITER" EXTRA="$BASE_EXTRA --algo $ALGO" \
      bash "$(dirname "$0")/run_screen.sh"
    T1=$(date +%s)
    echo "$(date -u +%FT%TZ) arm $TAG wall_total=$((T1 - T0))s" \
      >> "$DIR/algo_ab.log"
  fi
done
echo "$(date -u +%FT%TZ) both arms complete" >> "$DIR/algo_ab.log"
touch "$DIR/algo_ab_DONE"
