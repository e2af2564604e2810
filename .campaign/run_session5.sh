#!/bin/bash
# Session-5 closing sequence for the round-3 f64 ordering confirmation
# (see CLAUDE.md "Session-4 state": the machine was lost twice, so both
# phase-1 saves and their f64 polishes are being re-run from scratch).
# Sequence (each stage skips itself if its _DONE marker exists, so this
# wrapper is itself resumable after a machine loss):
#   1. probeT7 phase 1  — truth-seeded + own-draw anchors, B=8, N=6001
#   2. clampH16 phase 1 — fresh-draw + own-draw anchors,  B=16, N=6001
#   3. probeT7 f64 polish (top 4, repeats 3 — trimmed for wall-clock)
#   4. clampH16 f64 polish (top 4, repeats 3)
# All stages run the TPU sequentially (single chip — no contention).
set -u
DIR=${DIR:-/tmp/nakl_r3}
mkdir -p "$DIR"
cd /root/repo

stage() {
  local marker=$1; shift
  if [ -f "$DIR/$marker" ]; then
    echo "$(date -u +%FT%TZ) stage $marker already done, skipping"
    return 0
  fi
  echo "$(date -u +%FT%TZ) stage $marker starting"
  "$@"
  echo "$(date -u +%FT%TZ) stage $marker finished"
}

stage probeT7_DONE env TAG=probeT7 NINIT=8 SEED=3 \
  EXTRA="--seed-truth --param-prior 10 --prior-own-draw" \
  bash .campaign/run_screen.sh

stage clampH16_DONE env TAG=clampH16 NINIT=16 SEED=3 \
  EXTRA="--param-prior 10 --prior-own-draw" \
  bash .campaign/run_screen.sh

stage probeT7_polish_DONE env TAG=probeT7 POLISH_TOP=4 POLISH_REPEATS=3 \
  bash .campaign/run_clampG_polish.sh

stage clampH16_polish_DONE env TAG=clampH16 POLISH_TOP=4 POLISH_REPEATS=3 \
  bash .campaign/run_clampG_polish.sh

echo "$(date -u +%FT%TZ) session-5 sequence COMPLETE"
touch "$DIR/session5_DONE"
