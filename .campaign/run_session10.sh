#!/bin/bash
# Round-3 session 10: reordered tail of the prior-width dose-response
# sweep. Replaces the session-9 run_shrink_sweep.sh + run_shrink15.sh
# wrappers (stopped by PID) so the cliff-localization point (width 2/3,
# box-shrink 1.5) runs IMMEDIATELY after the in-flight shrink2 point,
# ahead of the two robustness replicates — if the session ends early,
# the dose-response curve is complete and only replicates are lost.
# Sequential single-chip discipline; stages resume via _DONE markers.
# Stop by PID: /tmp/session10.pid.
set -u
DIR=${DIR:-/tmp/nakl_r3}
cd /root/repo

# let the in-flight shrink2 stage (driven by its own run_screen.sh)
# finish before contending for the chip
while [ ! -f "$DIR/shrink2_DONE" ]; do
  sleep 120
done

# TAG shrink seed offset B
for CFG in "shrink15 1.5 26 0.5 32" "offset1 6 24 1.0 32" \
           "tightbox64b 6 25 0.5 64"; do
  set -- $CFG
  TAG=$1; S=$2; SEED=$3; OFF=$4; B=$5
  if [ ! -f "$DIR/${TAG}_DONE" ]; then
    env TAG="$TAG" NINIT="$B" SEED="$SEED" \
      EXTRA="--param-prior 10 --prior-own-draw --box-shrink $S --box-offset $OFF" \
      bash .campaign/run_screen.sh
  fi
done

echo "$(date -u +%FT%TZ) session-10 sweep tail COMPLETE"
touch "$DIR/shrink_sweep_DONE"
