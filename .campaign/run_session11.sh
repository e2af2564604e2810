#!/bin/bash
# Round-4 session 1: the two remaining robustness probes from the
# session-10 queue, run sequentially on the single chip after shrink15
# completed (width-2/3 dose point: 7/32 = 22 %). Checkpoints live
# in-repo (.campaign/ckpt) so partial ladders survive VM loss; STALE
# 2700 per the measured contended-core compile times.
# Stop by PID: /tmp/session11.pid (this wrapper), per-TAG pids in
# $DIR/<TAG>.pid.
set -u
DIR=${DIR:-/root/repo/.campaign/ckpt}
cd /root/repo

# TAG shrink seed offset B
for CFG in "offset1 6 24 1.0 32" "tightbox64b 6 25 0.5 64"; do
  set -- $CFG
  TAG=$1; S=$2; SEED=$3; OFF=$4; B=$5
  if [ ! -f "$DIR/${TAG}_DONE" ]; then
    env DIR="$DIR" STALE=2700 TAG="$TAG" NINIT="$B" SEED="$SEED" \
      EXTRA="--param-prior 10 --prior-own-draw --box-shrink $S --box-offset $OFF" \
      bash .campaign/run_screen.sh
  fi
done

echo "$(date -u +%FT%TZ) session-11 probes COMPLETE"
touch "$DIR/session11_DONE"
