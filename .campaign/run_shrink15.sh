#!/bin/bash
# Round-3 session 10: cliff localization for the prior-width
# dose-response. Completed points: width 1/6 -> 100%, 1/4 -> 97%,
# 1/3 -> 94%, wide (1) -> 0%. If the in-flight shrink2 (width 1/2)
# still hits, the coverage cliff sits somewhere in (1/2, 1); this
# stage adds the width-2/3 point (box-shrink 1.5, fresh seed 26,
# B=32, same recipe) to localize it. Waits for the session-9 sweep
# (sequential single-chip discipline), then runs one run_screen.sh
# stage. Stop by PID (/tmp/shrink15_wrapper.pid).
set -u
DIR=${DIR:-/tmp/nakl_r3}
cd /root/repo

while [ ! -f "$DIR/shrink_sweep_DONE" ]; do
  sleep 120
done

if [ ! -f "$DIR/shrink15_DONE" ]; then
  env TAG="shrink15" NINIT=32 SEED=26 \
    EXTRA="--param-prior 10 --prior-own-draw --box-shrink 1.5 --box-offset 0.5" \
    bash .campaign/run_screen.sh
fi
echo "$(date -u +%FT%TZ) shrink15 stage COMPLETE"
