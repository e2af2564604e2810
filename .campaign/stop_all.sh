#!/bin/bash
# Round-end hygiene (VERDICT r3 weak #1 / next #9): stop every campaign
# wrapper and python BY PID so the driver's bench runs uncontended.
# Never pattern-kill — the session's own command line matches patterns.
# Covers: session wrappers (/tmp/*.pid), run_screen per-TAG pids
# ($DIR/<TAG>.pid), and legacy /tmp/nakl_r3 pids if present.
for f in /tmp/session13.pid /tmp/session12.pid /tmp/session11.pid /tmp/session10.pid /tmp/shrink15_wrapper.pid \
         /tmp/avd32.pid /tmp/avd32b.pid \
         /root/repo/.campaign/ckpt/*.pid /tmp/nakl_r3/*.pid; do
  [ -f "$f" ] || continue
  PID=$(cat "$f" 2>/dev/null)
  [ -n "$PID" ] || continue
  if kill -0 "$PID" 2>/dev/null; then
    echo "killing $PID (from $f)"
    kill "$PID" 2>/dev/null
    sleep 2
    kill -9 "$PID" 2>/dev/null
  fi
done
# run_screen.sh relaunch loops: killing the wrapper pid above stops the
# loop; any straggler python it already launched is in $DIR/<TAG>.pid
# (covered). Verify nothing heavy is left:
sleep 1
ps -eo pid,etime,pcpu,comm,args --sort=-pcpu | head -8
