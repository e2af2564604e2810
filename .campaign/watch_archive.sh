#!/bin/bash
# Facts watcher (machine-loss insurance, round-3 session 5): three VMs
# have died mid-campaign this round, taking /tmp with them.  This
# watcher polls the campaign dir for stage completion markers and, for
# each completed stage, archives the analysis-bearing facts of its save
# into the repo (.campaign/data/) via archive_facts.py — phase-1 saves
# lose their bulky decision vectors, polished saves are already small
# and are copied whole.  Idempotent: a stage is archived once (marker
# file in DATA).  Run alongside run_session5*.sh; stop by PID.
set -u
DIR=${DIR:-/tmp/nakl_r3}
DATA=/root/repo/.campaign/data
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

while true; do
  for marker in "$DIR"/*_DONE; do
    [ -e "$marker" ] || continue
    base=$(basename "$marker" _DONE)
    case "$base" in
      session5*) continue ;;
    esac
    if [[ "$base" == *_polish ]]; then
      tag=${base%_polish}
      src="$DIR/${tag}_polished.npz"
      dest="$DATA/${tag}_polished.npz"
    else
      tag=$base
      src="$DIR/${tag}.npz"
      dest="$DATA/${tag}_facts.npz"
    fi
    stamp="$DATA/.archived_${base}"
    [ -f "$stamp" ] && continue
    [ -f "$src" ] || continue
    if [[ "$base" == *_polish ]]; then
      cp "$src" "$dest" && touch "$stamp" \
        && echo "$(date -u +%FT%TZ) archived $src -> $dest"
    else
      JAX_PLATFORMS=cpu python .campaign/archive_facts.py "$src" "$dest" \
        && touch "$stamp" \
        && echo "$(date -u +%FT%TZ) archived $src -> $dest"
    fi
  done
  sleep 60
done
