#!/bin/bash
# Round-5 queue 3 (opportunistic): fires only if queue 2 finishes before
# the deadline.  IndustReal re-run post table-collision fix, then an
# Allegro continuation from the round-5 checkpoint.
# Usage: r5_queue3.sh <deadline_epoch_seconds>
cd "$(dirname "$0")/.."
DEADLINE=${1:-$(( $(date +%s) + 3600 ))}

while [ ! -f runs_r5/queue2.done ]; do
  sleep 60
  [ "$(date +%s)" -gt "$DEADLINE" ] && exit 0
done

run_wd() {
  local log=$1; shift
  "$@" > "$log" 2>&1 &
  local pid=$!
  echo "$pid" > "$log.pid"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
    if [ "$age" -gt 1500 ] || [ "$(date +%s)" -gt "$(( DEADLINE - 120 ))" ]; then
      kill "$pid"; sleep 10; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
}

left() { echo $(( DEADLINE - $(date +%s) )); }

if [ "$(left)" -gt 1800 ]; then
  run_wd runs_r5/industreal_b.log \
    python train.py task=IndustRealTaskPegsInsert seed=42 \
      experiment=industreal_r5b max_iterations=400
fi

if [ "$(left)" -gt 1800 ]; then
  CKPT=$(ls -t runs/allegrolstm_r5_*/nn/*.ckpt 2>/dev/null | head -1)
  run_wd runs_r5/allegrolstm_b.log \
    python train.py task=AllegroHandLSTM seed=42 \
      experiment=allegrolstm_r5b max_iterations=700 checkpoint="$CKPT"
fi
echo done > runs_r5/queue3.done
