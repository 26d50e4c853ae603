#!/bin/bash
# Overtime queue: AnymalTerrain per-kind diagnosis run, FrankaCollectMA.
cd "$(dirname "$0")/.."
run_wd() {
  local log=$1; shift
  "$@" > "$log" 2>&1 &
  local pid=$!
  echo "$pid" > "$log.pid"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 120
    local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
    if [ "$age" -gt 1800 ]; then
      echo "WATCHDOG: no log growth for ${age}s — killing $pid" >> "$log"
      kill "$pid"; sleep 10; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
}
run_wd runs_r4/anymalterrain.log \
  python train.py task=AnymalTerrain seed=42 experiment=anymalterrain_r4 \
    max_iterations=1500
run_wd runs_r4/frankacollect.log \
  python train.py task=FrankaCollectMA seed=42 experiment=frankacollect_r4 \
    max_iterations=600
echo done > runs_r4/queue7.done
