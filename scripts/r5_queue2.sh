#!/bin/bash
# Round-5 queue 2: runs after queue 1 drains.  Deadline-aware: each item
# checks the wall clock and skips if there is not enough slack left so the
# bench suite always gets its slot.
# Usage: r5_queue2.sh <deadline_epoch_seconds>
cd "$(dirname "$0")/.."
DEADLINE=${1:-$(( $(date +%s) + 14400 ))}

while [ ! -f runs_r5/queue1.done ]; do sleep 60; done

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
    if [ "$(date +%s)" -gt "$(( DEADLINE - 1500 ))" ]; then
      echo "DEADLINE: stopping $pid to free the chip for the bench" >> "$log"
      kill "$pid"; sleep 10; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
}

left() { echo $(( DEADLINE - $(date +%s) )); }

# ShadowHandOpenAI_LSTM — VERDICT #10 (the LSTM flagship variant)
if [ "$(left)" -gt 4500 ]; then
  run_wd runs_r5/shadowlstm.log \
    python train.py task=ShadowHandOpenAI_LSTM seed=42 \
      experiment=shadowlstm_r5 max_iterations=700
fi

# Dextreme ADR at REFERENCE thresholds (queue 256, 5/20) with the new
# urgency/force mechanics — VERDICT #7
if [ "$(left)" -gt 4000 ]; then
  run_wd runs_r5/dextremeadr.log \
    python train.py task=AllegroHandDextremeADR seed=42 \
      experiment=dextremeadr_r5 max_iterations=1200
fi

# Bench suite (incl. the new Factory/IndustReal production-batch rows)
python scripts/bench_suite.py > runs_r5/bench_suite.log 2>&1
python bench.py > runs_r5/bench_headline.log 2>&1
echo done > runs_r5/queue2.done
