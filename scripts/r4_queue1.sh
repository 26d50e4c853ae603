#!/bin/bash
# Round-4 TPU queue 1 (restart after a mid-epoch trainer hang at 19:06).
# run_wd: run a trainer with a stall watchdog — if its log stops growing for
# 30 min (covers the big first-compile), kill it and move on.
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

run_wd runs_r4/factorypick_b.log \
  python train.py task=FactoryTaskNutBoltPick seed=42 experiment=factorypick_r4b \
    num_envs=512 train.params.config.minibatch_size=2048 max_iterations=2048

run_wd runs_r4/allegrolstm.log \
  python train.py task=AllegroHandLSTM seed=42 experiment=allegrolstm_r4 \
    max_iterations=2000

run_wd runs_r4/shadowff.log \
  python train.py task=ShadowHandOpenAI_FF seed=42 experiment=shadowff_r4 \
    max_iterations=1500

run_wd runs_r4/ballbalance.log \
  python train.py task=BallBalance seed=42 experiment=ballbalance_r4 \
    max_iterations=250

run_wd runs_r4/factoryscrew.log \
  python train.py task=FactoryTaskNutBoltScrew seed=42 experiment=factoryscrew_r4 \
    max_iterations=300

echo done > runs_r4/queue1.done
