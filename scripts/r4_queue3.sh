#!/bin/bash
# Round-4 rebalanced TPU queue: waits for the factory trainer (PID arg), then
# cheap wins first (BallBalance, Screw), then the hand campaigns, then
# anymal/collect/bench if time remains.
cd "$(dirname "$0")/.."
FPID=$1
while kill -0 "$FPID" 2>/dev/null; do sleep 30; done

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

run_wd runs_r4/ballbalance.log \
  python train.py task=BallBalance seed=42 experiment=ballbalance_r4 \
    max_iterations=250

run_wd runs_r4/factoryscrew.log \
  python train.py task=FactoryTaskNutBoltScrew seed=42 experiment=factoryscrew_r4 \
    max_iterations=300

run_wd runs_r4/allegrolstm.log \
  python train.py task=AllegroHandLSTM seed=42 experiment=allegrolstm_r4 \
    max_iterations=1500

run_wd runs_r4/shadowff.log \
  python train.py task=ShadowHandOpenAI_FF seed=42 experiment=shadowff_r4 \
    max_iterations=1200

run_wd runs_r4/anymalterrain.log \
  python train.py task=AnymalTerrain seed=42 experiment=anymalterrain_r4 \
    max_iterations=1500

run_wd runs_r4/frankacollect.log \
  python train.py task=FrankaCollectMA seed=42 experiment=frankacollect_r4 \
    max_iterations=600

python scripts/bench_suite.py > runs_r4/bench_suite.log 2>&1
python bench.py > runs_r4/bench_headline.log 2>&1
python scripts/profile_floor.py > runs_r4/profile_floor.log 2>&1
echo done > runs_r4/queue3.done
