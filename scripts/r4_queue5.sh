#!/bin/bash
# Round-4 queue 5: after factory_d (PID arg) -> Screw retry -> AllegroHandLSTM
# -> ShadowHandOpenAI_FF -> bench refresh.
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

run_wd runs_r4/factoryscrew_b.log \
  python train.py task=FactoryTaskNutBoltScrew seed=42 experiment=factoryscrew_r4b \
    max_iterations=300

run_wd runs_r4/allegrolstm.log \
  python train.py task=AllegroHandLSTM seed=42 experiment=allegrolstm_r4 \
    max_iterations=800

run_wd runs_r4/shadowff.log \
  python train.py task=ShadowHandOpenAI_FF seed=42 experiment=shadowff_r4 \
    max_iterations=800

python scripts/bench_suite.py > runs_r4/bench_suite.log 2>&1
python bench.py > runs_r4/bench_headline.log 2>&1
echo done > runs_r4/queue5.done
