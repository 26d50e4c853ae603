#!/bin/bash
# Round-4 final TPU queue: waits for the factory resume (PID arg), then
# BallBalance -> Screw -> fresh Factory pick (with table collision) ->
# trimmed AllegroHandLSTM -> trimmed ShadowHandOpenAI_FF -> bench refresh.
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

run_wd runs_r4/factorypick_d.log \
  python train.py task=FactoryTaskNutBoltPick seed=42 experiment=factorypick_r4d \
    num_envs=512 train.params.config.minibatch_size=2048 max_iterations=1500

run_wd runs_r4/allegrolstm.log \
  python train.py task=AllegroHandLSTM seed=42 experiment=allegrolstm_r4 \
    max_iterations=800

run_wd runs_r4/shadowff.log \
  python train.py task=ShadowHandOpenAI_FF seed=42 experiment=shadowff_r4 \
    max_iterations=800

python scripts/bench_suite.py > runs_r4/bench_suite.log 2>&1
python bench.py > runs_r4/bench_headline.log 2>&1
echo done > runs_r4/queue4.done
