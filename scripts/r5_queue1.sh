#!/bin/bash
# Round-5 queue 1: the VERDICT items that need TPU campaigns, cheapest
# informative durations first where possible.  Each run picks up the code
# at its start time.
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

# 1. AllegroHandLSTM on the FIXED scene (cube finally in the hand) —
#    VERDICT #3.  ShadowHand's recipe showed succ rising by epoch 300.
run_wd runs_r5/allegrolstm.log \
  python train.py task=AllegroHandLSTM seed=42 experiment=allegrolstm_r5 \
    max_iterations=700

# 2. Screw extended campaign — the 600-epoch smoke showed steady reward
#    improvement (-180 -> -81) without the z-follow discovered yet.
run_wd runs_r5/factoryscrew_b.log \
  python train.py task=FactoryTaskNutBoltScrew seed=42 \
    experiment=factoryscrew_r5b max_iterations=2500

# 3. AnymalTerrain with terrain-normal wall support — VERDICT #4.
run_wd runs_r5/anymalterrain.log \
  python train.py task=AnymalTerrain seed=42 experiment=anymalterrain_r5 \
    max_iterations=1200

# 4. IndustReal Pegs first-ever training run — VERDICT #6.
run_wd runs_r5/industreal.log \
  python train.py task=IndustRealTaskPegsInsert seed=42 \
    experiment=industreal_r5 max_iterations=400

# 5. FrankaCubeStack breadth curve — VERDICT #9.
run_wd runs_r5/cubestack.log \
  python train.py task=FrankaCubeStack seed=42 experiment=cubestack_r5 \
    max_iterations=400

echo done > runs_r5/queue1.done
