#!/bin/bash
# Round-3 TPU queue, part 4: after the tilted-palm AllegroHand run,
# Factory / FrankaReachMA / Dextreme-ADR demo / bench refresh.
cd "$(dirname "$0")/.."
G_PID=$(cat runs_r3/allegrohand.pid | awk '{print $2}')
while kill -0 "$G_PID" 2>/dev/null; do sleep 20; done

python train.py task=FactoryTaskNutBoltPick seed=42 experiment=factorypick_r3 \
    > runs_r3/factorypick.log 2>&1

python train.py task=FrankaReachMA seed=42 experiment=frankareachma_r3 \
    max_iterations=900 > runs_r3/frankareachma.log 2>&1

python train.py task=AllegroHandDextremeADR seed=42 experiment=dextremeadr_r3 \
    max_iterations=1000 \
    task.adr.adr_queue_threshold_length=64 \
    task.adr.adr_objective_threshold_low=0.005 \
    task.adr.adr_objective_threshold_high=0.05 \
    > runs_r3/dextremeadr.log 2>&1

python scripts/bench_suite.py > runs_r3/bench_suite.log 2>&1
python bench.py > runs_r3/bench_headline.log 2>&1

echo done > runs_r3/queue4.done
