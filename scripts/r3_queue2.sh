#!/bin/bash
# Round-3 TPU queue, part 2 — waits for queue1, then Factory / FrankaReachMA /
# Dextreme-ADR adaptation demo.
cd "$(dirname "$0")/.."
while [ ! -f runs_r3/queue1.done ]; do sleep 30; done

python train.py task=FactoryTaskNutBoltPick seed=42 experiment=factorypick_r3 \
    > runs_r3/factorypick.log 2>&1

python train.py task=FrankaReachMA seed=42 experiment=frankareachma_r3 \
    > runs_r3/frankareachma.log 2>&1

# ADR-adaptation demo: reference mechanics, demo-scale objective thresholds
# (the reference's 5/20 consecutive-success gates need a policy the round
# does not yet have; the point here is the boundary-worker/queue/expansion
# machinery visibly adapting under a learning policy)
python train.py task=AllegroHandDextremeADR seed=42 experiment=dextremeadr_r3 \
    max_iterations=1200 \
    task.adr.adr_queue_threshold_length=64 \
    task.adr.adr_objective_threshold_low=0.005 \
    task.adr.adr_objective_threshold_high=0.05 \
    > runs_r3/dextremeadr.log 2>&1

echo done > runs_r3/queue2.done
