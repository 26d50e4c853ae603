#!/bin/bash
# Round-3 TPU queue, part 3: tolerance-0.4 AllegroHand (the reference's
# OpenAI-variant TRAINING tolerance, cfg/task/ShadowHandOpenAI_FF.yaml:50 —
# at 0.4 the reach-goal bonus is visible from the first epochs), then the
# manipulation/MA/ADR runs, then the bench refresh.
cd "$(dirname "$0")/.."
while [ ! -f runs_r3/queue1.done ]; do sleep 30; done

python train.py task=AllegroHand seed=42 experiment=allegrohand_r3f \
    num_envs=16384 task.env.successTolerance=0.4 \
    > runs_r3/allegrohand_f.log 2>&1

python train.py task=FactoryTaskNutBoltPick seed=42 experiment=factorypick_r3 \
    > runs_r3/factorypick.log 2>&1

python train.py task=FrankaReachMA seed=42 experiment=frankareachma_r3 \
    > runs_r3/frankareachma.log 2>&1

# ADR-adaptation demo: reference mechanics, demo-scale objective thresholds
python train.py task=AllegroHandDextremeADR seed=42 experiment=dextremeadr_r3 \
    max_iterations=1200 \
    task.adr.adr_queue_threshold_length=64 \
    task.adr.adr_objective_threshold_low=0.005 \
    task.adr.adr_objective_threshold_high=0.05 \
    > runs_r3/dextremeadr.log 2>&1

python scripts/bench_suite.py > runs_r3/bench_suite.log 2>&1
python bench.py > runs_r3/bench_headline.log 2>&1

echo done > runs_r3/queue3.done
