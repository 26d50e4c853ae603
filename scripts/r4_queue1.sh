#!/bin/bash
# Round-4 TPU queue 1: factory pick scale-up -> AllegroHandLSTM campaign ->
# ShadowHandOpenAI_FF campaign -> BallBalance re-run -> Factory Screw probe.
cd "$(dirname "$0")/.."

python train.py task=FactoryTaskNutBoltPick seed=42 experiment=factorypick_r4b \
    num_envs=512 train.params.config.minibatch_size=2048 max_iterations=2048 \
    > runs_r4/factorypick_b.log 2>&1

python train.py task=AllegroHandLSTM seed=42 experiment=allegrolstm_r4 \
    max_iterations=2000 > runs_r4/allegrolstm.log 2>&1

python train.py task=ShadowHandOpenAI_FF seed=42 experiment=shadowff_r4 \
    max_iterations=1500 > runs_r4/shadowff.log 2>&1

python train.py task=BallBalance seed=42 experiment=ballbalance_r4 \
    max_iterations=250 > runs_r4/ballbalance.log 2>&1

python train.py task=FactoryTaskNutBoltScrew seed=42 experiment=factoryscrew_r4 \
    max_iterations=300 > runs_r4/factoryscrew.log 2>&1

echo done > runs_r4/queue1.done
