#!/bin/bash
# Round-3 sequential TPU training queue (one chip — runs must not overlap).
cd "$(dirname "$0")/.."
D_PID=$(cat runs_r3/allegrohand.pid | awk '{print $2}')
while kill -0 "$D_PID" 2>/dev/null; do sleep 20; done

python train.py task=AnymalTerrain seed=42 experiment=anymalterrain_r3 \
    > runs_r3/anymalterrain.log 2>&1

python train.py task=AllegroHand seed=42 experiment=allegrohand_r3e \
    num_envs=16384 > runs_r3/allegrohand_e.log 2>&1

python train.py task=HumanoidAMP seed=42 experiment=humanoidamp_r3 \
    > runs_r3/humanoidamp.log 2>&1

echo "queue1 done" > runs_r3/queue1.done
