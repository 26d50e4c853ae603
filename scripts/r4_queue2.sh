#!/bin/bash
# Round-4 TPU queue 2 (after queue 1): AnymalTerrain per-kind diagnosis run,
# FrankaCollectMA behavioral run, bench refresh.
cd "$(dirname "$0")/.."
while [ ! -f runs_r4/queue1.done ]; do sleep 30; done

python train.py task=AnymalTerrain seed=42 experiment=anymalterrain_r4 \
    max_iterations=1500 > runs_r4/anymalterrain.log 2>&1

python train.py task=FrankaCollectMA seed=42 experiment=frankacollect_r4 \
    max_iterations=600 > runs_r4/frankacollect.log 2>&1

python scripts/bench_suite.py > runs_r4/bench_suite.log 2>&1
python bench.py > runs_r4/bench_headline.log 2>&1

echo done > runs_r4/queue2.done
# appended: perf-floor breakdown after the bench refresh (VERDICT weak #5)
python scripts/profile_floor.py > runs_r4/profile_floor.log 2>&1
echo done > runs_r4/queue2b.done
