#!/bin/bash
# Final: after the shadow extension (PID arg), refresh the bench suite.
cd "$(dirname "$0")/.."
FPID=$1
while kill -0 "$FPID" 2>/dev/null; do sleep 30; done
python scripts/bench_suite.py > runs_r4/bench_suite.log 2>&1
python bench.py > runs_r4/bench_headline.log 2>&1
echo done > runs_r4/queue6.done
python scripts/profile_floor.py > runs_r4/profile_floor.log 2>&1
echo done > runs_r4/queue6b.done
