"""FrankaReach — the fork's single-agent reach base (reference
tasks/franka_reach.py, 928 LoC; exports axisangle2quat reused by the MA tasks
— ours lives in ops/maths.py).  Realized as the MA task with one agent: same
scene (table + circle-of-one arm + target cubes), same OSC control and
inverse-square distance reward."""
from __future__ import annotations

from ..utils.config import deep_merge
from .franka_reach_ma import FrankaReachMA, TASK_CFG as MA_CFG

TASK_CFG = deep_merge(MA_CFG, {
    "name": "FrankaReach",
    "env": {"numEnvs": 4096, "numAgents": 1, "numTargets": 1},
})


class FrankaReach(FrankaReachMA):
    def __init__(self, cfg):
        cfg["env"]["numAgents"] = 1
        super().__init__(cfg)
