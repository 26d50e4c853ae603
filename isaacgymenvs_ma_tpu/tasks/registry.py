"""Task registry (reference tasks/__init__.py:94-127 ``isaacgym_task_map``)."""
from __future__ import annotations

import importlib
from typing import Callable, Dict, Tuple

# name -> (module, class name); resolved lazily so each task's deps load on use
_TASKS: Dict[str, Tuple[str, str]] = {
    "Cartpole": (".cartpole", "Cartpole"),
    "Ant": (".ant", "Ant"),
    "Humanoid": (".humanoid", "Humanoid"),
    "BallBalance": (".ball_balance", "BallBalance"),
    "Anymal": (".anymal", "Anymal"),
    "AnymalTerrain": (".anymal_terrain", "AnymalTerrain"),
    "FrankaReach": (".franka_reach", "FrankaReach"),
    "FrankaReachMA": (".franka_reach_ma", "FrankaReachMA"),
    "FrankaCollectMA": (".franka_collect_ma", "FrankaCollectMA"),
    "FrankaPPMA": (".franka_ppma", "FrankaPPMA"),
    "FrankaCombineMA": (".franka_combine_ma", "FrankaCombineMA"),
    "FrankaCabinet": (".franka_cabinet", "FrankaCabinet"),
    "FrankaCubeStack": (".franka_cube_stack", "FrankaCubeStack"),
    "FrankaCubeStack2": (".franka_cube_stack2", "FrankaCubeStack2"),
    "ShadowHand": (".shadow_hand", "ShadowHand"),
    "AllegroHand": (".allegro_hand", "AllegroHand"),
    "AllegroHandDextremeManualDR": (".allegro_hand_dextreme",
                                    "AllegroHandDextremeManualDR"),
    "AllegroHandDextremeADR": (".allegro_hand_dextreme",
                               "AllegroHandDextremeADR"),
    # reference registry short names (tasks/__init__.py:98-99)
    "AllegroHandManualDR": (".allegro_hand_dextreme",
                            "AllegroHandDextremeManualDR"),
    "AllegroHandADR": (".allegro_hand_dextreme", "AllegroHandDextremeADR"),
    "Trifinger": (".trifinger", "Trifinger"),
    "FactoryTaskNutBoltPick": (".factory", "FactoryTaskNutBoltPick"),
    "FactoryTaskNutBoltPlace": (".factory", "FactoryTaskNutBoltPlace"),
    "FactoryTaskNutBoltScrew": (".factory", "FactoryTaskNutBoltScrew"),
    "FactoryTaskGears": (".factory", "FactoryTaskGears"),
    "FactoryTaskInsertion": (".factory", "FactoryTaskInsertion"),
    "IndustRealTaskPegsInsert": (".industreal", "IndustRealTaskPegsInsert"),
    "IndustRealTaskGearsInsert": (".industreal", "IndustRealTaskGearsInsert"),
    # subtask-resolver entries (reference tasks/__init__.py:65-90)
    "AllegroKuka": (".allegro_kuka", "resolve_allegro_kuka"),
    "AllegroKukaLSTM": (".allegro_kuka", "resolve_allegro_kuka"),
    "AllegroKukaTwoArms": (".allegro_kuka", "resolve_allegro_kuka_two_arms"),
    "AllegroKukaTwoArmsLSTM": (".allegro_kuka",
                               "resolve_allegro_kuka_two_arms"),
    "Ingenuity": (".ingenuity", "Ingenuity"),
    "Quadcopter": (".quadcopter", "Quadcopter"),
    "HumanoidAMP": (".humanoid_amp", "HumanoidAMP"),
}


# Config variants: reference cfg/task/<Variant>.yaml files whose ``name:``
# field (or Hydra ``defaults:`` list) points at a base task class.  Selecting
# ``task=<Variant>`` builds the base task with these deltas deep-merged over
# its defaults — the same resolution Hydra performs for e.g.
# ``task=ShadowHandOpenAI_FF`` (cfg/task/ShadowHandOpenAI_FF.yaml ->
# ``name: ShadowHand``).
_OPENAI_FF_DELTA = {
    "env": {
        "numEnvs": 16384, "episodeLength": 160, "resetTime": 8,
        "actionsMovingAverage": 0.3, "controlFrequencyInv": 3,
        "forceScale": 1.0, "fallPenalty": -50.0,
        "observationType": "openai", "asymmetric_observations": True,
        "successTolerance": 0.4, "maxConsecutiveSuccesses": 50,
        "averFactor": 0.1,
    },
    "task": {"randomize": True},
}
_ALLEGRO_LSTM_DELTA = {
    # cfg/task/AllegroHandLSTM.yaml (AllegroHandFF/LSTM_Big inherit it):
    # resetTime urgency + random object forces + per-env action smoothing +
    # capped consecutive successes at tolerance 0.4 — the reference's
    # actually-trainable Allegro recipe (the plain AllegroHand.yaml has
    # none of these and round 3's runs on it converged to hold-still)
    "env": {"numEnvs": 16384, "episodeLength": 320, "resetTime": 16,
            "controlFrequencyInv": 2, "forceScale": 2.0,
            "actionsMovingAverage": {"range": [0.15, 0.35],
                                     "schedule_steps": 1000_000},
            "successTolerance": 0.4, "maxConsecutiveSuccesses": 50,
            "fallPenalty": 0.0, "observationType": "full_no_vel",
            "asymmetric_observations": True},
}
_VARIANTS: Dict[str, Tuple[str, dict]] = {
    "ShadowHandOpenAI_FF": ("ShadowHand", _OPENAI_FF_DELTA),
    # cfg/task/ShadowHandOpenAI_LSTM.yaml: defaults: [ShadowHandOpenAI_FF]
    "ShadowHandOpenAI_LSTM": ("ShadowHand", _OPENAI_FF_DELTA),
    # cfg/task/ShadowHandTest.yaml: OpenAI_FF at 256 envs, long episodes,
    # no random object forces, success printing on
    "ShadowHandTest": ("ShadowHand", {
        "env": dict(_OPENAI_FF_DELTA["env"], numEnvs=256,
                    episodeLength=1600, resetTime=80, forceScale=0.0,
                    printNumSuccesses=True),
        "task": {"randomize": True},
    }),
    "AllegroHandLSTM": ("AllegroHand", _ALLEGRO_LSTM_DELTA),
    "AllegroHandFF": ("AllegroHand", _ALLEGRO_LSTM_DELTA),
    "AllegroHandLSTM_Big": ("AllegroHand", _ALLEGRO_LSTM_DELTA),
    # cfg/task/HumanoidAMPHands.yaml: hands added to contact bodies,
    # cartwheel motion
    "HumanoidAMPHands": ("HumanoidAMP", {
        "env": {"contactBodies": ["right_foot", "left_foot",
                                  "right_hand", "left_hand"],
                "motion_file": "amp_humanoid_cartwheel.npy"},
    }),
    # cfg/task/{Ant,Humanoid}SAC.yaml: pure defaults-inheritance of the task
    # config (only the train config differs)
    "AntSAC": ("Ant", {}),
    "HumanoidSAC": ("Humanoid", {}),
}

# Config-only groups: the reference ships these yamls as Hydra include bases
# (cfg/task/FactoryBase.yaml etc.) that tasks compose — they never appear in
# isaacgym_task_map.  Exposed here so task_default_config covers every
# cfg/task/*.yaml name.
_CONFIG_ONLY: Dict[str, Tuple[str, str]] = {
    "FactoryBase": (".factory", "FactoryTaskNutBoltPick"),
    "FactoryEnvNutBolt": (".factory", "FactoryTaskNutBoltPick"),
    "FactoryEnvGears": (".factory", "FactoryTaskGears"),
    "FactoryEnvInsertion": (".factory", "FactoryTaskInsertion"),
    "IndustRealBase": (".industreal", "IndustRealTaskPegsInsert"),
    "IndustRealEnvPegs": (".industreal", "IndustRealTaskPegsInsert"),
    "IndustRealEnvGears": (".industreal", "IndustRealTaskGearsInsert"),
}


def task_class(name: str):
    if name in _VARIANTS:
        name = _VARIANTS[name][0]
    if name not in _TASKS:
        if name in _CONFIG_ONLY:
            raise KeyError(
                f"'{name}' is a config-only group (Hydra include base); "
                f"select one of the concrete tasks instead")
        raise KeyError(f"unknown task '{name}'; known: {sorted(_TASKS)}")
    mod_name, cls_name = _TASKS[name]
    mod = importlib.import_module(mod_name, __package__)
    return getattr(mod, cls_name)


def _module_config(mod_name: str, name: str) -> dict:
    mod = importlib.import_module(mod_name, __package__)
    # multi-task modules export TASK_CFGS[name]; single-task use TASK_CFG
    cfgs = getattr(mod, "TASK_CFGS", None)
    if cfgs and name in cfgs:
        return cfgs[name]
    return mod.TASK_CFG


def task_default_config(name: str) -> dict:
    from ..utils.config import deep_merge

    if name in _VARIANTS:
        base, delta = _VARIANTS[name]
        return deep_merge(task_default_config(base), delta)
    if name in _CONFIG_ONLY:
        mod_name, cfg_key = _CONFIG_ONLY[name]
        return _module_config(mod_name, cfg_key)
    return _module_config(*_TASKS[name])


def task_names():
    return sorted(set(_TASKS) | set(_VARIANTS))


def create_task(name: str, cfg: dict, seed: int = 42, headless: bool = True):
    cls = task_class(name)
    return cls(cfg)
