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


def task_class(name: str):
    if name not in _TASKS:
        raise KeyError(f"unknown task '{name}'; known: {sorted(_TASKS)}")
    mod_name, cls_name = _TASKS[name]
    mod = importlib.import_module(mod_name, __package__)
    return getattr(mod, cls_name)


def task_default_config(name: str) -> dict:
    mod_name, _ = _TASKS[name]
    mod = importlib.import_module(mod_name, __package__)
    # multi-task modules export TASK_CFGS[name]; single-task use TASK_CFG
    cfgs = getattr(mod, "TASK_CFGS", None)
    if cfgs and name in cfgs:
        return cfgs[name]
    return mod.TASK_CFG


def task_names():
    return sorted(_TASKS)


def create_task(name: str, cfg: dict, seed: int = 42, headless: bool = True):
    cls = task_class(name)
    return cls(cfg)
