"""PBT protocol tests: checkpoint/meta exchange, replacement decision,
mutation operators (no process restart — the exec is stubbed)."""
import json
import os

import pytest

from isaacgymenvs_ma_tpu.pbt.mutation import (mutate, mutate_discount,
                                              mutate_eps_clip,
                                              mutate_mini_epochs)
from isaacgymenvs_ma_tpu.pbt.pbt import PbtAlgoObserver, PbtParams


def test_mutation_operators():
    import random
    random.seed(0)
    for _ in range(50):
        g = mutate_discount(0.99)
        assert 0.9 < g < 0.9999
        e = mutate_eps_clip(0.2)
        assert 0.02 <= e <= 0.4
        m = mutate_mini_epochs(4)
        assert 1 <= m <= 12
    p = mutate({"learning_rate": 3e-4, "gamma": 0.99},
               {"learning_rate": "mutate_float", "gamma": "mutate_discount"},
               1.0, 1.1, 1.5)
    assert p["learning_rate"] != 3e-4 and p["gamma"] != 0.99


def make_observer(tmp_path, idx, num=4):
    cfg = {"pbt": {
        "enabled": True, "policy_idx": idx, "num_policies": num,
        "workspace": str(tmp_path), "interval_steps": 100,
        "start_after": 0, "initial_delay": 0,
        "replace_fraction_worst": 0.25, "replace_fraction_best": 0.5,
        "replace_threshold_frac_std": 0.1,
        "params": {"learning_rate": 3e-4},
    }}
    train_cfg = {"params": {"config": {"learning_rate": 3e-4}}}
    saved = {}
    obs = PbtAlgoObserver(cfg, train_cfg,
                          checkpoint_fn=lambda p: open(p, "w").write("x"),
                          restore_fn=lambda p: None)
    restarts = []
    obs._restart = lambda ckpt, params: restarts.append((ckpt, params))
    return obs, restarts


def test_pbt_replacement(tmp_path):
    observers = []
    for i in range(4):
        obs, restarts = make_observer(tmp_path, i)
        observers.append((obs, restarts))
    # everyone checkpoints with different objectives; policy 0 is worst
    objectives = [1.0, 5.0, 6.0, 7.0]
    for (obs, _), o in zip(observers, objectives):
        obs.after_steps(1, 200, {"true_objective": o})
    # second interval: policy 0 should decide to replace itself
    obs0, restarts0 = observers[0]
    obs0.after_steps(2, 400, {"true_objective": 1.0})
    assert restarts0, "worst policy did not restart"
    ckpt, params = restarts0[0]
    assert os.path.exists(ckpt)
    # best policy never restarts
    obs3, restarts3 = observers[3]
    obs3.after_steps(2, 400, {"true_objective": 7.0})
    assert not restarts3


def test_launcher_param_grid_and_population():
    """Launcher surface (reference pbt/launcher/run_description.py,
    run_processes.py): grid generation and PBT population commands."""
    from isaacgymenvs_ma_tpu.pbt.launcher import (
        ParamGrid, ParamList, Experiment, RunDescription, pbt_population)

    grid = ParamGrid([("lr", [1e-4, 3e-4]), ("gamma", [0.99, 0.995])])
    combos = list(grid.generate_params())
    assert len(combos) == 4 and combos[0] == {"lr": 1e-4, "gamma": 0.99}

    e = Experiment("sweep", "python train.py task=Ant", grid)
    cmds = list(e.generate_experiments())
    assert len(cmds) == 4
    assert cmds[1][0].endswith("lr=0.0001 gamma=0.995")

    rd = pbt_population("Ant", 3, "/tmp/ws", ["num_envs=64"])
    cmds = list(rd.generate_experiments())
    assert len(cmds) == 3
    assert "pbt.policy_idx=2" in cmds[2][0]
    assert "pbt.num_policies=3" in cmds[0][0]
    assert "num_envs=64" in cmds[0][0]

    # ParamList passthrough
    pl = ParamList([{"a": 1}, {"a": 2}])
    assert [p["a"] for p in pl.generate_params()] == [1, 2]
