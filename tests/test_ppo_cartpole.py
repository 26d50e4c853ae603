"""End-to-end learning test: PPO trains Cartpole to balance.

This is the reference's de-facto validation ("Cartpole should train in a few
seconds", README.md:63) turned into an automated regression: with 256 envs on
CPU, mean episode reward must clear a threshold within a small epoch budget.
"""
import jax
import numpy as np

from isaacgymenvs_ma_tpu.tasks.cartpole import Cartpole, TASK_CFG
from isaacgymenvs_ma_tpu.utils.config import deep_merge
from isaacgymenvs_ma_tpu.learning.configs import train_default_config
from isaacgymenvs_ma_tpu.learning.ppo import PPOAgent


def test_ppo_learns_cartpole():
    cfg = deep_merge(TASK_CFG, {"env": {"numEnvs": 256}})
    task = Cartpole(cfg)
    tcfg = train_default_config("Cartpole")
    tcfg["params"]["config"]["minibatch_size"] = 2048  # 256 envs * 16 horizon / 2
    agent = PPOAgent(task, tcfg, seed=7)
    state = agent.init()
    best = -1e9
    for ep in range(60):
        state, metrics = agent.train_epoch(state)
        if (ep + 1) % 10 == 0:
            mr = float(metrics["mean_return"])
            best = max(best, mr)
            print("epoch", ep + 1, "mean_return", mr)
    # reward ~1/step when balancing; episodes cap at 500 steps -> returns
    # in the hundreds once balanced. Require clear learning progress.
    assert best > 100.0, best
