"""Multi-device sharding: PPO epoch over an 8-device env mesh, incl. the MA
batch-folded layout (SURVEY §7 step 8 / BASELINE config 5)."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.learning.configs import train_default_config
from isaacgymenvs_ma_tpu.learning.ppo import PPOAgent
from isaacgymenvs_ma_tpu.parallel import mesh as pmesh


def test_mesh_has_8_devices():
    m = pmesh.make_mesh()
    assert m.devices.size == 8


def test_sharded_ppo_epoch_cartpole():
    from isaacgymenvs_ma_tpu.tasks.cartpole import Cartpole, TASK_CFG
    cfg = copy.deepcopy(TASK_CFG)
    cfg["env"]["numEnvs"] = 64
    task = Cartpole(cfg)
    tcfg = train_default_config("Cartpole")
    tcfg["params"]["config"]["horizon_length"] = 8
    tcfg["params"]["config"]["minibatch_size"] = 128
    agent = PPOAgent(task, tcfg, seed=0)
    state = agent.init()
    m = pmesh.make_mesh()
    state = pmesh.shard_batch_pytree(
        state, m, batch_sizes=(task.num_envs, task.rl_games_batch))
    state, metrics = agent.train_epoch(state)
    assert np.isfinite(float(metrics["mean_return"]))
    # env-batch leaves stay sharded across the mesh after the epoch
    q = state.env_state.sim.q
    assert len(q.sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_ma_task_step():
    """FrankaReachMA with agents folded into the batch axis, env axis
    sharded over the mesh."""
    from isaacgymenvs_ma_tpu.tasks.registry import (create_task,
                                                    task_default_config)
    cfg = copy.deepcopy(task_default_config("FrankaReachMA"))
    cfg["env"]["numEnvs"] = 8
    cfg["env"]["numAgents"] = 2
    task = create_task("FrankaReachMA", cfg)
    state = task.initial_state(jax.random.PRNGKey(0))
    m = pmesh.make_mesh()
    state = pmesh.shard_batch_pytree(
        state, m, batch_sizes=(task.num_envs, task.rl_games_batch))
    step = jax.jit(task.step)
    state, res = step(state, task.zero_actions())
    assert res.obs.shape == (16, task.num_obs)   # N*K rows
    assert np.isfinite(np.asarray(res.obs)).all()
    assert len(state.sim.q.sharding.device_set) == 8
