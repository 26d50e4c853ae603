"""Learner-variant coverage: LSTM PPO, asymmetric central-value PPO, SAC —
driven by a tiny synthetic VecTask so the paths compile in seconds."""
import copy

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.learning.configs import train_default_config
from isaacgymenvs_ma_tpu.learning.ppo import PPOAgent


class _ToyState:
    pass


class ToyTask:
    """Point-mass target-reaching with privileged state (velocity)."""

    num_envs = 16
    num_obs = 4
    num_states = 6
    num_actions = 2
    num_agents = 1
    rl_games_batch = 16
    max_episode_length = 32
    dict_obs_cls = False
    randomizer = None

    def initial_state(self, key):
        return {"pos": jnp.zeros((16, 2)), "vel": jnp.zeros((16, 2)),
                "tgt": jax.random.normal(key, (16, 2)),
                "t": jnp.zeros(16, jnp.int32), "key": key}

    def reset(self, state):
        return state, jnp.zeros((16, self.num_obs), jnp.float32)

    def zero_actions(self):
        return jnp.zeros((16, 2), jnp.float32)

    def get_env_info(self):
        return {"action_space": (2,), "observation_space": (4,),
                "agents": 1, "state_space": (6,)}

    def get_env_state(self, state):
        return None

    def set_env_state(self, state, env_state):
        return state

    def set_train_info(self, state, frames):
        return state

    def step(self, state, actions):
        from isaacgymenvs_ma_tpu.tasks.base import StepResult
        vel = 0.9 * state["vel"] + 0.1 * jnp.clip(actions, -1, 1)
        pos = state["pos"] + 0.1 * vel
        t = state["t"] + 1
        rew = -jnp.linalg.norm(pos - state["tgt"], axis=-1)
        done = (t >= self.max_episode_length).astype(jnp.int32)
        key, k2 = jax.random.split(state["key"])
        tgt = jnp.where(done[:, None] > 0, jax.random.normal(k2, (16, 2)),
                        state["tgt"])
        pos = jnp.where(done[:, None] > 0, 0.0, pos)
        vel = jnp.where(done[:, None] > 0, 0.0, vel)
        t = jnp.where(done > 0, 0, t)
        obs = jnp.concatenate([pos, state["tgt"]], -1)
        states = jnp.concatenate([pos, vel, state["tgt"]], -1)
        new = {"pos": pos, "vel": vel, "tgt": tgt, "t": t, "key": key}
        return new, StepResult(obs=obs, states=states, rew=rew, reset=done,
                               extras={"time_outs": done.astype(bool)})


def _base_cfg(**over):
    cfg = train_default_config("Cartpole")
    c = cfg["params"]["config"]
    c["horizon_length"] = 8
    c["minibatch_size"] = 64
    c["mini_epochs"] = 2
    c.update(over)
    return cfg


def test_lstm_ppo_trains():
    cfg = _base_cfg(seq_len=4)
    cfg["params"]["network"]["rnn"] = {"name": "lstm", "units": 32,
                                       "layers": 1}
    agent = PPOAgent(ToyTask(), cfg, seed=0)
    assert agent.is_rnn
    st = agent.init()
    for _ in range(2):
        st, m = agent.train_epoch(st)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(st.params))
    # carry is threaded and non-degenerate after rollouts
    assert any(float(jnp.abs(c).max()) > 0 for c in jax.tree.leaves(st.carry))


def test_central_value_ppo_trains():
    cfg = _base_cfg()
    cfg["params"]["config"]["central_value_config"] = {
        "network": {"mlp": {"units": [32, 32]}}, "learning_rate": 1e-3}
    agent = PPOAgent(ToyTask(), cfg, seed=0)
    assert agent.use_central_value
    st = agent.init()
    for _ in range(2):
        st, m = agent.train_epoch(st)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(st.params))
    assert np.isfinite(float(m["mean_return"]))


def test_sac_trains_on_toy():
    from isaacgymenvs_ma_tpu.learning.sac import SACAgent
    cfg = train_default_config("AntSAC")
    c = cfg["params"]["config"]
    c["batch_size"] = 64
    c["num_steps_per_episode"] = 4
    c["replay_buffer_size"] = 1000
    cfg["params"]["network"]["mlp"]["units"] = [32, 32]
    agent = SACAgent(ToyTask(), cfg, seed=0)
    st = agent.init()
    for _ in range(3):
        st, m = agent.train_epoch(st)
    assert np.isfinite(float(m["critic_loss"]))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(st.actor_params))


def test_scalar_extras_aggregation():
    extras = {"time_outs": jnp.zeros(4, bool),
              "_internal": jnp.zeros(4),
              "consecutive_successes": jnp.asarray([1.0, 3.0, 5.0, 7.0]),
              "episode": {"rew_lin_vel": jnp.full(4, 2.0),
                          "rew_torque": jnp.full(4, -1.0)}}
    out = PPOAgent._scalar_extras(extras)
    assert set(out) == {"consecutive_successes", "episode/rew_lin_vel",
                        "episode/rew_torque"}
    assert float(out["consecutive_successes"]) == 4.0
    assert float(out["episode/rew_torque"]) == -1.0
