"""RL adapter layer (reference utils/rlgames_utils.py, 424 LoC).

The reference wraps tasks in rl_games ``IVecEnv`` adapters; our learner
consumes the functional task API directly, so these classes are thin
stateful shims kept for API parity — external code written against
``RLGPUEnv``/``get_rlgames_env_creator`` keeps working:

* :func:`multi_gpu_get_rank` (ref :44-50) -> jax process index,
* :func:`get_rlgames_env_creator` (ref :53-127) -> task-building closure,
* :class:`RLGPUEnv` (ref :242-297) -> stateful step/reset wrapper carrying the
  EnvState, exposing ``get_env_info()['agents']`` (the MA hook :263) and
  ``get/set_env_state`` checkpoint pass-through (:285-297),
* :class:`ComplexObsRLGPUEnv` (ref :300-424) -> dict-observation variant
  driven by an obs_spec (dextreme-style).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def multi_gpu_get_rank(multi_gpu: bool = True) -> int:
    return jax.process_index() if multi_gpu else 0


def get_rlgames_env_creator(seed, task_config, task_name, sim_device,
                            rl_device, graphics_device_id=0, headless=True,
                            multi_gpu=False, post_create_hook=None,
                            virtual_screen_capture=False, force_render=False):
    """Closure building the task (ref :53-127); device args are accepted for
    parity — all state lives on the JAX default device/mesh."""
    def create_rlgpu_env(**kwargs):
        from ..tasks import registry
        task = registry.create_task(task_name, task_config, seed=seed,
                                    headless=headless)
        env = RLGPUEnv(task, seed=seed)
        if post_create_hook is not None:
            post_create_hook()
        return env
    return create_rlgpu_env


class RLGPUEnv:
    """Stateful gym-style wrapper over the functional task API."""

    def __init__(self, task, seed: int = 42):
        self.task = task
        self._state = task.initial_state(jax.random.PRNGKey(seed))
        self._step = jax.jit(task.step)

    def step(self, actions):
        self._state, res = self._step(self._state, jnp.asarray(actions))
        obs = {"obs": res.obs}
        if res.states is not None:
            obs["states"] = res.states
        return obs, res.rew, res.reset, res.extras

    def reset(self):
        self._state, obs = self.task.reset(self._state)
        return {"obs": obs}

    def reset_done(self):
        """(vec_task.py:442-457) — returns obs + currently-done env ids."""
        import numpy as np
        done = np.nonzero(np.asarray(self._state.reset_buf))[0]
        obs = jnp.zeros((self.task.rl_games_batch, self.task.num_obs))
        return {"obs": obs}, done

    def get_number_of_agents(self) -> int:
        return self.task.num_agents

    def get_env_info(self) -> Dict[str, Any]:
        return self.task.get_env_info()

    def get_env_state(self):
        return self.task.get_env_state(self._state)

    def set_env_state(self, env_state):
        self._state = self.task.set_env_state(self._state, env_state)

    def set_train_info(self, env_frames, *args, **kwargs):
        self._state = self.task.set_train_info(self._state, env_frames)


class ComplexObsRLGPUEnv(RLGPUEnv):
    """Dict-observation wrapper driven by an obs_spec (ref :300-424)."""

    def __init__(self, task, obs_spec: Dict[str, dict], seed: int = 42):
        super().__init__(task, seed)
        self.obs_spec = obs_spec

    def _build(self, obs, states):
        out = {}
        for name, spec in self.obs_spec.items():
            names = spec.get("names", [name])
            parts = [obs if n == "obs" else states for n in names]
            out[name] = jnp.concatenate(parts, axis=-1) \
                if spec.get("concat", True) else parts[0]
        return out

    def step(self, actions):
        self._state, res = self._step(self._state, jnp.asarray(actions))
        return self._build(res.obs, res.states), res.rew, res.reset, res.extras
