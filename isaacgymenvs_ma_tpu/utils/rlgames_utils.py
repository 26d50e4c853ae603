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
        self._reset_done = jax.jit(task.reset_done)

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
        """(vec_task.py:442-457) — reset the done envs, return their fresh
        observations plus the done env ids (the AMP/common_agent contract)."""
        import numpy as np
        done = np.nonzero(np.asarray(self._state.reset_buf))[0]
        self._state, obs, states = self._reset_done(self._state)
        obs_dict = {"obs": obs}
        if states is not None:
            obs_dict["states"] = states
        return obs_dict, done

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
    """Dict-observation wrapper driven by an obs_spec (ref :300-424).

    Full reference semantics: each ``obs_spec`` entry is
    ``{out_name: {"names": [part, ...], "concat": bool, "space_name": str}}``.
    Named parts resolve against the task's declared observation groups
    (dextreme-style ``obs_spec``/``state_spec`` via ``split_obs`` /
    ``split_states``) plus the flat ``obs``/``states`` tensors; ``concat``
    concatenates parts into one ``(B, sum)`` tensor (ref ``gen_obs_dict``
    :383-388), otherwise the entry stays a per-name dict.  ``space_name``
    keys the constructed space into ``get_env_info()`` (ref ``gen_obs_space``
    :391-403).
    """

    def __init__(self, task, obs_spec: Dict[str, dict], seed: int = 42):
        super().__init__(task, seed)
        self.obs_spec = obs_spec
        sizes = {"obs": task.num_obs, "states": task.num_states}
        for name, size in (getattr(task, "obs_spec", None) or []):
            sizes[name] = size
        for name, size in (getattr(task, "state_spec", None) or []):
            sizes.setdefault(name, size)
        self._part_sizes = sizes

    def _env_obs(self, obs, states) -> Dict[str, Any]:
        """Named observation parts as the reference env would emit them."""
        parts: Dict[str, Any] = {"obs": obs}
        if states is not None:
            parts["states"] = states
        t = self.task
        if getattr(t, "dict_obs_cls", False) and getattr(t, "obs_spec", None):
            parts.update(t.split_obs(obs))
            if states is not None and getattr(t, "state_spec", None):
                for k, v in t.split_states(states).items():
                    parts.setdefault(k, v)
        return parts

    def _build(self, obs, states):
        parts = self._env_obs(obs, states)
        out = {}
        for name, spec in self.obs_spec.items():
            names = spec.get("names", [name])
            missing = [n for n in names if n not in parts]
            if missing:
                raise KeyError(
                    f"obs_spec entry {name!r} references unknown observation "
                    f"parts {missing}; available: {sorted(parts)}")
            if spec.get("concat", True):
                out[name] = jnp.concatenate([parts[n] for n in names], -1)
            else:
                out[name] = {n: parts[n] for n in names}
        return out

    def step(self, actions):
        self._state, res = self._step(self._state, jnp.asarray(actions))
        return self._build(res.obs, res.states), res.rew, res.reset, res.extras

    def reset(self):
        self._state, obs = self.task.reset(self._state)
        states = jnp.zeros((self.task.rl_games_batch, self.task.num_states)) \
            if self.task.num_states > 0 else None
        return self._build(obs, states)

    def reset_done(self):
        import numpy as np
        done = np.nonzero(np.asarray(self._state.reset_buf))[0]
        self._state, obs, states = self._reset_done(self._state)
        return self._build(obs, states), done

    def get_env_info(self) -> Dict[str, Any]:
        info = dict(self.task.get_env_info())
        for name, spec in self.obs_spec.items():
            names = spec.get("names", [name])
            space_name = spec.get(
                "space_name",
                "observation_space" if name == "obs" else f"{name}_space")
            if spec.get("concat", True):
                info[space_name] = (sum(self._part_sizes[n] for n in names),)
            else:
                info[space_name] = {n: (self._part_sizes[n],) for n in names}
        return info
