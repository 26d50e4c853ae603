"""Checkpoint save/restore (rl_games ``.pth`` checkpoint equivalent).

The reference saves model weights + optimizer + frame counter + running
mean/std into ``runs/<exp>/nn/*.pth`` every ``save_frequency`` epochs and
restores via ``checkpoint=`` (SURVEY.md §5; cfg/train/AntPPO.yaml:36-38).
Here the whole :class:`PPOState` pytree (params, optimizer, normalizers,
LR, counters) serializes with flax msgpack; env curriculum state
(``get_env_state``/``set_env_state`` — vec_task.py:197-205) rides along,
so ADR ranges / tolerance curricula resume exactly.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, state, env_state_extra: Any = None,
                    meta: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.device_get(state)
    payload = {
        "ppo_state": serialization.to_bytes(host_state),
        "env_state_extra": env_state_extra,
        "meta": meta or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, template_state):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = serialization.from_bytes(template_state, payload["ppo_state"])
    return state, payload.get("env_state_extra"), payload.get("meta", {})
