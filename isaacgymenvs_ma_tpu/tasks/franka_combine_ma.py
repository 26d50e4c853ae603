"""FrankaCombineMA — multi-agent cube stacking ("combine")
(reference tasks/franka_combine_MA.py, 1165 LoC) — act 7.

Agents bring their assigned cubes to a shared stack base.  The per-agent FSM
implements the first stages (approach -> hold -> lift, :565-612 — the later
stages are commented out in the reference too); the global FSM flags crowding
(gFSM == -1 when eef-eef or eef-other-cube distance <= 0.18, :614-640).
Obs (:74-84): all target poses (7T) + stack-base position (3) + all agent
poses (7K) + self block (rel(3)x2 + base pose(7)) + [FSM, FSM] + gFSM +
**agent-index** (the one-hot-style scalar id the combine variant adds).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import FIXED, GEOM_BOX, ModelBuilder, compose_scene
from ..physics.engine import Control, SimState
from ..utils.config import deep_merge
from .base import EnvState
from .franka_collect_ma import CollectTaskState
from .franka_ppma import DEST_SIZE, FrankaPPMA
from .franka_reach_ma import CUBE_SIZE, TABLE_SURFACE_Z, TASK_CFG as REACH_CFG

TASK_CFG = deep_merge(REACH_CFG, {
    "name": "FrankaCombineMA",
    "env": {"episodeLength": 300},
})

STACK_BASE = np.array([0.0, 0.4, TABLE_SURFACE_Z + DEST_SIZE / 2])


class FrankaCombineMA(FrankaPPMA):
    def _obs_dim(self, K, T):
        # (ref :74-84)
        return 7 * T + 3 + 7 * K + (3 + 3 + 7) + 2 + 1 + 1

    def _dest_positions(self, T):
        return np.tile(STACK_BASE, (T, 1))

    def post_physics(self, state: EnvState, out, actions):
        N, K, T = self.num_envs, self.num_agents, self.num_targets
        B = N * K
        eef_pos = out.body_pos[:, self.grip_bodies]
        eef_quat = out.body_quat[:, self.grip_bodies]
        cube = self._cube_positions(state.sim)
        cube_quat = jnp.stack([
            state.sim.q[:, int(self.cube_q_adr[t]) + 3: int(self.cube_q_adr[t]) + 7]
            for t in range(T)], 1)
        own, rel = self._assigned(eef_pos, cube)
        md = jnp.linalg.norm(rel, axis=-1)
        stack_rel = jnp.asarray(STACK_BASE, jnp.float32) - own
        gripper_closed = actions[:, 6].reshape(N, K) < 0.0

        # FSM stages 0-2 (ref :565-612; later stages commented out upstream)
        fsm = jnp.zeros_like(md, dtype=jnp.int32)
        on_cube = md <= (CUBE_SIZE * 0.5 * 0.9)
        fsm = jnp.where(on_cube, 1, fsm)
        fsm = jnp.where(on_cube & gripper_closed, 2, fsm)
        gfsm = self._gfsm_proximity(eef_pos, cube)

        all_target_pose = jnp.concatenate([cube, cube_quat], -1).reshape(N, 7 * T)
        stack_base = jnp.broadcast_to(jnp.asarray(STACK_BASE, jnp.float32), (N, 3))
        all_agent_pose = jnp.concatenate([eef_pos, eef_quat], -1).reshape(N, 7 * K)
        obs_env = jnp.repeat(
            jnp.concatenate([all_target_pose, stack_base, all_agent_pose], -1), K, 0)
        obs_self = jnp.concatenate([
            rel.reshape(B, 3), stack_rel.reshape(B, 3),
            jnp.tile(jnp.concatenate([self.base_pos, self.base_quat], -1), (N, 1)),
        ], -1)
        agent_idx = jnp.tile(jnp.arange(K, dtype=jnp.float32), (N,))
        obs_tail = jnp.concatenate([
            jnp.stack([fsm.reshape(B)] * 2, -1).astype(jnp.float32),
            gfsm.reshape(B, 1).astype(jnp.float32),
            agent_idx[:, None]], -1)
        obs = jnp.concatenate([obs_env, obs_self, obs_tail], -1)

        mdf = md.reshape(B)
        fsm_f = fsm.reshape(B)
        ga = actions[:, 6]
        dxy = jnp.linalg.norm(stack_rel[..., :2], axis=-1).reshape(B)
        r = jnp.zeros(B)
        r += jnp.where(fsm_f == 0, jnp.exp(-5.0 * mdf**2), 0.0)
        r += jnp.where(fsm_f == 1, jnp.exp(-1.0 * ga), 0.0)
        r += jnp.where(fsm_f == 2, jnp.exp(-5.0 * dxy**2), 0.0)
        r += fsm_f.astype(jnp.float32)
        r += jnp.where(gfsm.reshape(B) < 0, -1.0, 0.0)
        rew = jnp.maximum(r, 0.0)

        reset = jnp.where(state.progress >= self.max_episode_length - 1, 1, 0)
        task = CollectTaskState(actions=actions, fsm=fsm)
        return obs, None, rew, reset.astype(jnp.int32), task, {}
