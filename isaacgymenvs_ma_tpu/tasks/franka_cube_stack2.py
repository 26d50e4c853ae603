"""FrankaCubeStack2 (reference tasks/franka_cube_stack2.py, 850 LoC) — the
fork's modified cube-stack: a 7-stage FSM drives staged shaped rewards and
appears in the observations.

Differences from FrankaCubeStack that this class mirrors:

* obs 21 = [eef_quat(4), eef_pos(3), cubeA_pos_relative(3), cubeA_height(1),
  cubeA_quat(4), cubeA_to_cubeB_pos(3), q_gripper(2), FSM_p(1)=2^FSM]
  (ref compute_observations :330-335),
* FSM (ref :276-292): 0 approach -> 1 on-cubeA -> 2 +gripper closed ->
  3 lifted -> 4 aligned over cubeB -> 5 super close -> 6 released,
* staged reward (ref compute_franka_reward :482-530): per-state shaped
  terms (inverse-square reach, tanh close/open-gripper, height ratio,
  tanh target-distance) + the FSM index itself as progress reward +
  a +10 bonus in state 6; clipped at 0; reset only on timeout,
* OSC command limit raised to 0.55 on all axes (ref :97), cubeA spawn
  gets a random z lift up to 0.5 m (ref :396-398), no min-distance
  rejection sampling (ref :401 ``pass``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import deep_merge
from .base import EnvState
from .franka_cube_stack import (CUBE_A, CUBE_B, CubeStackTaskState,
                                FrankaCubeStack, TASK_CFG as STACK_CFG)
from .franka_reach_ma import TABLE_SURFACE_Z

TASK_CFG = deep_merge(STACK_CFG, {
    "name": "FrankaCubeStack2",
    "env": {"cubeSpawnZRange": 0.5, "oscCmdLimit": 0.55},
})


class FrankaCubeStack2(FrankaCubeStack):
    def _obs_dim(self, K, T):
        return 21  # 14 + 3 + 4 (ref :52)

    def __init__(self, cfg):
        super().__init__(cfg)
        # ref :97 — uniform 0.55 command limit in OSC mode
        lim = float(cfg["env"].get("oscCmdLimit", 0.55))
        self.cmd_limit = jnp.full((6,), lim, jnp.float32)
        self.spawn_z_range = float(cfg["env"].get("cubeSpawnZRange", 0.5))

    def _fsm(self, d, cubeA_height, cubeA_to_cubeB, actions):
        """7-state stacking FSM (ref FSM :276-292)."""
        z = jnp.zeros_like(d, jnp.int32)
        on_cubeA = d <= (CUBE_A / 2) * 0.9
        closed = actions[:, -1] < 0
        lifted = cubeA_height >= (CUBE_B + CUBE_A * 0.5)
        aligned = jnp.linalg.norm(cubeA_to_cubeB[:, :2], axis=-1) \
            <= CUBE_A * 0.5
        super_close = jnp.linalg.norm(cubeA_to_cubeB, axis=-1) \
            < (CUBE_A * 0.7071 + CUBE_B * 0.5)
        opened = ~closed
        fsm = jnp.where(on_cubeA, 1, z)
        fsm = jnp.where(on_cubeA & closed, 2, fsm)
        fsm = jnp.where(on_cubeA & closed & lifted, 3, fsm)
        fsm = jnp.where(aligned, 4, fsm)
        fsm = jnp.where(aligned & super_close, 5, fsm)
        fsm = jnp.where(aligned & super_close & opened, 6, fsm)
        return fsm

    def reset_idx(self, sim, task, mask, key):
        sim, task = super().reset_idx(sim, task, mask, key)
        # cubeA random z lift (ref :396-398)
        n = self.num_envs
        kz = jax.random.fold_in(key, 77)
        qa = int(self.cube_q_adr[0])
        dz = self.spawn_z_range * jax.random.uniform(kz, (n,))
        q = sim.q.at[:, qa + 2].set(
            jnp.where(mask, sim.q[:, qa + 2] + dz, sim.q[:, qa + 2]))
        return sim._replace(q=q), task

    def post_physics(self, state: EnvState, out, actions):
        n = self.num_envs
        eef_pos = out.body_pos[:, self.grip_bodies[0]]
        eef_quat = out.body_quat[:, self.grip_bodies[0]]
        qa_a, qa_b = int(self.cube_q_adr[0]), int(self.cube_q_adr[1])
        cubeA_pos = state.sim.q[:, qa_a: qa_a + 3]
        cubeA_quat = state.sim.q[:, qa_a + 3: qa_a + 7]
        cubeB_pos = state.sim.q[:, qa_b: qa_b + 3]
        cubeA_rel = cubeA_pos - eef_pos
        cubeA_to_cubeB = cubeB_pos - cubeA_pos
        cubeA_height = cubeA_pos[:, 2] - TABLE_SURFACE_Z
        gq = self.engine.dof_qid[self.gripper_dofs[0]]
        gripper_q = state.sim.q[:, gq]
        d = jnp.linalg.norm(cubeA_rel, axis=-1)

        fsm = self._fsm(d, cubeA_height, cubeA_to_cubeB, actions)
        fsm_p = jnp.power(2.0, fsm.astype(jnp.float32))

        obs = jnp.concatenate([
            eef_quat, eef_pos, cubeA_rel, cubeA_height[:, None],
            cubeA_quat, cubeA_to_cubeB, gripper_q, fsm_p[:, None]], -1)

        # staged reward (ref compute_franka_reward :482-530)
        a_grip = actions[:, -1]
        zero = jnp.zeros_like(d)
        rew = zero
        dist_reward = 1.0 / (0.5 + d ** 2) * 0.5
        rew += jnp.where(fsm == 0, dist_reward, zero)
        close_reward = jnp.clip(jnp.tanh(-a_grip * 3.0), 0.0, None)
        rew += jnp.where(fsm == 1, (dist_reward + close_reward) / 2, zero)
        h_reward = jnp.clip(cubeA_height / 0.095, None, 1.0)
        rew += jnp.where(fsm == 2, h_reward, zero)
        target_delta = cubeA_to_cubeB.at[:, 2].add((CUBE_A + CUBE_B) / 2.0)
        target_dist = jnp.linalg.norm(target_delta, axis=-1)
        rew += jnp.where(fsm == 3, jnp.tanh(5.0 * -target_dist) + 1.0, zero)
        rew += jnp.where(fsm == 4, jnp.tanh(6.0 * -target_dist) + 1.0, zero)
        open_reward = jnp.tanh(a_grip * 7.0) + 1.0
        rew += jnp.where(fsm == 5, open_reward, zero)
        rew += jnp.where(fsm == 6, jnp.tanh(7.0 * d) + 10.0, zero)
        rew += fsm.astype(jnp.float32)          # progress term
        rew = jnp.clip(rew, 0.0, None)

        reset = (state.progress >= self.max_episode_length - 1).astype(
            jnp.int32)
        task = CubeStackTaskState(actions=actions)
        extras = {"mean_cube_height": jnp.mean(cubeA_height),
                  "target_dist": jnp.mean(target_dist),
                  "fsm_mean": jnp.mean(fsm.astype(jnp.float32))}
        return obs, None, rew, reset, task, extras
