"""FrankaCubeStack (reference tasks/franka_cube_stack.py, 747 LoC) —
obs 19 (osc) / act 7.

Single Franka stacks cubeA (0.050) onto cubeB (0.070): OSC control + the
states-dict pattern the MA tasks copied.  Obs (osc): [cubeA_quat, cubeA_pos,
cubeA_to_cubeB, eef_pos, eef_quat, gripper q(2)] (ref :105-107, :500-520).
Reward kernel mirrored exactly (:660-717): tanh-shaped reach (eef + both
fingers), lift bonus, align-over-cubeB with max(dist, align) merging, sparse
stack bonus 16 with gripper-away condition; episode resets on stack success.
The fork's FrankaCubeStack2 variant (tasks/franka_cube_stack2.py) differs
only in tuning; this class serves both registry entries.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..physics.engine import Control, PhysicsEngine
from ..utils.config import deep_merge
from .base import EnvState
from .franka_reach_ma import (TABLE_SURFACE_Z, FrankaReachMA,
                              TASK_CFG as REACH_CFG)

TASK_CFG = deep_merge(REACH_CFG, {
    "name": "FrankaCubeStack",
    "env": {"numEnvs": 8192, "numAgents": 1, "numTargets": 2,
            "episodeLength": 300},
})

CUBE_A = 0.050
CUBE_B = 0.070


class CubeStackTaskState(NamedTuple):
    actions: jax.Array


class FrankaCubeStack(FrankaReachMA):
    NUM_ACTIONS = 7

    def _obs_dim(self, K, T):
        return 19  # (ref :105-107, control_type osc)

    def __init__(self, cfg):
        cfg["env"]["numAgents"] = 1
        cfg["env"]["numTargets"] = 2
        super().__init__(cfg)
        m = self.model
        self.finger_bodies = np.asarray(
            [i for i, n in enumerate(m.body_names)
             if n in ("panda_leftfinger", "panda_rightfinger")], np.int32)

    def create_model(self):
        model, ground = super().create_model()
        # resize the two cubes (parent builds uniform 0.05 cubes)
        sizes = [CUBE_A, CUBE_B]
        for g, size in zip([g for g in model.geoms if g.name == "cubeA_geom"],
                           sizes):
            g.size = np.full(3, size / 2)
        return model, ground

    def build_engine(self, model, ground):
        names = [g.name for g in model.geoms]
        table_geoms = [i for i, g in enumerate(model.geoms) if g.name == "table_top"]
        cube_geoms = [i for i, g in enumerate(model.geoms) if g.name == "cubeA_geom"]
        pairs = [(c, table_geoms[0]) for c in cube_geoms]
        pairs.append((cube_geoms[0], cube_geoms[1]))  # cubeA corners vs cubeB
        # grab: grip site <-> cubeA (gripper-suction grasp approximation)
        grabs = [(self._grip_bodies[0], (0, 0, 0), self._cube_bodies_list()[0],
                  (0, 0, 0))]
        return PhysicsEngine(model, self.sim_params, ground=ground,
                             pair_specs=pairs, grabs=grabs)

    def _cube_bodies_list(self):
        return [i for i, n in enumerate(self.model.body_names) if n == "cubeA"]

    def initial_task_state(self):
        return CubeStackTaskState(
            actions=jnp.zeros((self.rl_games_batch, 7), jnp.float32))

    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        ctrl = FrankaReachMA.pre_physics(self, state, actions)
        # gripper open/close (ref :585-600 u_fingers)
        grip_target = jnp.where(actions[:, 6] >= 0.0, 0.035, 0.0)
        pos_target = ctrl.pos_target
        for d in self.gripper_dofs[0]:
            pos_target = pos_target.at[:, d].set(grip_target)
        # grasp: pin cubeA to the grip site when close and closed
        bx, _ = self.engine.fk(state.sim.q)
        eef = bx[:, self.grip_bodies[0]]
        qa_a = int(self.cube_q_adr[0])
        cubeA = state.sim.q[:, qa_a: qa_a + 3]
        holding = (jnp.linalg.norm(cubeA - eef, axis=-1) < 0.04) \
            & (actions[:, 6] < 0.0)
        return ctrl._replace(pos_target=pos_target,
                             grab_active=holding[:, None].astype(jnp.float32))

    def post_physics(self, state: EnvState, out, actions):
        n = self.num_envs
        eef_pos = out.body_pos[:, self.grip_bodies[0]]
        eef_quat = out.body_quat[:, self.grip_bodies[0]]
        lf_pos = out.body_pos[:, self.finger_bodies[0]]
        rf_pos = out.body_pos[:, self.finger_bodies[1]]
        qa_a, qa_b = int(self.cube_q_adr[0]), int(self.cube_q_adr[1])
        cubeA_pos = state.sim.q[:, qa_a: qa_a + 3]
        cubeA_quat = state.sim.q[:, qa_a + 3: qa_a + 7]
        cubeB_pos = state.sim.q[:, qa_b: qa_b + 3]
        cubeA_to_cubeB = cubeB_pos - cubeA_pos
        cubeA_rel = cubeA_pos - eef_pos
        gq = self.engine.dof_qid[self.gripper_dofs[0]]
        gripper_q = state.sim.q[:, gq]

        obs = jnp.concatenate([
            cubeA_quat, cubeA_pos, cubeA_to_cubeB, eef_pos, eef_quat,
            gripper_q], -1)

        # reward kernel (ref :660-717)
        table_height = TABLE_SURFACE_Z
        target_height = CUBE_B + CUBE_A / 2.0
        d = jnp.linalg.norm(cubeA_rel, axis=-1)
        d_lf = jnp.linalg.norm(cubeA_pos - lf_pos, axis=-1)
        d_rf = jnp.linalg.norm(cubeA_pos - rf_pos, axis=-1)
        dist_reward = 1 - jnp.tanh(10.0 * (d + d_lf + d_rf) / 3)
        cubeA_height = cubeA_pos[:, 2] - table_height
        lifted = (cubeA_height - CUBE_A) > 0.04
        offset = jnp.zeros_like(cubeA_to_cubeB).at[:, 2].set((CUBE_A + CUBE_B) / 2)
        d_ab = jnp.linalg.norm(cubeA_to_cubeB + offset, axis=-1)
        align_reward = (1 - jnp.tanh(10.0 * d_ab)) * lifted
        dist_reward = jnp.maximum(dist_reward, align_reward)
        aligned = jnp.linalg.norm(cubeA_to_cubeB[:, :2], axis=-1) < 0.02
        on_top = jnp.abs(cubeA_height - target_height) < 0.02
        away = d > 0.04
        stack = aligned & on_top & away
        rs = self.cfg["env"]
        rewards = jnp.where(
            stack, float(rs["stackRewardScale"]) * stack,
            float(rs["distRewardScale"]) * dist_reward
            + float(rs["liftRewardScale"]) * lifted
            + float(rs["alignRewardScale"]) * align_reward)
        reset = jnp.where(
            (state.progress >= self.max_episode_length - 1) | stack, 1, 0)
        task = CubeStackTaskState(actions=actions)
        return obs, None, rewards, reset.astype(jnp.int32), task, {}
