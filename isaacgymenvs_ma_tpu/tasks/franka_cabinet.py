"""FrankaCabinet — drawer opening (reference tasks/franka_cabinet.py,
567 LoC) — obs 23 / act 9 (joint-space effort control).

Franka opens a cabinet's top drawer.  The sektion cabinet's mesh collisions
are out of the contact tier, so the cabinet is built procedurally: fixed
cabinet box + prismatic top drawer (0..0.4 m travel, damped) with a handle
grasp frame; the grasp is realized with a conditional grab constraint
(fingers near handle = pulling the drawer).

Obs (ref :380-386): dof_pos scaled(9), dof_vel * 0.1 (9), eef-to-handle
vector(3), drawer pos(1), drawer vel(1).  Reward kernel mirrored from
:497-560: squared-inverse reach, gripper/drawer axis-alignment terms,
around-handle and finger-distance shaping, drawer-opening rewards with
staged bonuses at 0.01/0.2/0.39, action penalty, behind-handle penalty;
reset at open > 0.39.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.franka import FRANKA_DEFAULT_DOF_POS, build_franka
from ..models.model import (FIXED, GEOM_BOX, SLIDE, ModelBuilder,
                            compose_scene)
from ..ops import maths
from ..physics.engine import Control, PhysicsEngine, SimState
from .base import EnvState, VecTaskBase, masked_update

TASK_CFG = {
    "name": "FrankaCabinet",
    "physics_engine": "physx",
    "env": {
        "numEnvs": 4096,
        "envSpacing": 1.5,
        "episodeLength": 500,
        "enableDebugVis": False,
        "clipObservations": 5.0,
        "clipActions": 1.0,
        "actionScale": 7.5,
        "startPositionNoise": 0.0,
        "startRotationNoise": 0.0,
        "numProps": 4,
        "aggregateMode": 3,
        "dofVelocityScale": 0.1,
        "distRewardScale": 2.0,
        "rotRewardScale": 0.5,
        "aroundHandleRewardScale": 10.0,
        "openRewardScale": 7.5,
        "fingerDistRewardScale": 100.0,
        "actionPenaltyScale": 0.01,
    },
    "sim": {
        "dt": 0.01667, "substeps": 2, "up_axis": "z",
        "use_gpu_pipeline": True, "gravity": [0.0, 0.0, -9.81],
        "physx": {
            "num_threads": 4, "solver_type": 1, "use_gpu": True,
            "num_position_iterations": 12, "num_velocity_iterations": 1,
            # reuse_contact_rows measured neutral (0.68 vs 0.67 ms/step) —
            # keep the per-substep row rebuild for accuracy
            "contact_offset": 0.005, "rest_offset": 0.0,
            "bounce_threshold_velocity": 0.2, "max_depenetration_velocity": 1000.0,
            "default_buffer_size_multiplier": 5.0,
            "max_gpu_contact_pairs": 1048576, "contact_collection": 0,
        },
    },
    "task": {"randomize": False},
}

CABINET_POS = np.array([0.8, 0.0, 0.4])
DRAWER_TRAVEL = 0.4
HANDLE_LOCAL = np.array([-0.35, 0.0, 0.1])  # handle point in drawer frame


def build_cabinet():
    b = ModelBuilder()
    b.begin_actor()
    cab = b.add_body("cabinet", -1, FIXED, body_pos=CABINET_POS)
    b.add_geom(cab, GEOM_BOX, (0.25, 0.35, 0.4), density=None, contact=False)
    drawer = b.add_body(
        "drawer_top", cab, SLIDE, jnt_axis=(-1.0, 0.0, 0.0),
        body_pos=(0.0, 0.0, 0.25), limit_lower=0.0, limit_upper=DRAWER_TRAVEL,
        damping=10.0)
    b.add_geom(drawer, GEOM_BOX, (0.24, 0.3, 0.08), density=200.0,
               contact=False, name="drawer_box")
    return b.finalize(), drawer


class CabinetTaskState(NamedTuple):
    actions: jax.Array


class FrankaCabinet(VecTaskBase):
    def __init__(self, cfg):
        e = cfg["env"]
        e["numObservations"] = 23
        e["numActions"] = 9
        self.action_scale = float(e["actionScale"])
        self.dof_vel_scale = float(e["dofVelocityScale"])
        self.dist_reward_scale = float(e["distRewardScale"])
        self.rot_reward_scale = float(e["rotRewardScale"])
        self.around_handle_reward_scale = float(e["aroundHandleRewardScale"])
        self.open_reward_scale = float(e["openRewardScale"])
        self.finger_dist_reward_scale = float(e["fingerDistRewardScale"])
        self.action_penalty_scale = float(e["actionPenaltyScale"])
        super().__init__(cfg)
        m = self.model
        names = m.body_names
        self.grip_body = names.index("panda_grip_site")
        self.hand_body = names.index("panda_hand")
        self.lfinger = names.index("panda_leftfinger")
        self.rfinger = names.index("panda_rightfinger")
        self.drawer_body = names.index("drawer_top")
        link0 = names.index("panda_link0")
        sub = [i for i in range(m.nb) if m.body_ancestor[link0, i]]
        self.franka_dofs = np.asarray(
            [d for d in range(m.nv) if m.dof_body[d] in sub])
        self.drawer_dof = int(m.v_adr[self.drawer_body])
        self.franka_qids = self.engine.dof_qid[self.franka_dofs]
        self.drawer_qid = int(self.engine.dof_qid[self.drawer_dof])
        self.dof_lower = jnp.asarray(np.asarray(m.dof_lower)[self.franka_dofs],
                                     jnp.float32)
        self.dof_upper = jnp.asarray(np.asarray(m.dof_upper)[self.franka_dofs],
                                     jnp.float32)
        self.default_dof = jnp.asarray(FRANKA_DEFAULT_DOF_POS, jnp.float32)
        self.gripper_forward = jnp.array([0.0, 0.0, 1.0])
        self.gripper_up = jnp.array([0.0, 1.0, 0.0])
        self.drawer_inward = jnp.array([-1.0, 0.0, 0.0])
        self.drawer_up = jnp.array([0.0, 0.0, 1.0])

    def create_model(self):
        franka = build_franka()
        cabinet, drawer = build_cabinet()
        model = compose_scene([
            (franka, (0.0, 0.0, 0.0), (0, 0, 0, 1)),
            (cabinet, (0, 0, 0), (0, 0, 0, 1))])
        return model, True

    def build_engine(self, model, ground):
        drawer = model.body_names.index("drawer_top")
        grip = model.body_names.index("panda_grip_site")
        grabs = [(grip, (0, 0, 0), drawer, HANDLE_LOCAL)]
        return PhysicsEngine(model, self.sim_params, ground=ground, grabs=grabs)

    def initial_task_state(self):
        return CabinetTaskState(
            actions=jnp.zeros((self.num_envs, 9), jnp.float32))

    def _handle_pos(self, out):
        return out.body_pos[:, self.drawer_body] + maths.quat_apply(
            out.body_quat[:, self.drawer_body],
            jnp.asarray(HANDLE_LOCAL, jnp.float32))

    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        n = self.num_envs
        # joint-space effort control: tau = scale * action (ref :401-407 uses
        # position targets += dt*scale*action; effort keeps it jit-simple and
        # the scale maps to similar authority)
        tau = jnp.zeros((n, self.engine.nv), jnp.float32)
        tau = tau.at[:, self.franka_dofs[:7]].set(
            actions[:, :7] * self.action_scale * 10.0)
        pos_target = jnp.zeros((n, self.engine.nv), jnp.float32)
        grip_t = jnp.where(actions[:, 7:9] >= 0, 0.035, 0.0)
        pos_target = pos_target.at[:, self.franka_dofs[7:9]].set(grip_t)
        # grab the handle when the grip site is close
        bx, bq = self.engine.fk(state.sim.q)
        grip = bx[:, self.grip_body]
        handle = bx[:, self.drawer_body] + maths.quat_apply(
            bq[:, self.drawer_body], jnp.asarray(HANDLE_LOCAL, jnp.float32))
        near = jnp.linalg.norm(grip - handle, axis=-1) < 0.05
        closed = (actions[:, 7] < 0) & (actions[:, 8] < 0)
        return Control(tau=tau, pos_target=pos_target,
                       vel_target=jnp.zeros((n, self.engine.nv), jnp.float32),
                       grab_active=(near & closed)[:, None].astype(jnp.float32))

    def reset_idx(self, sim: SimState, task, mask, key):
        n = self.num_envs
        k1, = jax.random.split(key, 1)
        noise = 0.25 * (jax.random.uniform(k1, (n, 9)) - 0.5)
        pos = jnp.clip(self.default_dof + noise, self.dof_lower, self.dof_upper)
        q = sim.q.at[:, self.franka_qids].set(
            masked_update(mask, pos, sim.q[:, self.franka_qids]))
        q = q.at[:, self.drawer_qid].set(
            jnp.where(mask, 0.0, q[:, self.drawer_qid]))
        qd = jnp.where(mask[:, None], 0.0, sim.qd)
        return SimState(q, qd), task

    def post_physics(self, state: EnvState, out, actions):
        n = self.num_envs
        grasp_pos = out.body_pos[:, self.grip_body]
        grasp_rot = out.body_quat[:, self.hand_body]
        handle_pos = self._handle_pos(out)
        handle_rot = out.body_quat[:, self.drawer_body]
        lf = out.body_pos[:, self.lfinger]
        rf = out.body_pos[:, self.rfinger]
        dof_pos = state.sim.q[:, self.franka_qids]
        dof_vel = state.sim.qd[:, self.franka_dofs]
        drawer_pos = state.sim.q[:, self.drawer_qid]
        drawer_vel = state.sim.qd[:, self.drawer_dof]

        dof_pos_scaled = (2.0 * (dof_pos - self.dof_lower)
                          / (self.dof_upper - self.dof_lower) - 1.0)
        to_target = handle_pos - grasp_pos
        obs = jnp.concatenate([
            dof_pos_scaled, dof_vel * self.dof_vel_scale, to_target,
            drawer_pos[:, None], drawer_vel[:, None]], -1)

        # reward kernel (ref :497-560)
        d = jnp.linalg.norm(to_target, axis=-1)
        dist_reward = (1.0 / (1.0 + d ** 2)) ** 2
        dist_reward = jnp.where(d <= 0.02, dist_reward * 2, dist_reward)
        a1 = maths.quat_apply(grasp_rot, self.gripper_forward)
        a2 = maths.quat_apply(handle_rot, self.drawer_inward)
        a3 = maths.quat_apply(grasp_rot, self.gripper_up)
        a4 = maths.quat_apply(handle_rot, self.drawer_up)
        dot1 = jnp.sum(a1 * a2, -1)
        dot2 = jnp.sum(a3 * a4, -1)
        rot_reward = 0.5 * (jnp.sign(dot1) * dot1**2 + jnp.sign(dot2) * dot2**2)
        around = jnp.where((lf[:, 2] > handle_pos[:, 2])
                           & (rf[:, 2] < handle_pos[:, 2]), 0.5, 0.0)
        finger_dist = jnp.where(
            (lf[:, 2] > handle_pos[:, 2]) & (rf[:, 2] < handle_pos[:, 2]),
            (0.04 - jnp.abs(lf[:, 2] - handle_pos[:, 2]))
            + (0.04 - jnp.abs(rf[:, 2] - handle_pos[:, 2])), 0.0)
        action_penalty = jnp.sum(jnp.square(actions), -1)
        open_reward = drawer_pos * around + drawer_pos
        rewards = (self.dist_reward_scale * dist_reward
                   + self.rot_reward_scale * rot_reward
                   + self.around_handle_reward_scale * around
                   + self.open_reward_scale * open_reward
                   + self.finger_dist_reward_scale * finger_dist
                   - self.action_penalty_scale * action_penalty)
        rewards = jnp.where(drawer_pos > 0.01, rewards + 0.5, rewards)
        rewards = jnp.where(drawer_pos > 0.2, rewards + around, rewards)
        rewards = jnp.where(drawer_pos > 0.39, rewards + 2.0 * around, rewards)
        behind = 0.04
        rewards = jnp.where(lf[:, 0] < handle_pos[:, 0] - behind, -1.0, rewards)
        rewards = jnp.where(rf[:, 0] < handle_pos[:, 0] - behind, -1.0, rewards)

        reset = jnp.where(
            (drawer_pos > 0.39) | (state.progress >= self.max_episode_length - 1),
            1, 0)
        return obs, None, rewards, reset.astype(jnp.int32), \
            CabinetTaskState(actions=actions), {}
