"""FrankaReachMA — the fork's flagship multi-agent task
(reference tasks/franka_reach_MA.py, 959 LoC).

N envs x K Franka arms arranged on a circle of radius 0.45 around a table
(:912-918), each OSC-torque-controlled (6-dof dpose actions, no gripper,
:80); T target cubes dropped on the table.  Multi-agent batch folding: all
learner-facing buffers have ``num_envs * num_agents`` rows (:22-38, the
``allocate_buffers`` override), handled by our base's ``num_agents`` support.

Per-agent obs (:582-612): all target positions (3T, env-shared) + own eef
quat/pos + min-relative-target vector + other agents' eef positions (3(K-1)).
Cooperative reward (:928-960): inverse-square distance + all-targets-covered
bonus + hand-collision punishment (-10), clipped >= 0; reset on timeout only.
Hand collisions are real contacts here: hand spheres of different arms form
body-pair contact rows.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.franka import FRANKA_DEFAULT_DOF_POS, build_franka
from ..models.model import (FIXED, FREE, GEOM_BOX, ModelBuilder,
                            compose_scene)
from ..physics.controllers import osc_torques
from ..physics.engine import Control, PhysicsEngine, SimState
from .base import EnvState, VecTaskBase, masked_update

TASK_CFG = {
    "name": "FrankaReachMA",
    "physics_engine": "physx",
    "env": {
        "numEnvs": 8192,
        "numAgents": 2,
        "numTargets": -1,
        "envSpacing": 1.5,
        "episodeLength": 150,
        "enableDebugVis": False,
        "clipObservations": 5.0,
        "clipActions": 1.0,
        "startPositionNoise": 0.25,
        "startRotationNoise": 0.785,
        "frankaPositionNoise": 0.0,
        "frankaRotationNoise": 0.0,
        "frankaDofNoise": 0.25,
        "aggregateMode": 3,
        "actionScale": 1.0,
        "distRewardScale": 0.1,
        "liftRewardScale": 1.5,
        "alignRewardScale": 2.0,
        "stackRewardScale": 16.0,
        "controlType": "osc",
        "asset": {},
        "enableCameraSensors": False,
    },
    "sim": {
        "dt": 0.01667,
        "substeps": 2,
        "up_axis": "z",
        "use_gpu_pipeline": True,
        "gravity": [0.0, 0.0, -9.81],
        "physx": {
            "num_threads": 4, "solver_type": 1, "use_gpu": True,
            "num_position_iterations": 8, "num_velocity_iterations": 1,
            "contact_capacity": 24,  # 43 candidate rows across 2 arms + cubes
            "reuse_contact_rows": True,
            "contact_offset": 0.005, "rest_offset": 0.0,
            "bounce_threshold_velocity": 0.2, "max_depenetration_velocity": 1000.0,
            "default_buffer_size_multiplier": 5.0,
            "max_gpu_contact_pairs": 1048576, "contact_collection": 0,
        },
    },
    "task": {"randomize": False},
}

TABLE_POS = np.array([0.0, 0.0, 1.0])
TABLE_HALF = np.array([0.6, 0.6, 0.025])
TABLE_SURFACE_Z = 1.0 + 0.025
CUBE_SIZE = 0.050
CIRCLE_RADIUS = 0.45
FRANKA_BASE_Z = 1.0 + 0.025 + 0.1  # table surface + stand height (ref :331)


def franka_start_poses(num_agents: int, r: float = CIRCLE_RADIUS):
    """Positions/rotations on a circle (ref :912-918)."""
    rads = np.deg2rad(np.arange(0, 359, 360 // num_agents, dtype=np.float64))
    pos = np.stack([-np.cos(rads) * r, np.sin(rads) * r], axis=-1)
    quat = np.stack([np.zeros_like(rads), np.zeros_like(rads),
                     np.sin(-rads / 2), np.cos(-rads / 2)], axis=-1)
    return pos, quat


class FrankaMATaskState(NamedTuple):
    actions: jax.Array   # (B, 6) cached for reward


class FrankaReachMA(VecTaskBase):
    """Also the base class for the other MA variants (Collect/PP/Combine)."""

    NUM_ACTIONS = 6

    def _obs_dim(self, K, T):
        return (3 + 4 + 3) + 3 * T + 3 * (K - 1)

    def __init__(self, cfg):
        e = cfg["env"]
        self.num_agents_cfg = int(e.get("numAgents", 2))
        self.num_targets = int(e.get("numTargets", -1))
        if self.num_targets <= -1:
            self.num_targets = self.num_agents_cfg
        e["numObservations"] = self._obs_dim(self.num_agents_cfg, self.num_targets)
        e["numActions"] = self.NUM_ACTIONS
        self.action_scale = float(e["actionScale"])
        self.start_position_noise = float(e["startPositionNoise"])
        self.franka_dof_noise = float(e["frankaDofNoise"])
        super().__init__(cfg)

        K = self.num_agents
        m = self.model
        # per-arm static index sets
        self.arm_dofs = np.stack([
            np.asarray(self._arm_dof_lists[k][:7]) for k in range(K)])   # (K, 7)
        self.gripper_dofs = np.stack([
            np.asarray(self._arm_dof_lists[k][7:9]) for k in range(K)])  # (K, 2)
        self.hand_bodies = np.asarray(self._hand_bodies)                 # (K,)
        self.grip_bodies = np.asarray(self._grip_bodies)                 # (K,)
        self.cube_actors = np.asarray(self._cube_actors)                 # (T,)
        self.cube_q_adr = np.asarray(self._cube_q_adr)                   # (T,)
        self.cube_v_adr = np.asarray(self._cube_v_adr)

        self.franka_default_dof_pos = jnp.asarray(FRANKA_DEFAULT_DOF_POS, jnp.float32)
        self.kp = 150.0
        self.kp_null = 10.0
        self.cmd_limit = jnp.array([0.1, 0.1, 0.1, 0.5, 0.5, 0.5], jnp.float32)
        arm0 = self.arm_dofs[0]
        self.franka_effort_limit = jnp.asarray(
            np.asarray(m.dof_effort_limit)[arm0], jnp.float32)
        self.franka_dof_lower = jnp.asarray(
            np.asarray(m.dof_lower)[self._arm_dof_lists[0][:9]], jnp.float32)
        self.franka_dof_upper = jnp.asarray(
            np.asarray(m.dof_upper)[self._arm_dof_lists[0][:9]], jnp.float32)

    # ------------------------------------------------------------------
    def create_model(self):
        K = self.num_agents_cfg
        T = self.num_targets
        parts = []
        # table (+ stand is cosmetic; folded into the table box)
        tb = ModelBuilder()
        tb.begin_actor()
        tbody = tb.add_body("table", -1, FIXED, body_pos=TABLE_POS)
        tb.add_geom(tbody, GEOM_BOX, TABLE_HALF, density=None, contact=True,
                    name="table_top")
        table = tb.finalize()
        parts.append((table, (0, 0, 0), (0, 0, 0, 1)))

        franka = build_franka()
        pos, quat = franka_start_poses(K)
        for k in range(K):
            parts.append((franka, (pos[k, 0], pos[k, 1], FRANKA_BASE_Z), quat[k]))

        cb = ModelBuilder()
        cb.begin_actor()
        cbody = cb.add_body("cubeA", -1, FREE,
                            body_pos=(0, 0, TABLE_SURFACE_Z + CUBE_SIZE))
        cb.add_geom(cbody, GEOM_BOX, np.full(3, CUBE_SIZE / 2), density=1000.0,
                    name="cubeA_geom")
        cube = cb.finalize()
        for t in range(T):
            parts.append((cube, (0.1 * t - 0.2, 0, TABLE_SURFACE_Z + 0.1), (0, 0, 0, 1)))

        m = compose_scene(parts)

        # static index bookkeeping
        names = m.body_names
        self._hand_bodies, self._grip_bodies = [], []
        self._arm_dof_lists = []
        self._cube_actors, self._cube_q_adr, self._cube_v_adr = [], [], []
        hand_idx = [i for i, n in enumerate(names) if n == "panda_hand"]
        grip_idx = [i for i, n in enumerate(names) if n == "panda_grip_site"]
        link0_idx = [i for i, n in enumerate(names) if n == "panda_link0"]
        for k in range(K):
            self._hand_bodies.append(hand_idx[k])
            self._grip_bodies.append(grip_idx[k])
            # dofs of this arm: all dofs whose body is in this franka subtree
            root = link0_idx[k]
            sub = [i for i in range(m.nb) if m.body_ancestor[root, i]]
            dofs = [d for d in range(m.nv) if m.dof_body[d] in sub]
            self._arm_dof_lists.append(dofs)
        cube_count = 0
        for i, n in enumerate(names):
            if n == "cubeA":
                self._cube_actors.append(int(np.searchsorted(m.actor_root_body, i)))
                self._cube_q_adr.append(int(m.q_adr[i]))
                self._cube_v_adr.append(int(m.v_adr[i]))
                cube_count += 1
        # gripper drives: position-held (ref dof props: kp 800 / kd 40)
        for k in range(K):
            for d in self._arm_dof_lists[k][7:9]:
                m.dof_drive_mode[d] = 1  # DRIVE_POS
                m.dof_stiffness[d] = 800.0
                m.dof_drive_damping[d] = 40.0
        self._model_for_pairs = m
        return m, True

    def build_engine(self, model, ground):
        # pair specs: each cube vs table top; hand spheres of arm pairs
        gname = {g.name: i for i, g in enumerate(model.geoms)}
        table_geoms = [i for i, g in enumerate(model.geoms) if g.name == "table_top"]
        cube_geoms = [i for i, g in enumerate(model.geoms) if g.name == "cubeA_geom"]
        hand_geoms = [i for i, g in enumerate(model.geoms) if g.name == "hand_sphere"]
        pairs = [(c, table_geoms[0]) for c in cube_geoms]
        for a in range(len(hand_geoms)):
            for b in range(a + 1, len(hand_geoms)):
                pairs.append((hand_geoms[a], hand_geoms[b]))
        return PhysicsEngine(model, self.sim_params, ground=ground,
                             pair_specs=pairs)

    # ------------------------------------------------------------------
    def initial_task_state(self):
        return FrankaMATaskState(
            actions=jnp.zeros((self.rl_games_batch, 6), jnp.float32))

    def _eef_states(self, out):
        """eef pos/quat/vel per agent: (N, K, ...)."""
        gb = self.grip_bodies
        pos = out.body_pos[:, gb]
        quat = out.body_quat[:, gb]
        vel = out.body_vel[:, gb]  # [linvel, angvel]
        return pos, quat, vel

    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        N, K = self.num_envs, self.num_agents
        B = N * K
        sim = state.sim
        M, body_x, body_q, S, V = self.engine.dynamics_readout(sim)

        # per-arm blocks
        mm = jnp.stack([
            M[:, self.arm_dofs[k]][:, :, self.arm_dofs[k]] for k in range(K)
        ], axis=1).reshape(B, 7, 7)
        j_eef = jnp.stack([
            self.engine.point_jacobian(S, body_x, int(self.grip_bodies[k]))
            [:, self.arm_dofs[k], :] for k in range(K)
        ], axis=1).reshape(B, 7, 6)
        j_eef = jnp.swapaxes(j_eef, 1, 2)                        # (B, 6, 7)
        # eef velocity [lin at grip site, ang]
        w = V[..., 0:3]
        v_lin = V[..., 3:6] + jnp.cross(w, body_x)
        eef_vel = jnp.concatenate([v_lin, w], -1)[:, self.grip_bodies].reshape(B, 6)
        q_arm = jnp.stack([sim.q[:, self.engine.dof_qid[self.arm_dofs[k]]]
                           for k in range(K)], 1).reshape(B, 7)
        qd_arm = jnp.stack([sim.qd[:, self.arm_dofs[k]] for k in range(K)],
                           1).reshape(B, 7)

        dpose = actions[:, :6] * self.cmd_limit / self.action_scale
        u = osc_torques(mm, j_eef, eef_vel, q_arm, qd_arm, dpose,
                        self.franka_default_dof_pos[:7], kp=self.kp,
                        kp_null=self.kp_null,
                        effort_limit=self.franka_effort_limit)

        tau = jnp.zeros((N, self.engine.nv), jnp.float32)
        u_env = u.reshape(N, K, 7)
        for k in range(K):
            tau = tau.at[:, self.arm_dofs[k]].set(u_env[:, k])
        # grippers position-held at default
        pos_target = jnp.zeros((N, self.engine.nv), jnp.float32)
        for k in range(K):
            pos_target = pos_target.at[:, self.gripper_dofs[k]].set(0.035)
        return Control(tau=tau, pos_target=pos_target,
                       vel_target=jnp.zeros((N, self.engine.nv), jnp.float32))

    # ------------------------------------------------------------------
    def reset_idx(self, sim: SimState, task, mask, key):
        N, K, T = self.num_envs, self.num_agents, self.num_targets
        k1, k2, k3 = jax.random.split(key, 3)
        # franka dofs: default + noise, grippers exact (ref :633-642)
        noise = jax.random.uniform(k1, (N, K, 9))
        pos = jnp.clip(
            self.franka_default_dof_pos + self.franka_dof_noise * 2.0 * (noise - 0.5),
            self.franka_dof_lower, self.franka_dof_upper)
        pos = pos.at[:, :, 7:].set(self.franka_default_dof_pos[7:])
        q = sim.q
        qd = sim.qd
        for k in range(K):
            dofs = self._arm_dof_lists[k][:9]
            qids = self.engine.dof_qid[dofs]
            q = q.at[:, qids].set(
                masked_update(mask, pos[:, k], q[:, qids]))
            qd = qd.at[:, dofs].set(
                masked_update(mask, jnp.zeros((N, 9)), qd[:, dofs]))
        # cubes: random xy around table center, z = surface + half + U(0, 0.5)
        xy = jnp.asarray(TABLE_POS[:2], jnp.float32) + 2.0 * self.start_position_noise * (
            jax.random.uniform(k2, (N, T, 2)) - 0.5)
        z = TABLE_SURFACE_Z + CUBE_SIZE / 2 + 0.5 * jax.random.uniform(k3, (N, T))
        for t in range(T):
            qa, va = int(self.cube_q_adr[t]), int(self.cube_v_adr[t])
            cq = jnp.concatenate([xy[:, t], z[:, t: t + 1],
                                  jnp.zeros((N, 3)), jnp.ones((N, 1))], -1)
            q = q.at[:, qa: qa + 7].set(
                masked_update(mask, cq, q[:, qa: qa + 7]))
            qd = qd.at[:, va: va + 6].set(
                masked_update(mask, jnp.zeros((N, 6)), qd[:, va: va + 6]))
        task = task._replace(actions=masked_update(
            jnp.repeat(mask, K, 0), jnp.zeros_like(task.actions), task.actions))
        return SimState(q, qd), task

    # ------------------------------------------------------------------
    def post_physics(self, state: EnvState, out, actions):
        N, K, T = self.num_envs, self.num_agents, self.num_targets
        B = N * K
        eef_pos, eef_quat, eef_vel = self._eef_states(out)       # (N, K, ...)
        cube_pos = jnp.stack([
            state.sim.q[:, int(self.cube_q_adr[t]): int(self.cube_q_adr[t]) + 3]
            for t in range(T)], axis=1)                          # (N, T, 3)

        rel = cube_pos[:, None, :, :] - eef_pos[:, :, None, :]   # (N, K, T, 3)
        dist = jnp.linalg.norm(rel, axis=-1)                     # (N, K, T)
        nearest = jnp.argmin(dist, axis=-1)                      # (N, K)
        min_rel = jnp.take_along_axis(
            rel, nearest[..., None, None].repeat(3, -1), axis=2)[:, :, 0, :]

        obs_all_targets = jnp.repeat(
            cube_pos.reshape(N, T * 3), K, axis=0)               # (B, 3T)
        obs_self = jnp.concatenate([
            eef_quat.reshape(B, 4), eef_pos.reshape(B, 3),
            min_rel.reshape(B, 3)], axis=-1)
        flat = eef_pos.reshape(N, K * 3)
        others = jnp.stack([
            jnp.roll(flat, -3 * k, axis=-1) for k in range(K)], axis=1)[..., 3:]
        obs = jnp.concatenate([obs_all_targets, obs_self,
                               others.reshape(B, 3 * (K - 1))], axis=-1)

        # reward (ref :928-960)
        d = jnp.linalg.norm(min_rel.reshape(B, 3), axis=-1)
        dist_reward = 1.0 / (0.5 + d * d)
        actions_cost = jnp.sum(jnp.square(actions), axis=-1) * 0.01
        covered = jnp.max(jax.nn.one_hot(nearest, T), axis=1)    # (N, T)
        all_touched = jnp.repeat(jnp.sum(covered, -1) / K, K, axis=0)
        hands_cf = out.contact_force[:, self.hand_bodies]        # (N, K, 3)
        colliding = (jnp.linalg.norm(hands_cf, axis=-1) >= 0.1).reshape(B)
        rew = dist_reward - actions_cost + all_touched + colliding * -10.0
        rew = jnp.maximum(rew, 0.0)

        reset = jnp.where(state.progress >= self.max_episode_length - 1, 1, 0)
        task = FrankaMATaskState(actions=actions)
        # objective diagnostics: the actual cooperative objective is the
        # fraction of targets covered by a distinct nearest arm (ref
        # all_touched, franka_reach_MA.py:941-946) and how close the arms
        # get — without these the shaped-reward plateau is uninterpretable
        extras = {"episode": {
            "coverage": jnp.sum(covered, -1) / T,
            "eef_target_dist": d,
        }}
        return obs, None, rew, reset.astype(jnp.int32), task, extras
