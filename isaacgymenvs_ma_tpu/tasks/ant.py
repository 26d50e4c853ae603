"""Ant locomotion — the canonical throughput benchmark (reference tasks/ant.py).

obs 60 / act 8 (ref :67-68); potential-based progress reward toward
(1000, 0, 0) plus alive/up/heading bonuses and action/electricity/limit costs
(kernel :325-371); observation layout per the kernel at :374-407; 4 foot force
sensors (:174-178); direct effort actuation ``force = action * gear * power``
(:281-285); ``true_objective`` = forward velocity for PBT (:244-250).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.robots import build_ant
from ..models.mjcf import load_mjcf
from ..ops import maths
from ..physics.engine import Control, SimState
from .base import EnvState, VecTaskBase, masked_update

TASK_CFG = {
    "name": "Ant",
    "physics_engine": "physx",
    "env": {
        "numEnvs": 4096,
        "envSpacing": 5,
        "episodeLength": 1000,
        "enableDebugVis": False,
        "clipActions": 1.0,
        "powerScale": 1.0,
        "controlFrequencyInv": 1,
        "headingWeight": 0.5,
        "upWeight": 0.1,
        "actionsCost": 0.005,
        "energyCost": 0.05,
        "jointsAtLimitCost": 0.1,
        "deathCost": -2.0,
        "terminationHeight": 0.31,
        "plane": {"staticFriction": 1.0, "dynamicFriction": 1.0, "restitution": 0.0},
        "asset": {},
        "enableCameraSensors": False,
        "dofVelocityScale": 0.2,
        "contactForceScale": 0.1,
        "clipObservations": 5.0,  # implicit via root config in the reference
    },
    "sim": {
        "dt": 0.0166,
        "substeps": 2,
        "up_axis": "z",
        "use_gpu_pipeline": True,
        "gravity": [0.0, 0.0, -9.81],
        "physx": {
            "num_threads": 4,
            "solver_type": 1,
            "use_gpu": True,
            "num_position_iterations": 4,
            "num_velocity_iterations": 0,
            "contact_offset": 0.02,
            "rest_offset": 0.0,
            "bounce_threshold_velocity": 0.2,
            "max_depenetration_velocity": 10.0,
            "default_buffer_size_multiplier": 5.0,
            "max_gpu_contact_pairs": 8388608,
            "contact_collection": 0,
        },
    },
    "task": {"randomize": False, "randomization_params": {}},
}


class AntTaskState(NamedTuple):
    potentials: jax.Array        # (N,)
    prev_potentials: jax.Array   # (N,)
    actions: jax.Array           # (N, 8) previous actions (obs [52:60])


class Ant(VecTaskBase):
    def __init__(self, cfg):
        cfg["env"]["numObservations"] = 60
        cfg["env"]["numActions"] = 8
        e = cfg["env"]
        self.power_scale = float(e["powerScale"])
        self.heading_weight = float(e["headingWeight"])
        self.up_weight = float(e["upWeight"])
        self.actions_cost_scale = float(e["actionsCost"])
        self.energy_cost_scale = float(e["energyCost"])
        self.joints_at_limit_cost_scale = float(e["jointsAtLimitCost"])
        self.death_cost = float(e["deathCost"])
        self.termination_height = float(e["terminationHeight"])
        self.dof_vel_scale = float(e["dofVelocityScale"])
        self.contact_force_scale = float(e["contactForceScale"])
        super().__init__(cfg)

        m = self.model
        self.joint_gears = jnp.asarray(m.actuator_gear, jnp.float32)
        # actuators are registered in dof order for the procedural ant
        self.dof_lower = jnp.asarray(m.dof_lower[6:], jnp.float32)
        self.dof_upper = jnp.asarray(m.dof_upper[6:], jnp.float32)
        # initial dof pos: clamp 0 into limits (ref :96-99)
        init = np.zeros(8)
        lo, hi = np.asarray(m.dof_lower[6:]), np.asarray(m.dof_upper[6:])
        init = np.where(lo > 0, lo, np.where(hi < 0, hi, init))
        self.initial_dof_pos = jnp.asarray(init, jnp.float32)
        # start pose z=0.44 (ref :162-165), identity rotation
        self.start_z = 0.44
        self.targets = jnp.array([1000.0, 0.0, 0.0])
        self.up_axis_idx = 2
        self.basis_vec0 = jnp.array([1.0, 0.0, 0.0])
        self.basis_vec1 = jnp.array([0.0, 0.0, 1.0])
        self.inv_start_rot = jnp.array([0.0, 0.0, 0.0, 1.0])  # conj of identity

    def create_model(self):
        asset = self.cfg["env"].get("asset", {})
        if asset.get("assetFileName"):
            import os
            root = asset.get("assetRoot", ".")
            model = load_mjcf(os.path.join(root, asset["assetFileName"]))
        else:
            model = build_ant()
        return model, True

    def initial_task_state(self):
        n = self.num_envs
        pot = jnp.full((n,), -1000.0 / self.dt, jnp.float32)
        return AntTaskState(potentials=pot, prev_potentials=pot,
                            actions=jnp.zeros((n, 8), jnp.float32))

    # ------------------------------------------------------------------
    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        tau = jnp.zeros((self.num_envs, self.engine.nv), jnp.float32)
        forces = actions * self.joint_gears * self.power_scale
        tau = tau.at[:, 6:].set(forces)
        return Control(tau=tau)

    def reset_idx(self, sim: SimState, task: AntTaskState, mask, key):
        k1, k2 = jax.random.split(key)
        n = self.num_envs
        positions = jax.random.uniform(k1, (n, 8), minval=-0.2, maxval=0.2)
        velocities = jax.random.uniform(k2, (n, 8), minval=-0.1, maxval=0.1)
        new_pos = jnp.clip(self.initial_dof_pos + positions, self.dof_lower, self.dof_upper)
        dof_pos = masked_update(mask, new_pos, self.engine.dof_pos(sim))
        dof_vel = masked_update(mask, velocities, self.engine.dof_vel(sim))
        sim = self.engine.set_dof_pos(sim, dof_pos)
        sim = self.engine.set_dof_vel(sim, dof_vel)
        # root -> initial: (0, 0, 0.44), identity quat, zero vel (ref :90-92, :266)
        root0 = jnp.concatenate([
            jnp.array([0.0, 0.0, self.start_z, 0.0, 0.0, 0.0, 1.0]),
            jnp.zeros(6)])
        q = masked_update(mask, jnp.broadcast_to(root0[:7], (n, 7)), sim.q[:, 0:7])
        qd = masked_update(mask, jnp.zeros((n, 6)), sim.qd[:, 0:6])
        sim = SimState(sim.q.at[:, 0:7].set(q), sim.qd.at[:, 0:6].set(qd))

        to_target = self.targets - jnp.concatenate(
            [jnp.zeros((n, 2)), jnp.full((n, 1), self.start_z)], axis=-1)
        to_target = to_target.at[:, 2].set(0.0)
        pot0 = -jnp.linalg.norm(to_target, axis=-1) / self.dt
        task = AntTaskState(
            potentials=jnp.where(mask, pot0, task.potentials),
            prev_potentials=jnp.where(mask, pot0, task.prev_potentials),
            actions=masked_update(mask, jnp.zeros((n, 8)), task.actions),
        )
        return sim, task

    def post_physics(self, state: EnvState, out, actions):
        task: AntTaskState = state.task
        root = out.root_states[:, 0]
        torso_position = root[:, 0:3]
        torso_rotation = root[:, 3:7]
        velocity = root[:, 7:10]
        ang_velocity = root[:, 10:13]

        to_target = self.targets - torso_position
        to_target = to_target.at[:, 2].set(0.0)
        prev_potentials = task.potentials
        potentials = -jnp.linalg.norm(to_target, axis=-1) / self.dt

        torso_quat, up_proj, heading_proj, up_vec, heading_vec = maths.compute_heading_and_up(
            torso_rotation, jnp.broadcast_to(self.inv_start_rot, torso_rotation.shape),
            to_target, self.basis_vec0, self.basis_vec1, 2)
        vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target = maths.compute_rot(
            torso_quat, velocity, ang_velocity,
            jnp.broadcast_to(self.targets, torso_position.shape), torso_position)

        dof_pos = self.engine.dof_pos(state.sim)
        dof_vel = self.engine.dof_vel(state.sim)
        dof_pos_scaled = maths.unscale(dof_pos, self.dof_lower, self.dof_upper)
        sensors = out.sensor_forces.reshape(self.num_envs, -1)  # (N, 24)

        obs = jnp.concatenate([
            torso_position[:, 2:3], vel_loc, angvel_loc,
            yaw[:, None], roll[:, None], angle_to_target[:, None],
            up_proj[:, None], heading_proj[:, None],
            dof_pos_scaled, dof_vel * self.dof_vel_scale,
            sensors * self.contact_force_scale, actions,
        ], axis=-1)

        rew, reset = self._compute_reward(obs, actions, state.progress,
                                          potentials, prev_potentials,
                                          state.reset_buf)
        task = AntTaskState(potentials=potentials, prev_potentials=prev_potentials,
                            actions=actions)
        extras = {"true_objective": velocity[:, 0]}  # PBT fitness (ref :244-250)
        return obs, None, rew, reset, task, extras

    def _compute_reward(self, obs, actions, progress, potentials, prev_potentials,
                        reset_buf):
        """Kernel parity with compute_ant_reward (ref :326-373)."""
        heading_reward = jnp.where(
            obs[:, 11] > 0.8, self.heading_weight,
            self.heading_weight * obs[:, 11] / 0.8)
        up_reward = jnp.where(obs[:, 10] > 0.93, self.up_weight, 0.0)
        actions_cost = jnp.sum(jnp.square(actions), axis=-1)
        electricity_cost = jnp.sum(jnp.abs(actions * obs[:, 20:28]), axis=-1)
        dof_at_limit_cost = jnp.sum((obs[:, 12:20] > 0.99).astype(jnp.float32), axis=-1)
        alive_reward = 0.5
        progress_reward = potentials - prev_potentials

        total = (progress_reward + alive_reward + up_reward + heading_reward
                 - self.actions_cost_scale * actions_cost
                 - self.energy_cost_scale * electricity_cost
                 - dof_at_limit_cost * self.joints_at_limit_cost_scale)
        fallen = obs[:, 0] < self.termination_height
        total = jnp.where(fallen, self.death_cost, total)
        reset = jnp.where(fallen | (progress >= self.max_episode_length - 1), 1, 0)
        return total, reset.astype(jnp.int32)
