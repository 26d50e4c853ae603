"""Humanoid locomotion (reference tasks/humanoid.py) — obs 108 / act 21.

Same potential-based locomotion family as Ant with humanoid-specific terms:
normalized euler-angle obs, angular-velocity scaling (:409), dof-force obs
(``enable_actor_dof_force_sensors`` :196), motor-effort-weighted electricity
and joints-at-limit costs (kernel :355-373), alive bonus 2.0, start pose
z=1.34 (:179), 2 foot force sensors (:163-168).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import model_from_spec
from ..models.mjcf import load_mjcf
from ..ops import maths
from ..physics.engine import Control, SimState
from .base import EnvState, VecTaskBase, masked_update

TASK_CFG = {
    "name": "Humanoid",
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
        "actionsCost": 0.01,
        "energyCost": 0.05,
        "dofVelocityScale": 0.1,
        "angularVelocityScale": 0.25,
        "contactForceScale": 0.01,
        "jointsAtLimitCost": 0.25,
        "deathCost": -1.0,
        "terminationHeight": 0.8,
        "plane": {"staticFriction": 1.0, "dynamicFriction": 1.0, "restitution": 0.0},
        "asset": {},
        "enableCameraSensors": False,
        "clipObservations": 5.0,
    },
    "sim": {
        "dt": 0.0166,
        "substeps": 2,
        "up_axis": "z",
        "use_gpu_pipeline": True,
        "gravity": [0.0, 0.0, -9.81],
        "physx": {
            "num_threads": 4, "solver_type": 1, "use_gpu": True,
            "num_position_iterations": 4, "num_velocity_iterations": 0,
            "contact_capacity": 16,  # active-set compaction: 35 candidate rows, ~8 active walking
            "contact_offset": 0.02, "rest_offset": 0.0,
            "bounce_threshold_velocity": 0.2, "max_depenetration_velocity": 10.0,
            "default_buffer_size_multiplier": 5.0,
            "max_gpu_contact_pairs": 8388608, "contact_collection": 0,
        },
    },
    "task": {"randomize": False, "randomization_params": {}},
}


class HumanoidTaskState(NamedTuple):
    potentials: jax.Array
    prev_potentials: jax.Array
    actions: jax.Array


class Humanoid(VecTaskBase):
    def __init__(self, cfg):
        cfg["env"]["numObservations"] = 108
        cfg["env"]["numActions"] = 21
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
        self.angular_velocity_scale = float(e.get("angularVelocityScale", 0.25))
        self.contact_force_scale = float(e["contactForceScale"])
        super().__init__(cfg)

        m = self.model
        self.num_dof = len(self.engine.scalar_dofs)
        assert self.num_dof == 21, self.num_dof
        # per-dof motor efforts: the reference applies action k to dof k
        # (tasks/humanoid.py:283); map actuator gears onto dof order
        gear_by_dof = np.zeros(self.num_dof)
        sd_index = {int(v): i for i, v in enumerate(self.engine.scalar_dofs)}
        for dof, gear in zip(np.asarray(m.actuator_dof), np.asarray(m.actuator_gear)):
            gear_by_dof[sd_index[int(dof)]] = gear
        self.motor_efforts = jnp.asarray(gear_by_dof, jnp.float32)
        self.max_motor_effort = float(np.max(gear_by_dof))
        self.motor_effort_ratio = jnp.asarray(
            gear_by_dof / np.max(gear_by_dof), jnp.float32)
        self.actuated_dofs = np.asarray(self.engine.scalar_dofs)
        sd = np.asarray(m.dof_lower)[self.engine.scalar_dofs], \
            np.asarray(m.dof_upper)[self.engine.scalar_dofs]
        self.dof_lower = jnp.asarray(sd[0], jnp.float32)
        self.dof_upper = jnp.asarray(sd[1], jnp.float32)
        init = np.zeros(self.num_dof)
        init = np.where(sd[0] > 0, sd[0], np.where(sd[1] < 0, sd[1], init))
        self.initial_dof_pos = jnp.asarray(init, jnp.float32)
        self.start_z = 1.34
        self.targets = jnp.array([1000.0, 0.0, 0.0])
        self.basis_vec0 = jnp.array([1.0, 0.0, 0.0])
        self.basis_vec1 = jnp.array([0.0, 0.0, 1.0])
        self.inv_start_rot = jnp.array([0.0, 0.0, 0.0, 1.0])

    def create_model(self):
        asset = self.cfg["env"].get("asset", {})
        if asset.get("assetFileName"):
            import os
            root = asset.get("assetRoot", ".")
            model = load_mjcf(os.path.join(root, asset["assetFileName"]))
        else:
            from ..models.specs.humanoid import SPEC
            model = model_from_spec(SPEC)
        # force sensors on the feet (ref :163-168)
        if len(model.sensor_body) == 0:
            feet = [i for i, n in enumerate(model.body_names) if n.endswith("foot")]
            model.sensor_body = np.asarray(feet[:2], np.int32)
        return model, True

    def initial_task_state(self):
        n = self.num_envs
        pot = jnp.full((n,), -1000.0 / self.dt, jnp.float32)
        return HumanoidTaskState(potentials=pot, prev_potentials=pot,
                                 actions=jnp.zeros((n, 21), jnp.float32))

    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        tau = jnp.zeros((self.num_envs, self.engine.nv), jnp.float32)
        forces = actions * self.motor_efforts * self.power_scale
        tau = tau.at[:, self.actuated_dofs].set(forces)
        return Control(tau=tau)

    def reset_idx(self, sim: SimState, task, mask, key):
        k1, k2 = jax.random.split(key)
        n = self.num_envs
        nd = self.num_dof
        positions = jax.random.uniform(k1, (n, nd), minval=-0.2, maxval=0.2)
        velocities = jax.random.uniform(k2, (n, nd), minval=-0.1, maxval=0.1)
        new_pos = jnp.clip(self.initial_dof_pos + positions, self.dof_lower, self.dof_upper)
        sim = self.engine.set_dof_pos(
            sim, masked_update(mask, new_pos, self.engine.dof_pos(sim)))
        sim = self.engine.set_dof_vel(
            sim, masked_update(mask, velocities, self.engine.dof_vel(sim)))
        root0 = jnp.concatenate([
            jnp.array([0.0, 0.0, self.start_z, 0.0, 0.0, 0.0, 1.0]), jnp.zeros(6)])
        q = masked_update(mask, jnp.broadcast_to(root0[:7], (n, 7)), sim.q[:, 0:7])
        qd = masked_update(mask, jnp.zeros((n, 6)), sim.qd[:, 0:6])
        sim = SimState(sim.q.at[:, 0:7].set(q), sim.qd.at[:, 0:6].set(qd))

        pot0 = -jnp.linalg.norm(
            self.targets - jnp.array([0.0, 0.0, self.start_z]).at[2].set(0.0)
        ) / self.dt * jnp.ones(n)
        task = HumanoidTaskState(
            potentials=jnp.where(mask, pot0, task.potentials),
            prev_potentials=jnp.where(mask, pot0, task.prev_potentials),
            actions=masked_update(mask, jnp.zeros((n, 21)), task.actions),
        )
        return sim, task

    def post_physics(self, state: EnvState, out, actions):
        task: HumanoidTaskState = state.task
        root = out.root_states[:, 0]
        torso_position = root[:, 0:3]
        torso_rotation = root[:, 3:7]
        velocity = root[:, 7:10]
        ang_velocity = root[:, 10:13]

        to_target = self.targets - torso_position
        to_target = to_target.at[:, 2].set(0.0)
        prev_potentials = task.potentials
        potentials = -jnp.linalg.norm(to_target, axis=-1) / self.dt

        torso_quat, up_proj, heading_proj, _, _ = maths.compute_heading_and_up(
            torso_rotation, jnp.broadcast_to(self.inv_start_rot, torso_rotation.shape),
            to_target, self.basis_vec0, self.basis_vec1, 2)
        vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target = maths.compute_rot(
            torso_quat, velocity, ang_velocity,
            jnp.broadcast_to(self.targets, torso_position.shape), torso_position)
        roll = maths.normalize_angle(roll)[:, None]
        yaw = maths.normalize_angle(yaw)[:, None]
        angle_to_target = maths.normalize_angle(angle_to_target)[:, None]

        dof_pos = self.engine.dof_pos(state.sim)
        dof_vel = self.engine.dof_vel(state.sim)
        dof_pos_scaled = maths.unscale(dof_pos, self.dof_lower, self.dof_upper)
        dof_force = out.dof_force[:, self.engine.scalar_dofs]
        sensors = out.sensor_forces.reshape(self.num_envs, -1)  # (N, 12)

        obs = jnp.concatenate([
            torso_position[:, 2:3], vel_loc,
            angvel_loc * self.angular_velocity_scale,
            yaw, roll, angle_to_target, up_proj[:, None], heading_proj[:, None],
            dof_pos_scaled, dof_vel * self.dof_vel_scale,
            dof_force * self.contact_force_scale,
            sensors * self.contact_force_scale, actions,
        ], axis=-1)

        rew, reset = self._compute_reward(obs, actions, state.progress,
                                          potentials, prev_potentials)
        task = HumanoidTaskState(potentials=potentials,
                                 prev_potentials=prev_potentials, actions=actions)
        extras = {"true_objective": velocity[:, 0]}
        return obs, None, rew, reset, task, extras

    def _compute_reward(self, obs, actions, progress, potentials, prev_potentials):
        """Parity with compute_humanoid_reward (ref :330-373)."""
        heading_reward = jnp.where(obs[:, 11] > 0.8, self.heading_weight,
                                   self.heading_weight * obs[:, 11] / 0.8)
        up_reward = jnp.where(obs[:, 10] > 0.93, self.up_weight, 0.0)
        actions_cost = jnp.sum(jnp.square(actions), axis=-1)
        mer = self.motor_effort_ratio[None, :]
        scaled_cost = self.joints_at_limit_cost_scale * (
            jnp.abs(obs[:, 12:33]) - 0.98) / 0.02
        dof_at_limit_cost = jnp.sum(
            (jnp.abs(obs[:, 12:33]) > 0.98).astype(jnp.float32) * scaled_cost * mer,
            axis=-1)
        electricity_cost = jnp.sum(
            jnp.abs(actions * obs[:, 33:54]) * mer, axis=-1)
        alive_reward = 2.0
        progress_reward = potentials - prev_potentials
        total = (progress_reward + alive_reward + up_reward + heading_reward
                 - self.actions_cost_scale * actions_cost
                 - self.energy_cost_scale * electricity_cost
                 - dof_at_limit_cost)
        fallen = obs[:, 0] < self.termination_height
        total = jnp.where(fallen, self.death_cost, total)
        reset = jnp.where(fallen | (progress >= self.max_episode_length - 1), 1, 0)
        return total, reset.astype(jnp.int32)
