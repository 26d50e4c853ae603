"""Quadcopter (reference tasks/quadcopter.py) — obs 21 / act 12.

Free chassis cylinder + 4 gimbaled rotor arms: per-arm pitch+roll hinge dofs
(+-30 deg, position-PD kp 1000 — :247-248) whose targets integrate at
8*pi rad/s (:310-312), and 4 rotor thrusts integrating at 200 N/s clamped to
[0, 2] N applied along each rotor's LOCAL z (:314-330).  Hover target
(0, 0, 1); obs = [(target-pos)/3, quat, linvel/2, angvel/pi, dof_pos(8)];
reward/reset kernel mirrors :389-440 (die on dist > 3 or z < 0.3).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import (DRIVE_POS, FREE, GEOM_CYLINDER, GEOM_SPHERE,
                            HINGE, ModelBuilder)
from ..ops import maths
from ..physics.engine import Control, SimState
from .base import EnvState, VecTaskBase, masked_update

TASK_CFG = {
    "name": "Quadcopter",
    "physics_engine": "physx",
    "env": {
        "numEnvs": 4096,
        "envSpacing": 1.25,
        "episodeLength": 500,
        "enableDebugVis": False,
        "clipObservations": 5.0,
        "clipActions": 1.0,
    },
    "sim": {
        "dt": 0.01,
        "substeps": 2,
        "up_axis": "z",
        "use_gpu_pipeline": True,
        "gravity": [0.0, 0.0, -9.81],
        "physx": {
            "num_threads": 4, "solver_type": 1, "use_gpu": True,
            "num_position_iterations": 4, "num_velocity_iterations": 0,
            "contact_offset": 0.02, "rest_offset": 0.001,
            "bounce_threshold_velocity": 0.2, "max_depenetration_velocity": 1000.0,
            "default_buffer_size_multiplier": 5.0,
            "max_gpu_contact_pairs": 1048576, "contact_collection": 0,
        },
    },
    "task": {"randomize": False},
}

CHASSIS_RADIUS = 0.1
ROTOR_ARM_RADIUS = 0.01
ROTOR_RADIUS = 0.04


def build_quadcopter():
    b = ModelBuilder()
    b.begin_actor()
    chassis = b.add_body("chassis", -1, FREE, body_pos=(0, 0, 1.0))
    b.add_geom(chassis, GEOM_CYLINDER, (CHASSIS_RADIUS, 0.015, 0.0), density=50.0)
    rotors = []
    angles = [0.25 * math.pi, 0.75 * math.pi, 1.25 * math.pi, 1.75 * math.pi]
    arm_off = CHASSIS_RADIUS + 0.25 * ROTOR_ARM_RADIUS
    rotor_off = ROTOR_RADIUS + 0.25 * ROTOR_ARM_RADIUS
    for i, a in enumerate(angles):
        qz = np.array([0.0, 0.0, math.sin(a / 2), math.cos(a / 2)])
        pos = np.array([arm_off * math.cos(a), arm_off * math.sin(a), 0.0])
        arm = b.add_body(f"rotor_arm_{i}", chassis, HINGE, jnt_axis=(0, 1, 0),
                         body_pos=pos, body_quat=qz,
                         limit_lower=-math.pi / 6, limit_upper=math.pi / 6)
        b.add_geom(arm, GEOM_SPHERE, (ROTOR_ARM_RADIUS, 0, 0), density=200.0,
                   contact=False)
        rotor = b.add_body(f"rotor_{i}", arm, HINGE, jnt_axis=(1, 0, 0),
                           body_pos=(rotor_off, 0, 0),
                           limit_lower=-math.pi / 6, limit_upper=math.pi / 6)
        b.add_geom(rotor, GEOM_CYLINDER, (ROTOR_RADIUS, 0.005, 0.0),
                   density=1000.0, contact=False)
        rotors.append(rotor)
    m = b.finalize()
    for d in range(6, m.nv):
        m.dof_drive_mode[d] = DRIVE_POS
        m.dof_stiffness[d] = 1000.0
        m.dof_drive_damping[d] = 0.0
    return m, rotors


class QuadTaskState(NamedTuple):
    dof_targets: jax.Array  # (N, 8)
    thrusts: jax.Array      # (N, 4)


class Quadcopter(VecTaskBase):
    reset_in_pre_physics = True

    def __init__(self, cfg):
        cfg["env"]["numObservations"] = 21
        cfg["env"]["numActions"] = 12
        super().__init__(cfg)
        self.max_thrust = 2.0
        m = self.model
        self.dof_lower = jnp.asarray(
            np.asarray(m.dof_lower)[self.engine.scalar_dofs], jnp.float32)
        self.dof_upper = jnp.asarray(
            np.asarray(m.dof_upper)[self.engine.scalar_dofs], jnp.float32)

    def create_model(self):
        model, rotors = build_quadcopter()
        self.rotor_bodies = np.asarray(rotors)
        return model, True

    def initial_task_state(self):
        n = self.num_envs
        return QuadTaskState(dof_targets=jnp.zeros((n, 8), jnp.float32),
                             thrusts=jnp.zeros((n, 4), jnp.float32))

    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        n = self.num_envs
        task: QuadTaskState = state.task
        rmask = (state.reset_buf > 0)[:, None]
        targets = jnp.clip(
            task.dof_targets + self.dt * 8.0 * math.pi * actions[:, 0:8],
            self.dof_lower, self.dof_upper)
        thrusts = jnp.clip(task.thrusts + self.dt * 200.0 * actions[:, 8:12],
                           0.0, self.max_thrust)
        # reset envs: zero thrust, hold current dof positions (:324-326)
        targets = jnp.where(rmask, self.engine.dof_pos(state.sim), targets)
        thrusts = jnp.where(rmask, 0.0, thrusts)
        self._new_task = QuadTaskState(dof_targets=targets, thrusts=thrusts)

        # thrust along each rotor body's local z -> world
        bx, bq = self.engine.fk(state.sim.q)
        f_ext = jnp.zeros((n, self.engine.nb, 6), jnp.float32)
        for i, rb in enumerate(self.rotor_bodies):
            z_w = maths.quat_axis(bq[:, rb], 2)
            f_ext = f_ext.at[:, rb, 3:6].set(thrusts[:, i: i + 1] * z_w)
        pos_target = jnp.zeros((n, self.engine.nv), jnp.float32)
        pos_target = pos_target.at[:, self.engine.scalar_dofs].set(targets)
        return Control(tau=jnp.zeros((n, self.engine.nv), jnp.float32),
                       pos_target=pos_target,
                       vel_target=jnp.zeros((n, self.engine.nv), jnp.float32),
                       f_ext=f_ext)

    def reset_idx(self, sim: SimState, task: QuadTaskState, mask, key):
        n = self.num_envs
        k1, k2, k3 = jax.random.split(key, 3)
        off = jnp.concatenate([
            jax.random.uniform(k1, (n, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(k2, (n, 1), minval=-0.2, maxval=1.5)], -1)
        root = jnp.concatenate([jnp.array([0.0, 0, 1.0]) + off,
                                jnp.broadcast_to(jnp.array([0.0, 0, 0, 1]), (n, 4))], -1)
        sim = SimState(
            sim.q.at[:, 0:7].set(masked_update(mask, root, sim.q[:, 0:7])),
            sim.qd.at[:, 0:6].set(masked_update(mask, jnp.zeros((n, 6)),
                                                sim.qd[:, 0:6])))
        dof = jax.random.uniform(k3, (n, 8), minval=-0.2, maxval=0.2)
        sim = self.engine.set_dof_pos(
            sim, masked_update(mask, dof, self.engine.dof_pos(sim)))
        sim = self.engine.set_dof_vel(
            sim, masked_update(mask, jnp.zeros((n, 8)), self.engine.dof_vel(sim)))
        return sim, task

    def post_physics(self, state: EnvState, out, actions):
        root = out.root_states[:, 0]
        root_pos, root_quat = root[:, 0:3], root[:, 3:7]
        linvel, angvel = root[:, 7:10], root[:, 10:13]
        dof_pos = self.engine.dof_pos(state.sim)
        target = jnp.array([0.0, 0.0, 1.0])
        obs = jnp.concatenate([
            (target - root_pos) / 3.0, root_quat, linvel / 2.0,
            angvel / math.pi, dof_pos], -1)

        target_dist = jnp.linalg.norm(root_pos - target, axis=-1)
        pos_reward = 1.0 / (1.0 + target_dist * target_dist)
        ups = maths.quat_axis(root_quat, 2)
        tiltage = jnp.abs(1.0 - ups[:, 2])
        up_reward = 1.0 / (1.0 + tiltage * tiltage)
        spinnage = jnp.abs(angvel[:, 2])
        spin_reward = 1.0 / (1.0 + spinnage * spinnage)
        rew = pos_reward + pos_reward * (up_reward + spin_reward)

        die = (target_dist > 3.0) | (root_pos[:, 2] < 0.3)
        reset = jnp.where(state.progress >= self.max_episode_length - 1, 1,
                          die.astype(jnp.int32))
        return obs, None, rew, reset, self._new_task, {}
