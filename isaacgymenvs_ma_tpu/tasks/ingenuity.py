"""Ingenuity Mars helicopter (reference tasks/ingenuity.py) — obs 13 / act 6.

Free-flying chassis with two coaxial rotor bodies; actions command per-rotor
thrust vectors applied in the rotor's LOCAL frame (:341-358,
``apply_rigid_body_force_tensors(..., LOCAL_SPACE)``), Mars gravity -3.721
(:114-117).  Targets resample every 500 steps mid-episode (:322-326);
obs = [(target-pos)/3, quat, linvel/2, angvel/pi] (:389-394);
pos/up/spin reward with distance gating (kernel :410-440).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import FIXED, FREE, GEOM_BOX, GEOM_CYLINDER, ModelBuilder
from ..ops import maths
from ..physics.engine import Control, PhysicsEngine, SimState
from .base import EnvState, VecTaskBase, masked_update

TASK_CFG = {
    "name": "Ingenuity",
    "physics_engine": "physx",
    "env": {
        "numEnvs": 4096,
        "envSpacing": 2.5,
        "episodeLength": 2000,
        "enableDebugVis": False,
        "clipObservations": 5.0,
        "clipActions": 1.0,
    },
    "sim": {
        "dt": 0.01,
        "substeps": 2,
        "up_axis": "z",
        "use_gpu_pipeline": True,
        "gravity": [0.0, 0.0, -3.721],  # Mars (ref :114-117)
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


def build_ingenuity():
    """Chassis box (0.06 half, density 50) + two locked rotor cylinders
    (r 0.15, half-thickness 0.005, density 1000) at z=0 and z=0.025."""
    b = ModelBuilder()
    b.begin_actor()
    chassis = b.add_body("chassis", -1, FREE, body_pos=(0, 0, 1.0))
    b.add_geom(chassis, GEOM_BOX, (0.06, 0.06, 0.06), density=50.0)
    rotors = []
    for i in range(2):
        r = b.add_body(f"rotor_physics_{i}", chassis, FIXED,
                       body_pos=(0, 0, 0.025 * i))
        b.add_geom(r, GEOM_CYLINDER, (0.15, 0.005, 0.0), density=1000.0,
                   contact=False)
        rotors.append(r)
    m = b.finalize()
    return m, rotors


class IngenuityTaskState(NamedTuple):
    target: jax.Array  # (N, 3)


class Ingenuity(VecTaskBase):
    def __init__(self, cfg):
        cfg["env"]["numObservations"] = 13
        cfg["env"]["numActions"] = 6
        super().__init__(cfg)
        self.thrust_upper_limit = 2000.0
        self.thrust_lateral_component = 0.2

    def create_model(self):
        model, rotors = build_ingenuity()
        self.rotor_bodies = np.asarray(rotors)
        return model, True

    def build_engine(self, model, ground):
        return PhysicsEngine(model, self.sim_params, ground=ground)

    def initial_task_state(self):
        t = jnp.zeros((self.num_envs, 3), jnp.float32).at[:, 2].set(1.0)
        return IngenuityTaskState(target=t)

    # ------------------------------------------------------------------
    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        n = self.num_envs
        scale = 2000.0
        v0 = jnp.clip(actions[:, 2] * scale, -self.thrust_upper_limit,
                      self.thrust_upper_limit)
        v1 = jnp.clip(actions[:, 5] * scale, -self.thrust_upper_limit,
                      self.thrust_upper_limit)
        lat0 = jnp.clip(actions[:, 0:2], -self.thrust_lateral_component,
                        self.thrust_lateral_component)
        lat1 = jnp.clip(actions[:, 3:5], -self.thrust_lateral_component,
                        self.thrust_lateral_component)
        t0z = self.dt * v0
        t1z = self.dt * v1
        thrust0 = jnp.concatenate([t0z[:, None] * lat0, t0z[:, None]], -1)
        thrust1 = jnp.concatenate([t1z[:, None] * lat1, t1z[:, None]], -1)
        # local -> world: rotors are fixed to the chassis, use its orientation
        root_quat = state.sim.q[:, 3:7]
        f0 = maths.quat_apply(root_quat, thrust0)
        f1 = maths.quat_apply(root_quat, thrust1)
        # reference zeroes forces for envs being reset this step (:356)
        rmask = (state.reset_buf > 0)[:, None]
        f0 = jnp.where(rmask, 0.0, f0)
        f1 = jnp.where(rmask, 0.0, f1)
        f_ext = jnp.zeros((n, self.engine.nb, 6), jnp.float32)
        f_ext = f_ext.at[:, self.rotor_bodies[0], 3:6].set(f0)
        f_ext = f_ext.at[:, self.rotor_bodies[1], 3:6].set(f1)
        return Control(tau=jnp.zeros((n, self.engine.nv), jnp.float32),
                       f_ext=f_ext)

    def reset_idx(self, sim: SimState, task: IngenuityTaskState, mask, key):
        n = self.num_envs
        k1, k2, k3 = jax.random.split(key, 3)
        off = jnp.concatenate([
            jax.random.uniform(k1, (n, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(k2, (n, 1), minval=-0.2, maxval=1.5)], -1)
        root0 = jnp.array([0.0, 0.0, 1.0])
        q = jnp.concatenate([root0 + off,
                             jnp.broadcast_to(jnp.array([0.0, 0, 0, 1]), (n, 4))], -1)
        sim = SimState(
            sim.q.at[:, 0:7].set(masked_update(mask, q, sim.q[:, 0:7])),
            sim.qd.at[:, 0:6].set(masked_update(mask, jnp.zeros((n, 6)),
                                                sim.qd[:, 0:6])))
        task = IngenuityTaskState(target=self._sample_targets(k3, mask, task.target))
        return sim, task

    def _sample_targets(self, key, mask, cur):
        n = self.num_envs
        k1, k2 = jax.random.split(key)
        t = jnp.concatenate([
            jax.random.uniform(k1, (n, 2)) * 10.0 - 5.0,
            (jax.random.uniform(k2, (n, 1)) + 1.0)], -1)
        return masked_update(mask, t, cur)

    def post_physics(self, state: EnvState, out, actions):
        task: IngenuityTaskState = state.task
        # mid-episode target resampling every 500 steps (:322-326)
        retarget = (state.progress % 500) == 0
        key_t = jax.random.fold_in(state.rng, 31)
        target = self._sample_targets(key_t, retarget, task.target)

        root = out.root_states[:, 0]
        root_pos, root_quat = root[:, 0:3], root[:, 3:7]
        linvel, angvel = root[:, 7:10], root[:, 10:13]
        obs = jnp.concatenate([
            (target - root_pos) / 3.0, root_quat, linvel / 2.0,
            angvel / math.pi], -1)

        target_dist = jnp.linalg.norm(target - root_pos, axis=-1)
        pos_reward = 1.0 / (1.0 + target_dist * target_dist)
        ups = maths.quat_axis(root_quat, 2)
        tiltage = jnp.abs(1.0 - ups[:, 2])
        up_reward = 5.0 / (1.0 + tiltage * tiltage)
        spinnage = jnp.abs(angvel[:, 2])
        spin_reward = 1.0 / (1.0 + spinnage * spinnage)
        rew = pos_reward + pos_reward * (up_reward + spin_reward)

        die = (target_dist > 8.0) | (root_pos[:, 2] < 0.5)
        reset = jnp.where(state.progress >= self.max_episode_length - 1, 1,
                          die.astype(jnp.int32))
        return obs, None, rew, reset, IngenuityTaskState(target=target), {}
