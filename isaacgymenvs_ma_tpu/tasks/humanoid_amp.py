"""HumanoidAMP — motion-imitation humanoid (reference tasks/humanoid_amp.py +
tasks/amp/humanoid_amp_base.py) — obs 105 / act 28.

The AMP humanoid (15 bodies, 28 dofs: eight 3-hinge exp-map clusters + four
1-dof knees/elbows — amp_humanoid.xml) with:
* task obs == AMP obs layout (NUM_OBS = 13+52+28+12: root height, root
  rotation as 6d tan-norm, heading-local root velocities, exp-map dof obs
  (dof_to_obs :463-492), dof velocities, heading-local key-body positions —
  ``build_amp_observations`` humanoid_amp.py:300-334),
* Reference State Init: resets sample (root, dof) states from the MotionLib
  (:182-224),
* 2-step AMP observation history emitted in ``extras['amp_obs']`` for the
  discriminator (:75-103), demo pairs via ``fetch_amp_obs_demo`` (:105-134),
* PD control with action offset/scale from dof limits (humanoid_amp_base
  :260-290), early termination on non-foot body contact.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..learning.motion_lib import (DOF_OFFSETS, KEY_BODY_NAMES, MotionLib,
                                   NUM_DOF)
from ..models.model import DRIVE_POS, model_from_spec
from ..ops import maths
from ..physics.engine import Control, SimState
from .base import EnvState, VecTaskBase, masked_update

NUM_AMP_OBS_PER_STEP = 13 + 52 + 28 + 12  # humanoid_amp.py:46

TASK_CFG = {
    "name": "HumanoidAMP",
    "physics_engine": "physx",
    "env": {
        "numEnvs": 4096,
        "envSpacing": 5,
        "episodeLength": 300,
        "cameraFollow": True,
        "enableDebugVis": False,
        "pdControl": True,
        "powerScale": 1.0,
        "controlFrequencyInv": 2,  # 30 Hz control (cfg/task/HumanoidAMP.yaml)
        "stateInit": "Random",
        "hybridInitProb": 0.5,
        "numAMPObsSteps": 2,
        "localRootObs": False,
        "contactBodies": ["right_foot", "left_foot"],
        "terminationHeight": 0.5,
        "enableEarlyTermination": True,
        "motion_file": "amp_humanoid_walk.npy",
        "asset": {},
        "clipObservations": 5.0,
        "clipActions": 1.0,
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
            "contact_capacity": 16,  # 42 candidate rows
            "contact_offset": 0.02, "rest_offset": 0.0,
            "bounce_threshold_velocity": 0.2, "max_depenetration_velocity": 10.0,
            "default_buffer_size_multiplier": 5.0,
            "max_gpu_contact_pairs": 8388608, "contact_collection": 2,
        },
    },
    "task": {"randomize": False},
}

# checked-in real mocap clips (SFU-derived, BSD-3 data ingested through the
# poselib retarget pipeline — scripts/ingest_reference_motions.py); falls
# back to an external reference checkout when the repo data is absent
MOTIONS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "motions")
if not os.path.isdir(MOTIONS_DIR):
    MOTIONS_DIR = "/root/reference/assets/amp/motions"


def dof_to_obs(pose: jax.Array) -> jax.Array:
    """28 dof -> 52-dim obs: exp-map triplets as tan-norm 6d, hinges raw
    (humanoid_amp_base.py:463-492)."""
    pieces = []
    for j in range(len(DOF_OFFSETS) - 1):
        off = DOF_OFFSETS[j]
        size = DOF_OFFSETS[j + 1] - off
        jp = pose[:, off: off + size]
        if size == 3:
            q = maths.exp_map_to_quat(jp)
            pieces.append(maths.quat_to_tan_norm(q))
        else:
            pieces.append(jp)
    return jnp.concatenate(pieces, axis=-1)


def build_amp_observations(root_states, dof_pos, dof_vel, key_body_pos,
                           local_root_obs: bool) -> jax.Array:
    """(humanoid_amp.py:300-334)."""
    root_pos = root_states[:, 0:3]
    root_rot = root_states[:, 3:7]
    root_vel = root_states[:, 7:10]
    root_ang_vel = root_states[:, 10:13]
    root_h = root_pos[:, 2:3]
    heading_rot = maths.calc_heading_quat_inv(root_rot)
    root_rot_obs = maths.quat_mul(heading_rot, root_rot) if local_root_obs \
        else root_rot
    root_rot_obs = maths.quat_to_tan_norm(root_rot_obs)
    local_root_vel = maths.quat_apply(heading_rot, root_vel)
    local_root_ang_vel = maths.quat_apply(heading_rot, root_ang_vel)
    local_key = key_body_pos - root_pos[:, None, :]
    local_key = maths.quat_apply(heading_rot[:, None, :], local_key)
    flat_key = local_key.reshape(local_key.shape[0], -1)
    return jnp.concatenate([
        root_h, root_rot_obs, local_root_vel, local_root_ang_vel,
        dof_to_obs(dof_pos), dof_vel, flat_key], axis=-1)


class AMPTaskState(NamedTuple):
    amp_obs_hist: jax.Array  # (N, num_steps, 105)


class HumanoidAMP(VecTaskBase):
    def __init__(self, cfg):
        e = cfg["env"]
        e["numObservations"] = NUM_AMP_OBS_PER_STEP
        e["numActions"] = NUM_DOF
        self.pd_control = bool(e.get("pdControl", True))
        self.num_amp_obs_steps = int(e.get("numAMPObsSteps", 2))
        self.local_root_obs = bool(e.get("localRootObs", False))
        self.termination_height = float(e.get("terminationHeight", 0.5))
        self.enable_early_termination = bool(e.get("enableEarlyTermination", True))
        super().__init__(cfg)
        self.num_amp_obs = self.num_amp_obs_steps * NUM_AMP_OBS_PER_STEP

        m = self.model
        names = m.body_names
        # real (non-dummy) bodies carry the key/contact names
        self.key_body_ids = np.asarray(
            [names.index(n) for n in KEY_BODY_NAMES], np.int32)
        contact_names = e.get("contactBodies", ["right_foot", "left_foot"])
        self.contact_body_ids = np.asarray(
            [names.index(n) for n in contact_names], np.int32)
        self.nonfoot_bodies = np.asarray(
            [i for i in range(m.nb) if i not in self.contact_body_ids], np.int32)

        # PD action offset/scale from dof limits (humanoid_amp_base:260-290)
        lo = np.asarray(m.dof_lower)[self.engine.scalar_dofs]
        hi = np.asarray(m.dof_upper)[self.engine.scalar_dofs]
        lo = np.where(lo < -np.pi, -np.pi, lo)
        hi = np.where(hi > np.pi, np.pi, hi)
        self.pd_offset = jnp.asarray(0.5 * (hi + lo), jnp.float32)
        self.pd_scale = jnp.asarray(0.5 * (hi - lo) * 0.7, jnp.float32)

        motion_file = e.get("motion_file", "amp_humanoid_walk.npy")
        if not os.path.isabs(motion_file):
            motion_file = os.path.join(MOTIONS_DIR, motion_file)
        self.policy_dt = self.dt * self.control_freq_inv
        if os.path.exists(motion_file):
            self.motion_lib = MotionLib(motion_file, dt=self.policy_dt)
        else:
            self.motion_lib = None
            print(f"[HumanoidAMP] motion file {motion_file} missing — "
                  f"falling back to default-state resets")

    def create_model(self):
        from ..models.specs.amp_humanoid import SPEC
        model = model_from_spec(SPEC)
        # PD drives on all 28 dofs; gains from actuator gears
        gear_by_dof = {}
        for dof, gear in zip(np.asarray(model.actuator_dof),
                             np.asarray(model.actuator_gear)):
            gear_by_dof[int(dof)] = float(gear)
        for d in range(6, model.nv):
            model.dof_drive_mode[d] = DRIVE_POS
            g = gear_by_dof.get(d, 100.0)
            model.dof_stiffness[d] = g
            model.dof_drive_damping[d] = g / 10.0
        return model, True

    def initial_task_state(self):
        return AMPTaskState(amp_obs_hist=jnp.zeros(
            (self.num_envs, self.num_amp_obs_steps, NUM_AMP_OBS_PER_STEP),
            jnp.float32))

    # ------------------------------------------------------------------
    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        n = self.num_envs
        if self.pd_control:
            targets = self.pd_offset + self.pd_scale * actions
            pos_target = jnp.zeros((n, self.engine.nv), jnp.float32)
            pos_target = pos_target.at[:, self.engine.scalar_dofs].set(targets)
            return Control(tau=jnp.zeros((n, self.engine.nv), jnp.float32),
                           pos_target=pos_target,
                           vel_target=jnp.zeros((n, self.engine.nv), jnp.float32))
        tau = jnp.zeros((n, self.engine.nv), jnp.float32)
        tau = tau.at[:, 6:].set(actions * 100.0)
        return Control(tau=tau)

    def reset_idx(self, sim: SimState, task: AMPTaskState, mask, key):
        """Reference State Init from the motion library (:182-224)."""
        n = self.num_envs
        k1, k2 = jax.random.split(key)
        if self.motion_lib is not None:
            ids = self.motion_lib.sample_motions(k1, n)
            times = self.motion_lib.sample_time(k2, ids)
            s = self.motion_lib.get_motion_state(ids, times)
            root = jnp.concatenate([s["root_pos"], s["root_rot"]], -1)
            root_vel = jnp.concatenate([s["root_vel"], s["root_ang_vel"]], -1)
            dof_pos, dof_vel = s["dof_pos"], s["dof_vel"]
        else:
            root = jnp.concatenate([
                jnp.tile(jnp.array([0.0, 0, 0.89, 0, 0, 0, 1]), (n, 1))], -1)
            root_vel = jnp.zeros((n, 6))
            dof_pos = jnp.zeros((n, NUM_DOF))
            dof_vel = jnp.zeros((n, NUM_DOF))
        sim = self.engine.set_dof_pos(
            sim, masked_update(mask, dof_pos, self.engine.dof_pos(sim)))
        sim = self.engine.set_dof_vel(
            sim, masked_update(mask, dof_vel, self.engine.dof_vel(sim)))
        q = masked_update(mask, root, sim.q[:, 0:7])
        qd = masked_update(mask, root_vel, sim.qd[:, 0:6])
        sim = SimState(sim.q.at[:, 0:7].set(q), sim.qd.at[:, 0:6].set(qd))
        task = AMPTaskState(amp_obs_hist=masked_update(
            mask, jnp.zeros_like(task.amp_obs_hist), task.amp_obs_hist))
        return sim, task

    def post_physics(self, state: EnvState, out, actions):
        task: AMPTaskState = state.task
        root = out.root_states[:, 0]
        dof_pos = self.engine.dof_pos(state.sim)
        dof_vel = self.engine.dof_vel(state.sim)
        key_pos = out.body_pos[:, self.key_body_ids]
        obs = build_amp_observations(root, dof_pos, dof_vel, key_pos,
                                     self.local_root_obs)
        # amp history: shift in the current frame (humanoid_amp.py:271-297)
        hist = jnp.concatenate([obs[:, None], task.amp_obs_hist[:, :-1]], 1)

        rew = jnp.ones(self.num_envs, jnp.float32)  # style reward from disc
        fallen = jnp.zeros(self.num_envs, dtype=bool)
        if self.enable_early_termination:
            nf = self.nonfoot_bodies
            contact = jnp.linalg.norm(out.contact_force[:, nf], axis=-1) > 1.0
            low = out.body_pos[:, nf, 2] < self.termination_height
            fallen = jnp.any(contact & low, axis=-1)
        reset = jnp.where(
            fallen | (state.progress >= self.max_episode_length - 1), 1, 0)
        extras = {"amp_obs": hist.reshape(self.num_envs, -1)}
        return obs, None, rew, reset.astype(jnp.int32), \
            AMPTaskState(amp_obs_hist=hist), extras

    # -- demo fetch (humanoid_amp.py:105-134) ---------------------------
    def fetch_amp_obs_demo(self, key, num_samples: int):
        assert self.motion_lib is not None
        s0, s1 = self.motion_lib.sample_state_pairs(key, num_samples,
                                                    self.policy_dt)
        obs = []
        for s in (s1, s0):
            root = jnp.concatenate([
                s["root_pos"], s["root_rot"], s["root_vel"],
                s["root_ang_vel"]], -1)
            obs.append(build_amp_observations(
                root, s["dof_pos"], s["dof_vel"], s["key_pos"],
                self.local_root_obs))
        return jnp.concatenate(obs, axis=-1)  # (num_samples, 2 * 105)
