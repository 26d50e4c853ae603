"""BallBalance (reference tasks/ball_balance.py) — obs 24 / act 3.

A free-floating tripod "balance bot" (tray + 3 two-segment legs, built
procedurally with the generator's exact parameters, :136-225) balances a ball
dropped onto the tray.  Mechanics exercised here that make this task special:

* **position-PD drives** on the lower-leg dofs (kp 4000 / kd 100, :289-299)
  with rate-integrated position targets (``targets += dt * speed_scale * a``,
  :419-420) — our engine handles these implicitly, stable at 1/120 s,
* **rigid-body attractors** pinning the feet to the ground (:306-320), solved
  as bilateral point constraints,
* **ball <-> tray body-pair contact** (sphere vs cylinder SDF),
* 3 offset **force sensors** on the tray (:265-271),
* resets happen in ``pre_physics_step`` (:407-412), unlike the usual pattern.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import (DRIVE_POS, FREE, GEOM_CAPSULE, GEOM_CYLINDER,
                            GEOM_SPHERE, HINGE, ModelBuilder)
from ..ops import rng as rng_ops
from ..physics.engine import Control, SimState
from .base import EnvState, VecTaskBase, masked_update

TASK_CFG = {
    "name": "BallBalance",
    "physics_engine": "physx",
    "env": {
        "numEnvs": 4096,
        "envSpacing": 2.0,
        "maxEpisodeLength": 500,
        "actionSpeedScale": 20,
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
            "num_position_iterations": 8, "num_velocity_iterations": 0,
            "contact_offset": 0.02, "rest_offset": 0.001,
            "bounce_threshold_velocity": 0.2, "max_depenetration_velocity": 1000.0,
            "default_buffer_size_multiplier": 5.0,
            "max_gpu_contact_pairs": 1048576, "contact_collection": 0,
        },
    },
    "task": {"randomize": False},
}

# generator parameters (ref :139-146)
TRAY_RADIUS = 0.5
TRAY_THICKNESS = 0.02
LEG_RADIUS = 0.02
LEG_OUTER_OFFSET = TRAY_RADIUS - 0.1
LEG_LENGTH = LEG_OUTER_OFFSET - 2 * LEG_RADIUS
LEG_INNER_OFFSET = LEG_OUTER_OFFSET - LEG_LENGTH / math.sqrt(2)
TRAY_HEIGHT = LEG_LENGTH * math.sqrt(2) + 2 * LEG_RADIUS + 0.5 * TRAY_THICKNESS
BALL_RADIUS = 0.1
LEG_ANGLES = [0.0, 2.0 / 3.0 * math.pi, 4.0 / 3.0 * math.pi]


def _euler_zyx_quat(roll, pitch, yaw):
    """gymapi.Quat.from_euler_zyx(r, p, y): R = Rz(y) @ Ry(p) @ Rx(r)."""
    cr, sr = math.cos(roll / 2), math.sin(roll / 2)
    cp, sp = math.cos(pitch / 2), math.sin(pitch / 2)
    cy, sy = math.cos(yaw / 2), math.sin(yaw / 2)
    return np.array([
        cy * cp * sr - sy * sp * cr,
        cy * sp * cr + sy * cp * sr,
        sy * cp * cr - cy * sp * sr,
        cy * cp * cr + sy * sp * sr,
    ])


def build_balance_bot():
    """Tripod + ball scene with the reference generator's parameters."""
    b = ModelBuilder()
    b.begin_actor()
    tray = b.add_body("tray", -1, FREE, body_pos=(0, 0, TRAY_HEIGHT))
    tray_geom = b.add_geom(tray, GEOM_CYLINDER,
                           (TRAY_RADIUS, 0.5 * TRAY_THICKNESS, 0.0),
                           density=100.0)
    attractor_specs = []
    lower_legs = []
    for i, angle in enumerate(LEG_ANGLES):
        ca, sa = math.cos(angle), math.sin(angle)
        up_from = np.array([LEG_OUTER_OFFSET * ca, LEG_OUTER_OFFSET * sa,
                            -LEG_RADIUS - 0.5 * TRAY_THICKNESS])
        up_to = np.array([LEG_INNER_OFFSET * ca, LEG_INNER_OFFSET * sa,
                          up_from[2] - LEG_LENGTH / math.sqrt(2)])
        up_pos = 0.5 * (up_from + up_to)
        up_quat = _euler_zyx_quat(0.0, -0.75 * math.pi, angle)
        upper = b.add_body(
            f"upper_leg{i}", tray, HINGE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -0.5 * LEG_LENGTH),
            body_pos=up_pos, body_quat=up_quat,
            limit_lower=-math.pi / 4, limit_upper=math.pi / 4,
        )
        b.add_geom(upper, GEOM_CAPSULE, (LEG_RADIUS, 0.5 * LEG_LENGTH, 0.0),
                   density=1000.0)
        lower = b.add_body(
            f"lower_leg{i}", upper, HINGE, jnt_axis=(0, 1, 0),
            jnt_pos=(0, 0, -0.5 * LEG_LENGTH),
            body_pos=(-0.5 * LEG_LENGTH, 0, 0.5 * LEG_LENGTH),
            body_quat=_euler_zyx_quat(0.0, -0.5 * math.pi, 0.0),
            limit_lower=np.deg2rad(-70), limit_upper=np.deg2rad(90),
        )
        b.add_geom(lower, GEOM_CAPSULE, (LEG_RADIUS, 0.5 * LEG_LENGTH, 0.0),
                   density=1000.0)
        lower_legs.append(lower)
        # attractor pins the foot (far end of the lower leg) to the ground
        # at the leg's mount radius (ref :306-320)
        attractor_specs.append((
            lower, np.array([0.0, 0.0, 0.5 * LEG_LENGTH]),
            np.array([LEG_OUTER_OFFSET * ca, LEG_OUTER_OFFSET * sa, LEG_RADIUS]),
        ))
        # tray force sensor at the leg mount (ref :265-271)
        b.add_force_sensor(tray, (LEG_OUTER_OFFSET * ca, LEG_OUTER_OFFSET * sa, 0.0))

    # ball actor (ref :273-277, start pose x=0.2 z=2.0)
    b.begin_actor()
    ball = b.add_body("ball", -1, FREE, body_pos=(0.2, 0, 2.0))
    ball_geom = b.add_geom(ball, GEOM_SPHERE, (BALL_RADIUS, 0, 0), density=200.0)

    m = b.finalize()
    # drive modes: lower-leg dofs position-PD kp 4000 / kd 100 (ref :289-299)
    for i, lower in enumerate(lower_legs):
        va = int(m.v_adr[lower])
        m.dof_drive_mode[va] = DRIVE_POS
        m.dof_stiffness[va] = 4000.0
        m.dof_drive_damping[va] = 100.0
    return m, (ball_geom, tray_geom), attractor_specs


class BBTaskState(NamedTuple):
    dof_position_targets: jax.Array  # (N, 6)


class BallBalance(VecTaskBase):
    reset_in_pre_physics = True

    def __init__(self, cfg):
        cfg["env"]["numObservations"] = 24
        cfg["env"]["numActions"] = 3
        cfg["env"]["episodeLength"] = int(cfg["env"].get("maxEpisodeLength", 500))
        self.action_speed_scale = float(cfg["env"]["actionSpeedScale"])
        super().__init__(cfg)
        m = self.model
        # bbot dofs are the 6 hinge dofs; actuated = lower legs [1, 3, 5]
        self.bbot_dof_lower = jnp.asarray(
            np.asarray(m.dof_lower)[self.engine.scalar_dofs], jnp.float32)
        self.bbot_dof_upper = jnp.asarray(
            np.asarray(m.dof_upper)[self.engine.scalar_dofs], jnp.float32)
        self.actuated = np.array([1, 3, 5])
        # ball free-joint addresses
        self.ball_body = m.body_names.index("ball")
        self.ball_qa = int(m.q_adr[self.ball_body])
        self.ball_va = int(m.v_adr[self.ball_body])

    def create_model(self):
        model, pair, attractors = build_balance_bot()
        self._pair = pair
        self._attractors = attractors
        return model, True

    def build_engine(self, model, ground):
        from ..physics.engine import PhysicsEngine
        return PhysicsEngine(model, self.sim_params, ground=ground,
                             pair_specs=[self._pair], attractors=self._attractors)

    # ------------------------------------------------------------------
    def initial_task_state(self):
        return BBTaskState(
            dof_position_targets=jnp.zeros((self.num_envs, 6), jnp.float32))

    def pre_physics(self, state: EnvState, actions: jax.Array) -> Control:
        task: BBTaskState = state.task
        targets = task.dof_position_targets
        upd = jnp.zeros_like(targets).at[:, self.actuated].set(
            self.dt * self.action_speed_scale * actions)
        targets = jnp.clip(targets + upd, self.bbot_dof_lower, self.bbot_dof_upper)
        # reference zeroes targets of envs reset this very step AFTER the
        # increment (ref :416-421)
        targets = jnp.where((state.reset_buf > 0)[:, None], 0.0, targets)
        self._new_targets = targets  # picked up in post via task state update
        pos_target = jnp.zeros((self.num_envs, self.engine.nv), jnp.float32)
        pos_target = pos_target.at[:, self.engine.scalar_dofs].set(targets)
        return Control(
            tau=jnp.zeros((self.num_envs, self.engine.nv), jnp.float32),
            pos_target=pos_target,
            vel_target=jnp.zeros((self.num_envs, self.engine.nv), jnp.float32),
        )

    def reset_idx(self, sim: SimState, task: BBTaskState, mask, key):
        n = self.num_envs
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # bbot: zero dofs, tray back to construction pose
        sim = self.engine.set_dof_pos(
            sim, masked_update(mask, jnp.zeros((n, 6)), self.engine.dof_pos(sim)))
        sim = self.engine.set_dof_vel(
            sim, masked_update(mask, jnp.zeros((n, 6)), self.engine.dof_vel(sim)))
        tray0 = jnp.concatenate(
            [jnp.array([0.0, 0.0, TRAY_HEIGHT, 0, 0, 0, 1]), jnp.zeros(6)])
        q = masked_update(mask, jnp.broadcast_to(tray0[:7], (n, 7)), sim.q[:, 0:7])
        qd = masked_update(mask, jnp.zeros((n, 6)), sim.qd[:, 0:6])
        sim = SimState(sim.q.at[:, 0:7].set(q), sim.qd.at[:, 0:6].set(qd))

        # ball: random drop (ref :369-393)
        dists = rng_ops.rand_float(k1, 0.001, 0.5, (n, 1))
        dirs = rng_ops.random_dir_2(k2, (n, 1))[:, 0, :]
        hpos = dists * dirs
        speedscales = (dists - 0.001) / (0.5 - 0.001)
        hspeeds = rng_ops.rand_float(k3, 0.0, 5.0, (n, 1))
        hvels = -speedscales * hspeeds * dirs
        height = rng_ops.rand_float(k4, 1.0, 2.0, (n,))
        ball_q = jnp.concatenate([
            hpos[:, 0:1], hpos[:, 1:2], height[:, None],
            jnp.zeros((n, 3)), jnp.ones((n, 1))], axis=-1)
        ball_qd = jnp.concatenate([
            hvels[:, 0:1], hvels[:, 1:2], jnp.full((n, 1), -5.0),
            jnp.zeros((n, 3))], axis=-1)
        qa, va = self.ball_qa, self.ball_va
        bq = masked_update(mask, ball_q, sim.q[:, qa: qa + 7])
        bqd = masked_update(mask, ball_qd, sim.qd[:, va: va + 6])
        sim = SimState(sim.q.at[:, qa: qa + 7].set(bq),
                       sim.qd.at[:, va: va + 6].set(bqd))
        task = BBTaskState(
            dof_position_targets=masked_update(
                mask, jnp.zeros((n, 6)), task.dof_position_targets))
        return sim, task

    def post_physics(self, state: EnvState, out, actions):
        dof_pos = self.engine.dof_pos(state.sim)
        dof_vel = self.engine.dof_vel(state.sim)
        ball = out.root_states[:, 1]
        ball_pos = ball[:, 0:3]
        ball_vel = ball[:, 7:10]
        sf = out.sensor_forces  # (N, 3, 6) [force, torque] in tray frame
        obs = jnp.concatenate([
            dof_pos[:, self.actuated], dof_vel[:, self.actuated],
            ball_pos, ball_vel,
            sf[:, :, 0] / 20.0,        # sensor force x-components (ref :344)
            sf[:, :, 3] / 20.0,        # sensor torque x
            sf[:, :, 4] / 20.0,        # sensor torque y
            sf[:, :, 5] / 20.0,        # sensor torque z
        ], axis=-1)

        # reward kernel (ref :459-474)
        ball_dist = jnp.sqrt(
            ball_pos[:, 0] ** 2 + (ball_pos[:, 2] - 0.7) ** 2 + ball_pos[:, 1] ** 2)
        ball_speed = jnp.linalg.norm(ball_vel, axis=-1)
        reward = 1.0 / (1.0 + ball_dist) / (1.0 + ball_speed)
        reset = jnp.where(
            (state.progress >= self.max_episode_length - 1)
            | (ball_pos[:, 2] < BALL_RADIUS * 1.5), 1, 0).astype(jnp.int32)

        task = BBTaskState(dof_position_targets=self._new_targets)
        return obs, None, reward, reset, task, {}
