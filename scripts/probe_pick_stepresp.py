"""Step-response probe for the Factory joint_space_id loop.

Commands a CONSTANT fingertip target (10 cm below/ahead of the start pose,
i.e. a typical approach leg) through ``_apply_actions_as_ctrl_targets``
with do_scale=False (so the target is the exact pose, not a capped delta)
and plots the closed-loop error decay.  Theoretical joint-space dynamics at
gains 40/8 with inertial comp: ddq = 40 dq_err - 8 qd -> zeta*omega ~ 4
rad/s, error time constant ~0.25 s = 15 control steps.  Reads 3-4x slower
than that indicate parasitic drag in the engine (joint damping/friction,
implicit PD interplay) rather than controller math.

Usage: python scripts/probe_pick_stepresp.py [num_envs]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.ops import controllers as fc
from isaacgymenvs_ma_tpu.physics.engine import Control
from isaacgymenvs_ma_tpu.tasks import registry
from isaacgymenvs_ma_tpu.utils.config import load_task_config


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = load_task_config("FactoryTaskNutBoltPick", [f"task.env.numEnvs={n}"])
    task = registry.create_task("FactoryTaskNutBoltPick", cfg, seed=0)

    env_state = task.initial_state(jax.random.PRNGKey(0))
    env_state, _ = task.reset(env_state)
    # consume the initial all-reset (masked resets apply inside step)
    env_state, _ = task.step(env_state, jnp.zeros((n, task.num_actions)))
    sim = env_state.sim
    out = task.engine.forward(sim)
    ft_pos, ft_quat, _, _ = task._fingertip_state(out)
    # fixed target: 10 cm straight down (the approach direction)
    target_pos = ft_pos + jnp.asarray([0.0, 0.0, -0.10])
    target_quat = ft_quat

    @jax.jit
    def step(sim):
        J, M_arm, p, q, lin, ang = task._arm_readouts(sim)
        dof_pos = task.engine.dof_pos(sim)[:, task.franka_dofs]
        dof_vel = task.engine.dof_vel(sim)[:, task.franka_dofs]
        gt = jnp.full((n, 2), 0.04)
        tau9 = fc.compute_dof_torque(
            task.cfg_ctrl, dof_pos, dof_vel, p, q, lin, ang, J, M_arm, gt,
            target_pos, target_quat,
            left_finger_force=jnp.zeros((n, 3)),
            right_finger_force=jnp.zeros((n, 3)))
        tau = jnp.zeros((n, task.engine.nv), jnp.float32)
        tau = tau.at[:, task.franka_dofs].set(tau9)
        ctrl = Control(tau=tau,
                       pos_target=jnp.zeros((n, task.engine.nv), jnp.float32),
                       vel_target=jnp.zeros((n, task.engine.nv), jnp.float32))
        sim2, _ = task.engine.step(sim, ctrl)
        return sim2

    @jax.jit
    def err(sim):
        out = task.engine.forward(sim)
        p, q, _, _ = task._fingertip_state(out)
        return jnp.linalg.norm(target_pos - p, axis=-1)

    for t in range(121):
        if t % 10 == 0:
            e = err(sim)
            print(f"t={t:3d}  pos_err mean {float(e.mean()) * 100:7.3f} cm  "
                  f"p90 {float(jnp.percentile(e, 90)) * 100:7.3f} cm")
        sim = step(sim)


if __name__ == "__main__":
    main()
