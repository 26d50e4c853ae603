"""Closed-loop tracking probe for FactoryTaskNutBoltPick.

The round-4 grasp probe (`probe_factory_grasp.py`) proved the *mechanics*:
IK the gripper onto the grasp frame, run the reference close-and-lift
epilogue (factory_task_nut_bolt_pick.py:350-377), success 0.94.  But it
teleports the arm — it never tests whether the task's own CONTROLLER
(joint_space_id, gains 40/8) can reach the grasp pose through the policy's
action interface (12-dim pose deltas, pos_action_scale 0.1).

This probe runs a scripted P-controller expressed in the policy's own
action space — the optimal policy any network could imitate:

    action[0:3] = clip((grasp_pos - ft_pos) / pos_action_scale, -1, 1)
    action[3:6] = clip(axis_angle(grasp_quat * ft_quat^-1) / rot_scale, -1, 1)

from the standard randomized reset, through the standard ``task.step``,
for the full 100-step episode, then scores the epilogue.  Outcomes:

* terminal kp_dist ~ probe-IK level + epilogue success ~0.9  ->  the
  controller CAN do it; the RL gap is exploration/shaping (fix: near-grasp
  spawn curriculum).
* terminal kp_dist stuck at cm-level  ->  the controller itself cannot
  track to 1 cm through the action interface; fix the controller, not RL.

Usage: python scripts/probe_pick_tracking.py [num_envs] [seed]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.ops import maths
from isaacgymenvs_ma_tpu.ops import controllers as fc
from isaacgymenvs_ma_tpu.tasks import registry
from isaacgymenvs_ma_tpu.utils.config import load_task_config


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    cfg = load_task_config("FactoryTaskNutBoltPick", [f"task.env.numEnvs={n}"])
    task = registry.create_task("FactoryTaskNutBoltPick", cfg, seed=seed)

    pos_scale = jnp.asarray(cfg["rl"]["pos_action_scale"])
    rot_scale = jnp.asarray(cfg["rl"]["rot_action_scale"])

    def metrics(sim):
        out = task.engine.forward(sim)
        ft_pos, ft_quat, _, _ = task._fingertip_state(out)
        g_pos, g_quat = task._nut_grasp_frame(out)
        kp_g = task._keypoints_from(ft_pos, ft_quat)
        kp_n = task._keypoints_from(g_pos, g_quat)
        kp_dist = jnp.sum(jnp.linalg.norm(kp_n - kp_g, axis=-1), -1)
        pos_err = jnp.linalg.norm(g_pos - ft_pos, axis=-1)
        return kp_dist, pos_err

    @jax.jit
    def scripted_action(sim):
        out = task.engine.forward(sim)
        ft_pos, ft_quat, _, _ = task._fingertip_state(out)
        g_pos, g_quat = task._nut_grasp_frame(out)
        pe, ae = fc.get_pose_error(ft_pos, ft_quat, g_pos, g_quat)
        a = jnp.concatenate([
            jnp.clip(pe / pos_scale, -1.0, 1.0),
            jnp.clip(ae / rot_scale, -1.0, 1.0),
            jnp.zeros((ft_pos.shape[0], 6))], -1)
        return a

    @jax.jit
    def step(env_state):
        a = scripted_action(env_state.sim)
        env_state, res = task.step(env_state, a)
        return env_state

    env_state = task.initial_state(jax.random.PRNGKey(seed))
    env_state, _ = task.reset(env_state)
    env_state = step(env_state)  # consumes the initial all-reset step

    horizon = task.max_episode_length
    for t in range(horizon - 1):
        env_state = step(env_state)
        if t % 20 == 0 or t == horizon - 2:
            kp, pe = jax.jit(metrics)(env_state.sim)
            print(f"t={t + 2:3d}  kp_dist mean {float(kp.mean()):.4f} "
                  f"p50 {float(jnp.median(kp)):.4f} "
                  f"p90 {float(jnp.percentile(kp, 90)):.4f}   "
                  f"pos_err mean {float(pe.mean()) * 100:.2f} cm "
                  f"p90 {float(jnp.percentile(pe, 90)) * 100:.2f} cm")

    lifted = jax.jit(task.evaluate_lift)(env_state)
    print(f"\nepilogue lift success (scripted action-space tracking): "
          f"{float(lifted.mean()):.3f}  over {n} envs")


if __name__ == "__main__":
    main()
