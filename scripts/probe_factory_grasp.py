"""Deterministic FactoryTaskNutBoltPick grasp probe (VERDICT r3 task #1).

Bypasses RL entirely: jacobian-IK the fingertip midpoint onto the nut grasp
frame (= nut COM, reference factory_task_nut_bolt_pick.py:88 ``nut COM``),
settle briefly under the hold controller, then run the scripted
close-and-lift epilogue (``evaluate_lift``) and report per-env success.

If the epilogue mechanics are sound this must print success ~1.0 — any
training-time 0.00 is then a policy/reward problem, not a sim problem.

Usage:  python scripts/probe_factory_grasp.py [n_envs] [seed]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.tasks.factory import (
    FactoryTaskNutBoltPick, TASK_CFGS, TABLE_HEIGHT, NUT_HEIGHT)
from isaacgymenvs_ma_tpu.physics.engine import SimState
from isaacgymenvs_ma_tpu.ops import controllers as fc
import copy


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    cfg = copy.deepcopy(TASK_CFGS["FactoryTaskNutBoltPick"])
    cfg["env"]["numEnvs"] = n
    task = FactoryTaskNutBoltPick(cfg)

    state = task.initial_state(jax.random.PRNGKey(seed))
    # the all-ones reset_buf is consumed by the first step (vec_task parity)
    state, _ = jax.jit(task.step)(state, task.zero_actions())
    out = task.engine.forward(state.sim)
    grasp_pos, grasp_quat = task._nut_grasp_frame(out)

    def ik_step(q, _):
        s = SimState(q, jnp.zeros_like(state.sim.qd))
        J, _, ft_pos, ft_quat, _, _ = task._arm_readouts(s)
        pe, ae = fc.get_pose_error(ft_pos, ft_quat, grasp_pos, grasp_quat)
        dq = fc.get_delta_dof_pos(jnp.concatenate([pe, ae], -1), "dls", J)
        dof = task.engine.dof_pos(s)
        dof = dof.at[:, task.franka_dofs[:7]].add(0.5 * dq)
        return task.engine.set_dof_pos(s, dof).q, None

    @jax.jit
    def run(sim):
        q, _ = jax.lax.scan(ik_step, sim.q, None, length=60)
        return SimState(q, jnp.zeros_like(sim.qd))

    sim = run(state.sim)
    out = task.engine.forward(sim)
    ft_pos = out.body_pos[:, task.grip_site]
    err = jnp.linalg.norm(ft_pos - grasp_pos, axis=-1)
    print(f"post-IK fingertip->grasp error (m): "
          f"mean {float(err.mean()):.4f} max {float(err.max()):.4f}")
    nut_z0 = out.root_states[:, 2, 2]
    print(f"nut z before epilogue: mean {float(nut_z0.mean()):.4f} "
          f"(table+h/2 = {TABLE_HEIGHT + NUT_HEIGHT / 2:.4f})")

    state = state._replace(sim=sim)
    lifted = jax.jit(task.evaluate_lift)(state)
    print(f"close-and-lift success: {float(lifted.mean()):.3f} "
          f"({int(lifted.sum())}/{n})  per-env: {np.asarray(lifted)}")
    # ~0.85-0.95 across seeds from the scripted ideal pose (residual
    # failures: unfavorable hex yaws where the flat-pad pinch slips)
    ok = float(lifted.mean()) >= 0.8
    print("PROBE", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
