"""Can the Allegro scene physically tumble the cube?

Round 4 validated the ShadowHand scene with a blind sine gait that tumbles
the cube at ~5 rad/s — proving reorientation torque is physically available
before blaming RL.  AllegroHand(LSTM) has never shown rot_dist movement in
four rounds (r4: succ 0.10, rot_dist flat 2.26 over 210M frames), so run
the same check here: drive all 16 dofs with phase-staggered sine position
targets and report the cube's angular speed and net rotation.

If |w| stays ~0 the contact geometry cannot generate torque (physics gate);
if the cube tumbles, the gate is exploration/training.

Usage: python scripts/probe_allegro_tumble.py [task] [amp] [freq_hz]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.ops import maths
from isaacgymenvs_ma_tpu.tasks import registry
from isaacgymenvs_ma_tpu.utils.config import load_task_config


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "AllegroHand"
    amp = float(sys.argv[2]) if len(sys.argv) > 2 else 0.7
    freq = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    cfg = load_task_config(name, [])
    cfg["env"]["numEnvs"] = 16
    task = registry.create_task(name, cfg, seed=0)
    n = task.num_envs
    na = task.num_actions
    obj = task.model.body_names.index("object")

    phases = jnp.asarray(np.linspace(0.0, 2 * np.pi, na, endpoint=False))

    env_state = task.initial_state(jax.random.PRNGKey(0))
    env_state, _ = task.reset(env_state)

    @jax.jit
    def step(env_state, t):
        a = amp * jnp.sin(2 * np.pi * freq * t / 30.0 + phases)
        a = jnp.broadcast_to(a, (n, na))
        env_state, res = task.step(env_state, a)
        return env_state, res

    env_state, _ = step(env_state, 0)
    out0 = task.engine.forward(env_state.sim)
    q0 = out0.body_quat[:, obj]

    speeds = []
    for t in range(300):
        env_state, res = step(env_state, t + 1)
        out = task.engine.forward(env_state.sim)
        w = out.body_vel[:, obj, 0:3]
        speeds.append(float(jnp.linalg.norm(w, axis=-1).mean()))
        if t % 50 == 0 or t == 299:
            qn = out.body_quat[:, obj]
            dq = maths.quat_mul(qn, maths.quat_conjugate(q0))
            ang = 2 * jnp.arccos(jnp.clip(jnp.abs(dq[:, 3]), 0, 1))
            z = out.body_pos[:, obj, 2]
            print(f"t={t + 2:3d}  |w| mean {speeds[-1]:6.2f} rad/s   "
                  f"net rot {float(ang.mean()):5.2f} rad   "
                  f"obj z {float(z.mean()):.3f}  "
                  f"resets {int(res.reset.sum())}")
    print(f"\nmean |w| over run: {np.mean(speeds):.2f} rad/s "
          f"(ShadowHand r4 benchmark: ~5 rad/s)")


if __name__ == "__main__":
    main()
