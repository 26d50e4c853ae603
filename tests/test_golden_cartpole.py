"""Golden-trajectory regression anchor (SURVEY.md §4 gap).

A fixed-seed 64-env Cartpole rollout must reproduce these checkpoints
exactly on CPU (float32 determinism under fixed keys).  Regenerate the
constants with GOLDEN=regen if the *intended* physics changes.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.tasks.cartpole import Cartpole, TASK_CFG
from isaacgymenvs_ma_tpu.utils.config import deep_merge

# obs of env 0 at steps [10, 50, 100] under the scripted policy below
# regenerated after enabling per-step mass-matrix reuse (the intentional
# integrator change measured at 1.06M env-steps/s with the best Ant curve)
GOLDEN = np.array([
    [1.4956656, 5.0, 0.9112351, 5.0],
    [-2.6279547, -5.0, 1.3821188, -2.171226],
    [0.92729497, -0.07099992, 1.3434184, 4.0985737],
], dtype=np.float32)


def rollout():
    task = Cartpole(deep_merge(TASK_CFG, {"env": {"numEnvs": 64}}))
    state = task.initial_state(jax.random.PRNGKey(1234))

    @jax.jit
    def run(state):
        def body(s, t):
            a = jnp.sin(0.1 * t.astype(jnp.float32))[None, None].repeat(64, 0)
            s, res = task.step(s, a)
            return s, res.obs[0]
        return jax.lax.scan(body, state, jnp.arange(101))
    _, obs = run(state)
    return np.asarray(obs)[[10, 50, 100]]


def test_golden_trajectory():
    got = rollout()
    if os.environ.get("GOLDEN") == "regen":
        print(repr(got))
        return
    assert np.allclose(got, GOLDEN, atol=1e-4), got
