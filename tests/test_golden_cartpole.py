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
# regenerated twice for intentional physics changes: (1) per-step
# mass-matrix reuse (round 1), (2) the round-3 stale-gravity fix — reused
# substeps now take gravity torque about the FRESH com
# (engine.gravity_wrench), which shifts the cart/pole trajectory slightly
# because the old cached path torqued translating bodies by |g|*h*v
GOLDEN = np.array([
    [1.494014, 5.0, 0.91096914, 5.0],
    [-2.6365683, -5.0, 1.2960644, -3.32618],
    [0.9258066, -0.08159933, 1.3401862, 4.042155],
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
