"""Domain randomization: per-env physics factors + obs/action noise."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.tasks.ant import Ant, TASK_CFG
from isaacgymenvs_ma_tpu.utils.config import deep_merge

DR_PARAMS = {
    "frequency": 600,
    "observations": {"range": [0, 0.002], "operation": "additive",
                     "distribution": "gaussian"},
    "actions": {"range": [0.0, 0.02], "operation": "additive",
                "distribution": "gaussian"},
    "actor_params": {"ant": {
        "rigid_body_properties": {
            "mass": {"range": [0.5, 1.5], "operation": "scaling",
                     "distribution": "uniform", "setup_only": True}},
        "dof_properties": {
            "damping": {"range": [0.5, 1.5], "operation": "scaling",
                        "distribution": "uniform"},
            "stiffness": {"range": [0.5, 1.5], "operation": "scaling",
                          "distribution": "uniform"}},
    }},
}


def test_dr_ant_runs_and_randomizes():
    cfg = deep_merge(TASK_CFG, {
        "env": {"numEnvs": 8},
        "task": {"randomize": True, "randomization_params": DR_PARAMS}})
    task = Ant(cfg)
    assert task.randomizer is not None and task.randomizer.enabled
    state = task.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def run(state):
        def body(s, _):
            s, res = task.step(s, jnp.zeros((8, 8)))
            return s, res.obs
        return jax.lax.scan(body, state, None, length=30)

    s, obs = run(state)
    assert np.isfinite(np.asarray(obs)).all()
    # first step resets all envs -> mass factors resampled per env
    m = np.asarray(s.phys.mass)[:, 0]
    assert m.std() > 0.05 and (m >= 0.5).all() and (m <= 1.5).all()
    d = np.asarray(s.phys.damping)[:, 0]
    assert d.std() > 0.05
