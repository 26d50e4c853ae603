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


def test_correlated_action_noise():
    """range_correlated (reference vec_task.py:686-692): a per-env base is
    cached between randomization events — same correlated offset every step
    — plus fresh white noise; the base refreshes only for masked envs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from isaacgymenvs_ma_tpu.utils.domain_rand import DomainRandomizer

    spec = {"actions": {"range": [0.0, 0.0],              # no white noise
                        "range_correlated": [0.0, 0.5],   # pure correlated
                        "operation": "additive",
                        "distribution": "gaussian"}}
    dr = DomainRandomizer(spec, num_envs=16, num_obs=4, num_actions=3)
    assert dr.act_corr_on and not dr.obs_corr_on
    phys = dr.initial_phys(jax.random.PRNGKey(0), nb=1)
    assert phys.act_corr.shape == (16, 3)

    a = jnp.zeros((16, 3))
    n1 = dr.randomize_actions(jax.random.PRNGKey(1), a, corr=phys.act_corr)
    n2 = dr.randomize_actions(jax.random.PRNGKey(2), a, corr=phys.act_corr)
    # identical across steps (white part is zero, corr base cached)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-7)
    np.testing.assert_allclose(np.asarray(n1),
                               np.asarray(phys.act_corr) * 0.5, atol=1e-6)

    # masked refresh: first 8 envs get a new base, rest keep theirs
    mask = jnp.arange(16) < 8
    phys2 = dr.resample_phys(jax.random.PRNGKey(3), mask, phys)
    c1, c2 = np.asarray(phys.act_corr), np.asarray(phys2.act_corr)
    assert (c1[:8] != c2[:8]).any()
    np.testing.assert_array_equal(c1[8:], c2[8:])
