"""AllegroHandDextreme{ManualDR,ADR} — dict obs, camera-noise, RNA, ADR."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.tasks.registry import task_class, task_default_config


def _make(name, n=4):
    cfg = copy.deepcopy(task_default_config(name))
    cfg["env"]["numEnvs"] = n
    return task_class(name)(cfg)


@pytest.fixture(scope="module")
def adr_task():
    return _make("AllegroHandDextremeADR")


def test_dict_obs_spec(adr_task):
    t = adr_task
    assert t.dict_obs_cls
    assert t.num_obs == sum(s for _, s in t.obs_spec) == 50
    assert t.num_states == sum(s for _, s in t.state_spec)
    info = t.get_env_info()
    assert isinstance(info["observation_space"], dict)
    assert info["observation_space"]["object_pose"] == (7,)
    flat = jnp.arange(t.num_obs, dtype=jnp.float32)[None].repeat(2, 0)
    d = t.split_obs(flat)
    assert d["dof_pos"].shape == (2, 16)
    assert d["last_actions"].shape == (2, 16)


def test_step_runs_and_adr_params_in_range(adr_task):
    t = adr_task
    st = t.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(t.step)
    act = t.zero_actions()
    for _ in range(3):
        st, res = step(st, act)
    assert np.isfinite(np.asarray(res.obs)).all()
    assert np.isfinite(np.asarray(res.states)).all()
    assert res.obs.shape == (t.num_envs, 50)
    assert res.states.shape == (t.num_envs, t.num_states)
    p = np.asarray(st.task.adr_params)
    r = np.asarray(st.task.adr.ranges)
    lo = np.asarray(t.adr.cfg.limit_lo)
    hi = np.asarray(t.adr.cfg.limit_hi)
    assert (p >= lo - 1e-5).all() and (p <= hi + 1e-5).all()
    assert np.isfinite(r).all()
    # the tree adapts >= 8 parameters (VERDICT round-1 item 3) with the
    # reference names
    assert len(t.adr.cfg.names) >= 8
    for name in ("hand_damping", "hand_stiffness", "object_mass",
                 "object_friction", "action_latency",
                 "cube_pose_refresh_rate", "rna_alpha"):
        assert name in t._adr_idx
    # phys scales derived from the tree reach the engine with per-dof /
    # per-body wiring: object body mass scale == object_mass param, hand dof
    # stiffness scale == hand_stiffness param, non-hand dofs stay 1
    phys = t.update_phys(st, st.reset_buf > 0, jax.random.PRNGKey(1))
    obj_body = t.model.body_names.index("object")
    assert np.allclose(np.asarray(phys.mass[:, obj_body]),
                       p[:, t._adr_idx["object_mass"]])
    hd = int(np.asarray(t.hand_dofs)[0])
    assert np.allclose(np.asarray(phys.stiffness[:, hd]),
                       p[:, t._adr_idx["hand_stiffness"]])
    # friction is per-BODY now: the object column carries object_friction,
    # fingertip columns carry hand_friction_fingertips, other bodies 1
    assert np.allclose(np.asarray(phys.friction[:, obj_body]),
                       p[:, t._adr_idx["object_friction"]])
    ftb = int(np.asarray(t.fingertip_bodies)[0])
    assert np.allclose(np.asarray(phys.friction[:, ftb]),
                       p[:, t._adr_idx["hand_friction_fingertips"]])
    assert np.allclose(np.asarray(phys.friction[:, 0]), 1.0)
    # the round-3 families reach the engine too
    assert np.allclose(np.asarray(phys.armature[:, hd]),
                       p[:, t._adr_idx["hand_armature"]])
    assert np.allclose(np.asarray(phys.effort[:, hd]),
                       p[:, t._adr_idx["hand_effort"]])
    assert np.allclose(np.asarray(phys.restitution[:, obj_body]),
                       p[:, t._adr_idx["object_restitution"]])
    assert np.allclose(np.asarray(phys.dof_lower_shift[:, hd]),
                       p[:, t._adr_idx["hand_lower"]])
    # all 27 reference parameter names are wired
    assert len(t.adr.cfg.names) == 27


def test_adr_checkpoint_roundtrip(adr_task):
    t = adr_task
    st = t.initial_state(jax.random.PRNGKey(0))
    env_state = t.get_env_state(st)
    assert "adr" in env_state
    mutated = st.task.adr._replace(ranges=st.task.adr.ranges + 0.01)
    st2 = t.set_env_state(st, {"adr": mutated})
    assert np.allclose(np.asarray(st2.task.adr.ranges),
                       np.asarray(st.task.adr.ranges) + 0.01)


def test_manual_dr_variant():
    t = _make("AllegroHandDextremeManualDR")
    st = t.initial_state(jax.random.PRNGKey(0))
    st, res = jax.jit(t.step)(st, t.zero_actions())
    assert np.isfinite(np.asarray(res.obs)).all()
    assert st.task.adr is None
    # RNA clock advanced
    assert int(st.task.step_count) == 1
