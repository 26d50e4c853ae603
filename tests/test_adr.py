"""ADR (automatic domain randomization) unit tests — boundary workers,
queue-triggered range expansion/contraction, hard limits, npd metric."""
import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.utils.adr import ADR, ADRConfig, phys_adr


def _adr(num_envs=64, queue_size=8):
    cfg = ADRConfig(
        names=("a", "b"), init_lo=(0.9, 0.8), init_hi=(1.1, 1.2),
        limit_lo=(0.5, 0.5), limit_hi=(1.5, 1.5), delta=(0.1, 0.1),
        queue_size=queue_size, threshold_low=0.1, threshold_high=0.5,
        worker_fraction=0.5)
    return ADR(cfg, num_envs)


def test_sample_ranges_and_worker_pinning():
    adr = _adr()
    st = adr.init()
    vals = adr.sample(jax.random.PRNGKey(0), st)
    assert vals.shape == (64, 2)
    # all samples within ranges
    lo = np.asarray(st.ranges[:, 0])
    hi = np.asarray(st.ranges[:, 1])
    v = np.asarray(vals)
    assert (v >= lo - 1e-6).all() and (v <= hi + 1e-6).all()
    # boundary workers pinned exactly at their boundary
    ap = np.asarray(adr.assign_p)
    as_ = np.asarray(adr.assign_s)
    for e in range(64):
        if ap[e] >= 0:
            assert np.isclose(v[e, ap[e]], np.asarray(st.ranges)[ap[e], as_[e]])


def test_expand_on_high_performance():
    adr = _adr(queue_size=4)
    st = adr.init()
    # all envs done with perf 1.0 (>= threshold_high) -> queues fill & expand
    done = jnp.ones(64, bool)
    perf = jnp.ones(64)
    st2 = adr.observe(st, done, perf)
    r0, r2 = np.asarray(st.ranges), np.asarray(st2.ranges)
    assert (r2[:, 0] <= r0[:, 0] - 0.1 + 1e-6).all()   # lo decreased
    assert (r2[:, 1] >= r0[:, 1] + 0.1 - 1e-6).all()   # hi increased
    assert (np.asarray(st2.perf_cnt) == 0).all()        # queues consumed
    assert (np.asarray(st2.num_updates) == 1).all()


def test_contract_on_low_performance_and_limits():
    adr = _adr(queue_size=4)
    st = adr.init()
    done = jnp.ones(64, bool)
    st_lo = adr.observe(st, done, jnp.zeros(64))
    r0, rl = np.asarray(st.ranges), np.asarray(st_lo.ranges)
    assert (rl[:, 0] >= r0[:, 0] + 0.1 - 1e-6).all()   # lo increased (contract)
    assert (rl[:, 1] <= r0[:, 1] - 0.1 + 1e-6).all()
    # repeated expansion saturates at hard limits
    for _ in range(20):
        st = adr.observe(st, done, jnp.ones(64))
    r = np.asarray(st.ranges)
    assert np.allclose(r[:, 0], 0.5) and np.allclose(r[:, 1], 1.5)
    assert float(adr.npd(st)) == 1.0


def test_no_update_until_queue_full():
    adr = _adr(num_envs=8, queue_size=100)
    st = adr.init()
    st2 = adr.observe(st, jnp.ones(8, bool), jnp.ones(8))
    assert np.allclose(np.asarray(st.ranges), np.asarray(st2.ranges))
    assert (np.asarray(st2.perf_cnt) >= 0).all()
    assert float(st2.perf_cnt.sum()) > 0  # accumulating


def test_phys_adr_scales():
    adr = phys_adr(32)
    st = adr.init()
    ps = adr.sample_phys(jax.random.PRNGKey(1), st)
    assert ps.mass.shape == (32, 1)
    assert (np.asarray(ps.mass) >= 0.95 - 1e-6).all()
    assert (np.asarray(ps.friction) <= 1.05 + 1e-6).all()


def test_observe_jits():
    adr = _adr()
    st = adr.init()
    f = jax.jit(adr.observe)
    st2 = f(st, jnp.ones(64, bool), jnp.ones(64))
    assert np.isfinite(np.asarray(st2.ranges)).all()


def test_adr_config_from_reference_tree():
    """Config-driven tree (reference AllegroHandDextremeADR.yaml:227-422
    schema) builds an ADRConfig with matching names/limits/meta."""
    from isaacgymenvs_ma_tpu.utils.adr import ADR, adr_config_from_params
    tree = {
        "worker_adr_boundary_fraction": 0.4,
        "adr_queue_threshold_length": 256,
        "adr_objective_threshold_low": 5,
        "adr_objective_threshold_high": 20,
        "params": {
            "hand_damping": {"init_range": [0.5, 2.0],
                             "limits": [0.01, 20.0], "delta": 0.01},
            "action_latency": {"init_range": [0.0, 0.0],
                               "limits": [0.0, 6.0], "delta": 0.1},
        },
    }
    cfg = adr_config_from_params(tree)
    assert cfg.names == ("hand_damping", "action_latency")
    assert cfg.init_lo == (0.5, 0.0) and cfg.init_hi == (2.0, 0.0)
    assert cfg.limit_lo == (0.01, 0.0) and cfg.limit_hi == (20.0, 6.0)
    assert cfg.queue_size == 256
    assert cfg.threshold_low == 5 and cfg.threshold_high == 20
    assert cfg.worker_fraction == 0.4
    adr = ADR(cfg, 64)
    st = adr.init()
    import jax
    vals = adr.sample(jax.random.PRNGKey(0), st)
    assert vals.shape == (64, 2)
