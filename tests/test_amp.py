"""AMP stack tests: motion lib, amp observation layout, discriminator epoch."""
import jax
import numpy as np
import os
import pytest

from isaacgymenvs_ma_tpu.utils.config import deep_merge

MOTIONS = "/root/reference/assets/amp/motions"
needs_motions = pytest.mark.skipif(not os.path.isdir(MOTIONS),
                                   reason="motion assets absent")


@needs_motions
def test_motion_lib_states():
    from isaacgymenvs_ma_tpu.learning.motion_lib import MotionLib
    lib = MotionLib(os.path.join(MOTIONS, "amp_humanoid_walk.npy"), dt=1 / 30)
    k = jax.random.PRNGKey(0)
    ids = lib.sample_motions(k, 32)
    times = lib.sample_time(jax.random.PRNGKey(1), ids)
    s = lib.get_motion_state(ids, times)
    assert s["dof_pos"].shape == (32, 28)
    assert s["key_pos"].shape == (32, 4, 3)
    # walking root stays at standing heights
    z = np.asarray(s["root_pos"][:, 2])
    assert (z > 0.6).all() and (z < 1.1).all()


@needs_motions
def test_amp_agent_epoch():
    from isaacgymenvs_ma_tpu.tasks.humanoid_amp import HumanoidAMP, TASK_CFG
    from isaacgymenvs_ma_tpu.learning.configs import train_default_config
    from isaacgymenvs_ma_tpu.learning.amp import AMPAgent
    task = HumanoidAMP(deep_merge(TASK_CFG, {"env": {"numEnvs": 8}}))
    tcfg = train_default_config("HumanoidAMP")
    tcfg["params"]["config"].update(
        minibatch_size=64, horizon_length=8, amp_batch_size=32)
    agent = AMPAgent(task, tcfg, seed=3)
    state = agent.init()
    d0 = None
    for i in range(6):
        state, m = agent.train_epoch(state)
        if i == 0:
            d0 = float(m["disc_bce"])
    assert np.isfinite(float(m["disc_loss"]))
    # discriminator separates demo from random-policy agent quickly
    assert float(m["disc_acc_demo"]) > 0.7
    assert float(m["disc_bce"]) <= d0 * 1.5
