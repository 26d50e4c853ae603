"""Consolidated smoke tests: every registered task builds and steps finitely.

The heavyweight tasks (Franka MA tiers, hands, AMP) get short CPU rollouts —
the full-length behavioral tests live in their dedicated test files.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.tasks import registry
from isaacgymenvs_ma_tpu.utils.config import deep_merge

FAST = [
    ("Ingenuity", 4, 40),
    ("Quadcopter", 4, 40),
    ("Anymal", 4, 30),
]
# the heavyweight scenes compile for minutes each on the CPU mesh; they are
# covered by their dedicated test files and kept here behind -m slow
HEAVY = [
    ("FrankaReachMA", 2, 10),
    ("FrankaCollectMA", 2, 8),
    ("ShadowHand", 2, 10),
    ("AllegroHand", 2, 10),
    ("HumanoidAMP", 2, 10),
    ("Trifinger", 2, 10),
    ("AllegroHandDextremeADR", 2, 8),
]


def _run_task_steps(name, n, steps):
    cfg = deep_merge(registry.task_default_config(name),
                     {"env": {"numEnvs": n}})
    task = registry.create_task(name, cfg)
    state = task.initial_state(jax.random.PRNGKey(0))

    @jax.jit
    def run(state, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = 0.3 * jax.random.uniform(
                ka, (task.rl_games_batch, task.num_actions),
                minval=-1.0, maxval=1.0)
            s, res = task.step(s, a)
            return (s, k), (res.obs, res.rew)
        return jax.lax.scan(body, (state, key), None, length=steps)

    (s, _), (obs, rew) = run(state, jax.random.PRNGKey(1))
    assert obs.shape[-1] == task.num_obs
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(rew)).all()
    info = task.get_env_info()
    assert info["agents"] == task.num_agents


@pytest.mark.parametrize("name,n,steps", FAST)
def test_task_steps_finite(name, n, steps):
    _run_task_steps(name, n, steps)


@pytest.mark.slow
@pytest.mark.parametrize("name,n,steps", HEAVY)
def test_heavy_task_steps_finite(name, n, steps):
    _run_task_steps(name, n, steps)


def test_interactive_viewer_logic():
    """InteractiveViewer: reference keyboard semantics (ESC/V/R) + draw loop
    on the Agg backend (headless_ok exercises everything but the window)."""
    import matplotlib
    matplotlib.use("Agg", force=True)
    from isaacgymenvs_ma_tpu.utils.viewer import InteractiveViewer
    from isaacgymenvs_ma_tpu.tasks.cartpole import Cartpole, TASK_CFG
    t = Cartpole(deep_merge(TASK_CFG, {"env": {"numEnvs": 2}}))
    st = t.initial_state(jax.random.PRNGKey(0))
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        InteractiveViewer(t)                      # headless must fail loudly
    v = InteractiveViewer(t, headless_ok=True, render_fps=1000.0)
    frame = v.render(st)
    assert frame is not None and frame.ndim == 3

    class _K:
        def __init__(self, key):
            self.key = key

    v._on_key(_K("v"))
    assert not v.enable_viewer_sync
    assert v.render(st) is None                   # free-running: no draw
    v._on_key(_K("r"))
    assert v.recording
    v._on_key(_K("v"))
    v.render(st)
    assert len(v.recorder.frames) == 1            # R routed into the recorder
    v._on_key(_K("escape"))
    assert not v.open and v.render(st) is None
