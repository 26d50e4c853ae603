"""Unit tests for the MA fork's FSM machinery (no physics needed)."""
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.tasks.franka_collect_ma import FrankaCollectMA, WALL_HEIGHT
from isaacgymenvs_ma_tpu.tasks.franka_reach_ma import CUBE_SIZE


class _Shim:
    _fsm = FrankaCollectMA._fsm
    _global_fsm = FrankaCollectMA._global_fsm


def test_fsm_stages():
    shim = _Shim()
    far = jnp.array([[1.0, 1.0]])
    close = jnp.array([[0.01, 0.01]])
    opened = jnp.array([[False, False]])
    closed = jnp.array([[True, True]])
    low_pos = jnp.full((1, 2, 3), 1.06)          # on the table
    high_pos = jnp.ones((1, 2, 3)).at[..., 2].set(1.05 + WALL_HEIGHT + CUBE_SIZE)
    # far -> approach (0)
    assert int(shim._fsm(far, opened, low_pos)[0, 0]) == 0
    # close, gripper open -> 1
    assert int(shim._fsm(close, opened, low_pos)[0, 0]) == 1
    # close + closed -> holding (2)
    assert int(shim._fsm(close, closed, low_pos)[0, 0]) == 2
    # holding + lifted above wall -> 3
    assert int(shim._fsm(close, closed, high_pos)[0, 0]) == 3
    # holding + in target area behind the wall -> 4
    area_pos = jnp.zeros((1, 2, 3)).at[..., 1].set(0.5).at[..., 2].set(1.4)
    assert int(shim._fsm(close, closed, area_pos)[0, 0]) == 4
    # + low enough -> 5
    low_area = area_pos.at[..., 2].set(1.05 + WALL_HEIGHT / 4)
    assert int(shim._fsm(close, closed, low_area)[0, 0]) == 5


def test_global_fsm():
    shim = _Shim()
    fsm = jnp.array([[0, 0], [2, 0], [2, 2], [6, 6]])
    g = np.asarray(shim._global_fsm(fsm))
    assert g[0] == 0          # nobody started
    assert g[1] == 1          # any progress
    assert g[2] == 3          # all >= 2
    assert g[3] == 7          # all done
