"""Headless renderer: rgb_array frames, PNG writing, FrameRecorder."""
import copy
import os
import zlib

import jax
import numpy as np

from isaacgymenvs_ma_tpu.tasks.cartpole import Cartpole, TASK_CFG
from isaacgymenvs_ma_tpu.utils.viewer import (FrameRecorder, render_rgb,
                                              write_png)


def _task(n=2):
    cfg = copy.deepcopy(TASK_CFG)
    cfg["env"]["numEnvs"] = n
    return Cartpole(cfg)


def test_render_rgb_array():
    t = _task()
    st = t.initial_state(jax.random.PRNGKey(0))
    st, _ = jax.jit(t.step)(st, t.zero_actions())
    img = t.render(st, mode="rgb_array", size=(120, 160))
    assert img.shape == (120, 160, 3)
    assert img.dtype == np.uint8
    # scene is not a constant image (geoms + ground drawn)
    assert img.std() > 5.0


def test_png_roundtrip(tmp_path):
    img = np.zeros((16, 16, 3), np.uint8)
    img[4:12, 4:12] = [255, 0, 0]
    p = str(tmp_path / "t.png")
    write_png(p, img)
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in raw and b"IDAT" in raw and b"IEND" in raw
    # decode the IDAT payload back and compare pixels
    i = raw.index(b"IDAT")
    ln = int.from_bytes(raw[i - 4: i], "big")
    data = zlib.decompress(raw[i + 4: i + 4 + ln])
    rows = np.frombuffer(data, np.uint8).reshape(16, 1 + 16 * 3)[:, 1:]
    assert np.array_equal(rows.reshape(16, 16, 3), img)


def test_frame_recorder(tmp_path):
    t = _task()
    st = t.initial_state(jax.random.PRNGKey(0))
    rec = FrameRecorder(t, size=(60, 80))
    step = jax.jit(t.step)
    for _ in range(3):
        st, _ = step(st, t.zero_actions())
        rec.capture(st)
    paths = rec.save(str(tmp_path / "frames"))
    assert len(paths) == 3
    assert all(os.path.exists(p) for p in paths)
