"""Multi-PROCESS data parallelism (the multi-host/DCN path).

Complements tests/test_sharding.py (single-process virtual mesh): spawns two
actual OS processes that `jax.distributed.initialize` against a localhost
coordinator, assemble the PPO state as global arrays from per-process shards,
and run jitted epochs whose gradient psum crosses the process boundary —
the torchrun+DDP analog (reference README:165-172, rlgames_utils.py:89-107).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_smoke.py")


def test_two_process_ppo_epoch():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("XLA_FLAGS", "JAX_"))}
    out = subprocess.run(
        [sys.executable, SCRIPT, "--procs", "2", "--devs-per-proc", "4"],
        # must exceed the launcher's own per-worker timeout (240s x 2 ranks
        # + retries) so the launcher, not pytest, handles worker cleanup
        capture_output=True, text=True, timeout=900, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "bitwise-identical" in out.stdout
