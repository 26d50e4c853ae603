"""End-to-end multi-PROCESS PBT population run (round-2: VERDICT item 7).

tests/test_pbt.py drives the observer protocol in-process; THIS test runs the
system the way the reference actually runs it (pbt/pbt.py:505-655, :123-177):
N real `train.py` processes sharing a filesystem workspace, each periodically
checkpointing its objective, the bottom member replacing itself with a
mutated copy of a better policy via os.execv.

Worker 0 is sabotaged with a tiny learning rate so it deterministically lands
in the bottom of the population; thresholds are zeroed so any gap triggers
replacement.  Asserts: every member published population checkpoints, worker
0 exec-restarted with mutated params + the donor checkpoint, and all workers
finished cleanly after the restart.
"""
import json
import os
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_three_process_population_exchange():
    ws = tempfile.mkdtemp(prefix="pbt_pop_")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("XLA_FLAGS", "JAX_"))}
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    try:
        for idx in range(3):
            args = [
                sys.executable, os.path.join(REPO, "train.py"),
                "task=Cartpole", "num_envs=32", "max_iterations=60",
                f"seed={idx + 1}", f"experiment=pbt_pop_{idx}",
                "train.params.config.minibatch_size=128",
                "train.params.config.horizon_length=8",
                "train.params.config.save_frequency=0",
                "pbt.enabled=true", f"pbt.policy_idx={idx}",
                "pbt.num_policies=3", f"pbt.workspace={ws}",
                "pbt.interval_steps=1024", "pbt.start_after=3072",
                "pbt.initial_delay=3072",
                "pbt.replace_fraction_worst=0.34",
                "pbt.replace_fraction_best=0.34",
                "pbt.replace_threshold_frac_std=0.0",
                "pbt.replace_threshold_frac_absolute=0.0",
                "pbt.params.learning_rate=" + ("1e-7" if idx == 0
                                               else "3e-4"),
            ]
            procs.append(subprocess.Popen(
                args, env=env, cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        outs = []
        for p in procs:
            # 3 workers x 2 exec-restarts each recompile XLA concurrently;
            # budget for a loaded 2-core box
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
            assert p.returncode == 0, out[-3000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()

    # every member published population checkpoints with meta
    for idx in range(3):
        pdir = os.path.join(ws, f"policy_{idx:02d}")
        metas = [f for f in os.listdir(pdir) if f.endswith(".ckpt.json")]
        assert metas, f"policy {idx} never published a checkpoint"
        meta = json.load(open(os.path.join(pdir, sorted(metas)[-1])))
        assert "true_objective" in meta and "params" in meta

    # each worker's first launch exec-restarts with mutated seed params
    assert all("[pbt] initial mutation restart" in o for o in outs)
    # the sabotaged worker replaced itself from a better policy via exec
    assert "replaced by policy" in outs[0], outs[0][-3000:]
    assert "[pbt] restarting:" in outs[0]
    assert "checkpoint=" in outs[0].split("[pbt] restarting:")[1].split(
        "\n")[0]
    # and still trained to completion afterwards
    assert "saved" in outs[0].rsplit("[pbt] restarting:", 1)[1]
