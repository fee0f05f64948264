"""Multi-host leg of the dp path: 2 OS processes under `jax.distributed`.

Runs tools/dist_train_2proc.py, which spawns two workers (4 virtual CPU
devices each, gloo collectives), trains the dp-sharded `Network.train`
over the 8-device global mesh, and asserts parameter equality with a
single-process run — the same code path `cli/train.py --distributed`
takes on a pod (jax.distributed.initialize -> make_mesh -> train(mesh)).

The launcher subprocesses configure their own JAX (they must NOT inherit
this process's single-process JAX state), which is why this is a
subprocess test rather than an in-process one.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_train_matches_single():
    script = os.path.join(REPO, "tools", "dist_train_2proc.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    env["DIST_TEST_PORT"] = "12931"  # avoid clashing with manual runs
    # outer timeout must exceed the launcher's internal worst case (600s
    # per-worker wait + 600s single-process reference run) so a slow
    # machine fails with a clean assertion, not TimeoutExpired
    out = subprocess.run(
        [sys.executable, script], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1500,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "OK: 2-process jax.distributed train == single-process" in out.stdout
