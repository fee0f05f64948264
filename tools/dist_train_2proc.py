"""Two-process `jax.distributed` execution of the dp-sharded trainer.

Exercises the REAL multi-host path (cli/train.py --distributed:
`jax.distributed.initialize()` -> `make_mesh()` over global devices ->
`Network.train(mesh=...)`) with 2 processes x 4 virtual CPU devices each
(gloo cross-process collectives), and asserts the resulting parameters
match a single-process run on identical data.

The reference has no distributed anything (SURVEY §2.7: `std::sync::mpsc`
on one box, alpha-tak/src/player.rs:4-8); this is the BASELINE "N>=2
hosts" leg, runnable without a pod.

    python tools/dist_train_2proc.py            # launcher (spawns workers)
    python tools/dist_train_2proc.py worker I N # internal

Also run by tests/test_distributed.py (default suite, ~50s).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

PORT = int(os.environ.get("DIST_TEST_PORT", "12787"))
N_PROC = 2
LOCAL_DEVICES = 4
SEED = 7


def _setup_jax(local_devices: int, extra_env=False):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _build(seed: int):
    """Deterministic tiny problem: same on every process."""
    import numpy as np

    from tak_tpu.engine.core import get_engine
    from tak_tpu.examples import Example, state_to_host
    from tak_tpu.game import Game
    from tak_tpu.model.network import Network
    from tak_tpu.model.resnet import NetConfig

    engine = get_engine(3)
    net = Network(engine, NetConfig(n=3, filters=8, blocks=1))
    variables = net.init_variables(0)
    rng = np.random.default_rng(seed)
    g = Game(engine.n)
    examples = []
    for _ in range(64):
        acts = rng.choice(engine.num_actions, size=5, replace=False)
        examples.append(Example(
            state=state_to_host(g.state),
            actions=np.sort(acts).astype(np.int32),
            visits=rng.integers(1, 50, size=5).astype(np.int32),
            result=float(rng.choice([-1.0, 0.0, 1.0])),
        ))
    return net, variables, examples


def _train(net, variables, examples, mesh):
    import numpy as np

    return net.train(variables, examples, rng=np.random.default_rng(9),
                     chunk_size=16, chunks_in_step=2, log=lambda *_: None,
                     mesh=mesh)


def worker(process_id: int, out_path: str):
    jax = _setup_jax(LOCAL_DEVICES)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=process_id,
    )
    assert jax.device_count() == N_PROC * LOCAL_DEVICES, jax.device_count()
    assert jax.process_count() == N_PROC

    from tak_tpu.parallel.mesh import make_mesh

    net, variables, examples = _build(SEED)
    mesh = make_mesh()  # global: spans both processes
    out = _train(net, variables, examples, mesh)
    if process_id == 0:
        import numpy as np

        flat = {
            "/".join(map(str, path)): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                out["params"]
            )[0]
        }
        np.savez(out_path, **flat)
        print(f"[worker0] wrote {len(flat)} param leaves to {out_path}",
              flush=True)
    print(f"[worker{process_id}] done", flush=True)


def single_reference(out_path: str):
    """Single-process 8-device mesh run on the same data (the oracle)."""
    jax = _setup_jax(N_PROC * LOCAL_DEVICES)
    import numpy as np

    from tak_tpu.parallel.mesh import make_mesh

    net, variables, examples = _build(SEED)
    out = _train(net, variables, examples, make_mesh())
    flat = {
        "/".join(map(str, path)): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            out["params"]
        )[0]
    }
    np.savez(out_path, **flat)


def launch() -> int:
    here = os.path.abspath(__file__)
    repo = os.path.dirname(os.path.dirname(here))
    with tempfile.TemporaryDirectory() as td:
        dist_npz = os.path.join(td, "dist.npz")
        ref_npz = os.path.join(td, "ref.npz")
        env = dict(os.environ, PYTHONPATH=repo + os.pathsep +
                   os.environ.get("PYTHONPATH", ""))
        procs = [
            subprocess.Popen(
                [sys.executable, here, "worker", str(i), dist_npz],
                env=env, cwd=repo,
            )
            for i in range(N_PROC)
        ]
        rcs = [p.wait(timeout=600) for p in procs]
        if any(rcs):
            print(f"FAIL: worker exit codes {rcs}")
            return 1
        ref = subprocess.run(
            [sys.executable, here, "reference", ref_npz],
            env=env, cwd=repo, timeout=600,
        )
        if ref.returncode:
            print("FAIL: single-process reference failed")
            return 1

        import numpy as np

        a, b = np.load(dist_npz), np.load(ref_npz)
        assert set(a.files) == set(b.files)
        worst = 0.0
        for k in a.files:
            np.testing.assert_allclose(
                a[k], b[k], rtol=1e-4, atol=5e-5, err_msg=k
            )
            worst = max(worst, float(np.abs(a[k] - b[k]).max()))
        print(f"OK: 2-process jax.distributed train == single-process "
              f"({len(a.files)} param leaves, max |diff| {worst:.2e})")
        return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "reference":
        single_reference(sys.argv[2])
    else:
        sys.exit(launch())
