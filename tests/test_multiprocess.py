"""Multi-process distributed execution test (VERDICT r3 item 5).

Spawns 2 OS processes, each owning one CPU device, wired through
`parallel.mesh.init_distributed` (-> jax.distributed.initialize with gloo
collectives) into one 2-device global mesh; runs the real diffusion train
step with the global batch sharded over "data" (cross-process gradient
all-reduce inside the compiled step), and asserts the resulting params
match a single-process run of the same global batch.

This exercises the DCN code path of SURVEY §5.9 for real — the TPU-native
equivalent of the reference's `accelerate launch --num_processes N` DDP
(/root/reference/train_latent.py:42-48) — without needing two hosts.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

import _mp_worker

pytestmark = pytest.mark.slow

_DIR = os.path.dirname(os.path.abspath(__file__))


def test_two_process_dp_matches_single_process(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # one device per worker process
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    repo_root = os.path.dirname(_DIR)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root, _DIR, env.get("PYTHONPATH", "")]).rstrip(os.pathsep)

    outs = [str(tmp_path / f"w{i}.npz") for i in range(2)]
    port = "29531"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_DIR, "_mp_worker.py"),
             str(i), "2", port, outs[i]],
            env=env, cwd=_DIR,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), (
        f"worker failed:\n--- w0 ---\n{logs[0]}\n--- w1 ---\n{logs[1]}")

    w0 = np.load(outs[0])
    w1 = np.load(outs[1])

    # both processes hold identical replicated state
    for k in w0.files:
        np.testing.assert_array_equal(w0[k], w1[k], err_msg=f"{k} differs")

    # single-process baseline: same seeds, same global batch, one device
    state, step_fn = _mp_worker.build_parts()
    batch = _mp_worker.global_batch()
    rng = jax.random.PRNGKey(3)
    step_j = jax.jit(step_fn)
    for _ in range(_mp_worker.STEPS):
        state, metrics = step_j(state, batch, rng)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(w0["loss"]), rtol=1e-5, atol=1e-6)
    flat, _ = jax.tree_util.tree_flatten(state.params)
    for i, leaf in enumerate(flat):
        np.testing.assert_allclose(
            np.asarray(leaf), w0[f"p{i}"], rtol=1e-4, atol=1e-5,
            err_msg=f"param leaf {i} diverged between 2-process DP and "
                    f"single-process runs")
