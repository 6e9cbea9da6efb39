"""Multi-host training: two coordinated CPU processes == one process.

The reference has no distributed backend (DataParallel only, SURVEY.md
section 2.7); colddiff's multi-host path is JAX's coordination service + the
same SPMD mesh spanning hosts (colddiff/parallel/distributed.py).  This test
stands up a real 2-process cluster (jax.distributed over localhost, four
virtual CPU devices per process -> one global 8-device mesh) and checks the
global training step against the single-process 8-device run bit-for-bit:
same losses, same parameter checksum.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent

# two steps x [accum=1, B=8, 16, 16, 3], deterministic
GLOBAL_BATCHES = (
    np.random.default_rng(1234)
    .standard_normal((2, 1, 8, 16, 16, 3))
    .astype(np.float32)
    .clip(-1, 1)
)


def make_tiny_trainer(tmp):
    """Identical config on every host (and in the single-process control)."""
    from colddiff.data.datasets import SyntheticDataset
    from colddiff.diffusion import ColdDiffusion
    from colddiff.models import UnetConvNext
    from colddiff.operators import get_operator
    from colddiff.train import Trainer

    op = get_operator("blur", image_size=16, timesteps=3,
                      blur_routine="Constant", kernel_size=3, kernel_std=1.0)
    d = ColdDiffusion(op=op, image_size=16, channels=3)
    model = UnetConvNext(dim=8, dim_mults=(1, 2), channels=3)
    ds = SyntheticDataset(16, 3, length=8)
    return Trainer(
        d, model, ds,
        train_batch_size=8,
        train_num_steps=2,
        gradient_accumulate_every=1,
        save_and_sample_every=10**9,
        results_folder=str(tmp),
        num_workers=1,
        seed=0,
    )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])
    env["PYTHONPATH"] = str(REPO)

    shared = tmp_path / "shared_results"
    shared.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_multihost_child.py"),
             coord, "2", str(pid), str(shared)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        parts = dict(kv.split("=", 1) for kv in line.split()[1:])
        results[int(parts["pid"])] = (
            [float(x) for x in parts["losses"].split(",")],
            float(parts["checksum"]),
        )

    # both hosts observe the same global losses and end state
    assert results[0][0] == results[1][0]
    assert results[0][1] == results[1][1]

    # phase 2 (full train() + rank-0 checkpoint write, all-rank load): both
    # hosts agree, and the loaded state reproduces the trained state
    ckpt = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("CKPT")][-1]
        parts = dict(kv.split("=", 1) for kv in line.split()[1:])
        ckpt[int(parts["pid"])] = (float(parts["trained"]),
                                   float(parts["loaded"]))
    assert ckpt[0] == ckpt[1]
    np.testing.assert_allclose(ckpt[0][1], ckpt[0][0], rtol=1e-6)
    assert (shared / "model").exists()

    # single-process 8-device control on the same global batches
    tr = make_tiny_trainer(tmp_path)
    losses = []
    for step in range(GLOBAL_BATCHES.shape[0]):
        from colddiff.parallel import shard_batch

        batch = shard_batch(jnp.asarray(GLOBAL_BATCHES[step]), tr.mesh,
                            batch_dim=1)
        tr.state, loss = tr._train_step(tr.state, tr.diffusion, batch, None)
        losses.append(float(loss))
    checksum = float(
        sum(jnp.sum(jnp.abs(l))
            for l in jax.tree_util.tree_leaves(tr.state.params))
    )
    np.testing.assert_allclose(results[0][0], losses, rtol=1e-5)
    np.testing.assert_allclose(results[0][1], checksum, rtol=1e-5)
