"""Child process for tests/test_multihost.py: one host of a 2-host cluster.

Usage: python tests/_multihost_child.py <coordinator> <num_processes> <pid>
Env (set by the parent): JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=4.

Builds the global 8-device mesh via the coordination service, runs two
deterministic global training steps (each process contributing its
contiguous local slice of the hand-built global batch), and prints losses +
a parameter checksum for the parent to compare against its single-process
8-device run.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from colddiff.parallel import init_multihost

    init_multihost(coord, num_processes=nproc, process_id=pid)
    assert jax.device_count() == 8, jax.devices()
    assert jax.local_device_count() == 4
    assert jax.process_count() == nproc

    import jax.numpy as jnp

    from colddiff.parallel import shard_batch
    from tests.test_multihost import GLOBAL_BATCHES, make_tiny_trainer

    import tempfile

    def params_checksum(tr):
        return float(
            sum(jnp.sum(jnp.abs(l))
                for l in jax.tree_util.tree_leaves(tr.state.params))
        )

    with tempfile.TemporaryDirectory() as tmp:
        tr = make_tiny_trainer(tmp)
        per = GLOBAL_BATCHES.shape[2] // nproc
        losses = []
        for step in range(GLOBAL_BATCHES.shape[0]):
            local = GLOBAL_BATCHES[step][:, pid * per : (pid + 1) * per]
            batch = shard_batch(jnp.asarray(local), tr.mesh, batch_dim=1)
            tr.state, loss = tr._train_step(tr.state, tr.diffusion, batch, None)
            losses.append(float(loss))
        checksum = params_checksum(tr)
    print(
        "RESULT pid=%d losses=%.8f,%.8f checksum=%.6f"
        % (pid, losses[0], losses[1], checksum),
        flush=True,
    )

    # phase 2: the full train() loop through the per-process dataloader
    # stripes + the collective checkpoint write / all-rank load round trip
    # (shared results folder passed by the parent; Orbax's save is itself a
    # collective, so it doubles as the write barrier)
    shared = sys.argv[4]
    tr2 = make_tiny_trainer(shared)
    tr2.train(log_every=1)  # 2 steps; ends with the collective save()
    c_trained = params_checksum(tr2)

    tr3 = make_tiny_trainer(shared)
    tr3.load(str(tr3.results_folder / "model"))
    c_loaded = params_checksum(tr3)
    assert tr3.step == tr2.step == 2, (tr3.step, tr2.step)
    print(
        "CKPT pid=%d trained=%.6f loaded=%.6f" % (pid, c_trained, c_loaded),
        flush=True,
    )


if __name__ == "__main__":
    main()
