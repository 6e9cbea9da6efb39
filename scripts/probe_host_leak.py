"""Host-RSS probe for the per-step transfer path on the live backend.

The round-4 convergence retrain was OOM-killed at 131 GB anon RSS after
14600 steps -- ~9 MB/step, the size of the per-step host superbatch.  The
CPU-backend probe of the same loop is flat, so this measures the axon/TPU
transfer path directly: a tiny jitted donated step fed fresh host batches,
RSS sampled every N steps.

  python scripts/probe_host_leak.py [n_steps] [--sync-every K]

A linear slope ~= batch-size MB/step reproduces the leak; if --sync-every
bounds it, the "leak" is an unbounded in-flight dispatch queue and the
trainer needs a periodic device sync.
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def rss_mb():
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024


def main():
    argv = sys.argv[1:]
    sync_every = 0
    if "--sync-every" in argv:
        i = argv.index("--sync-every")
        sync_every = int(argv[i + 1])
        del argv[i:i + 2]  # remove flag AND its value from the positionals
    args = [a for a in argv if not a.startswith("--")]
    n = int(args[0]) if args else 2000

    @jax.jit
    def step(w, x):
        return w + 1e-6 * jnp.mean(x, axis=0), jnp.mean(x)

    rng = np.random.default_rng(0)
    shape = (16, 128, 128, 3)  # 3.1 MB fp32, ~half the retrain superbatch
    w = jnp.zeros(shape[1:], jnp.float32)
    host = rng.standard_normal(size=shape).astype(np.float32)
    w, _ = step(w, jnp.asarray(host))  # compile
    base = rss_mb()
    print(f"backend={jax.default_backend()} batch={host.nbytes/1e6:.1f}MB "
          f"base rss {base:.0f} MB sync_every={sync_every}", flush=True)
    t0 = time.time()
    losses = None
    for i in range(n):
        host[0, 0, 0, 0] = i  # defeat any host-side dedup
        w, loss = step(w, jnp.asarray(host))
        if sync_every and i % sync_every == sync_every - 1:
            jax.block_until_ready(w)
            losses = float(loss)
        if i % 200 == 0 or i == n - 1:
            r = rss_mb()
            print(f"step {i:5d} rss {r:7.0f} MB (+{r-base:6.0f}, "
                  f"{(r-base)/max(i,1):.2f} MB/step) "
                  f"{(time.time()-t0)/max(i,1)*1e3:.1f} ms/step", flush=True)
    w.block_until_ready()
    r = rss_mb()
    print(f"final rss {r:.0f} MB (+{r-base:.0f} over {n} steps = "
          f"{(r-base)/n:.3f} MB/step); expect ~{host.nbytes/1e6:.1f} if the "
          f"transfer path leaks every batch", flush=True)
    _ = losses


if __name__ == "__main__":
    main()
