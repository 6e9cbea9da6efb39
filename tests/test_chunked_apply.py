"""apply_in_chunks: jit-compatible batched evaluation in fixed-size chunks.

Perf context: XLA schedules the 128px UNet forward poorly above B=32 (the
round-1 B=64 cliff); big eval batches run as chunks of a well-scheduled size.
"""

import jax
import jax.numpy as jnp
import numpy as np

from colddiff.utils import apply_in_chunks


def test_matches_direct_apply_divisible():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 4, 4, 3)),
                    jnp.float32)
    t = jnp.arange(8, dtype=jnp.int32)

    def fn(xc, tc):
        return xc * 2.0 + tc[:, None, None, None].astype(jnp.float32)

    out = apply_in_chunks(fn, 2, x, t)
    np.testing.assert_allclose(out, fn(x, t), rtol=1e-6)


def test_ragged_batch_padding_is_sliced_off():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((7, 5)),
                    jnp.float32)
    out = apply_in_chunks(lambda a: a + 1.0, 3, x)
    assert out.shape == (7, 5)
    np.testing.assert_allclose(out, x + 1.0, rtol=1e-6)


def test_small_batch_short_circuits():
    x = jnp.ones((2, 3))
    out = apply_in_chunks(lambda a: a * 3.0, 16, x)
    np.testing.assert_allclose(out, x * 3.0)


def test_under_jit_and_pytree_output():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((6, 3)),
                    jnp.float32)

    @jax.jit
    def run(x):
        return apply_in_chunks(lambda a: {"y": a * 2, "z": jnp.sum(a, -1)},
                               2, x)

    out = run(x)
    np.testing.assert_allclose(out["y"], x * 2, rtol=1e-6)
    assert out["z"].shape == (6,)
