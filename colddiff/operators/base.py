"""Degradation operator protocol -- the L1 abstraction the reference never built.

The reference inlines each degradation inside its own ``GaussianDiffusion``
copy (SURVEY.md section 2.2); only snowification/diffusion/forward_process_impl.py
has a real base class (``ForwardProcessBase``, lines 45-52).  Here every
degradation is a :class:`flax.struct.PyTreeNode`: array state (cumulative
operator matrices, schedules, snow fields) are pytree leaves that flow through
``jit``/``scan``/``shard_map``; routine names and sizes are static fields.

Time convention
---------------
``degrade(x, n)`` applies *n* degradation steps; ``n`` is a per-sample int32
vector in ``[0, T]`` and ``degrade(x, 0) == x``.  The reference's
``q_sample(x, t)`` (t an index into the step list) corresponds to
``degrade(x, t + 1)``, and its sampling loops' ``for i in range(t)`` chains to
``degrade(x, t)``.  All operators implement ``degrade`` in O(1) compiled work
per call (gather + fused math), never a sequential Python chain.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["Degradation", "bcast"]


def bcast(v: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape a per-sample vector [B] to [B, 1, 1, ...] for broadcasting."""
    return v.reshape(v.shape[0], *((1,) * (ndim - 1)))


class Degradation(struct.PyTreeNode):
    """Base degradation operator.  Subclasses are immutable pytrees."""

    timesteps: int = struct.field(pytree_node=False)

    # Family B operators (noise / mix / fade-generation) interpolate toward an
    # explicit endpoint ``x_end`` that the caller must supply.
    requires_x_end: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------ #

    def degrade(
        self,
        x: jnp.ndarray,
        n: jnp.ndarray,
        *,
        x_end: Optional[jnp.ndarray] = None,
        og: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Apply ``n`` degradation steps to NHWC batch ``x`` (n: int32 [B])."""
        raise NotImplementedError

    def degrade_sampling(self, x, n, **kw) -> jnp.ndarray:
        """Degradation used inside reverse-sampling loops.

        Identical to :meth:`degrade` for every operator except blur's
        ``Individual_Incremental`` routine, whose sampler applies a single
        per-level kernel (deblurring_diffusion_pytorch.py:405,429) while its
        q_sample still composes sequentially.
        """
        return self.degrade(x, n, **kw)

    def degrade_range(self, x: jnp.ndarray, n0: int, n1: int, *,
                      x_end: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Apply steps ``n0..n1-1`` to a state already degraded to level
        ``n0`` (static ints).  Used by ``sample_from_blur``-style partial
        forward chains (deblurring_diffusion_pytorch.py:877-879
        ``for i in range(start, t)``).  Sequential-composition operators
        (blur) compose per-step matrices; interpolation operators (Family B)
        use the closed-form schedule ratio and need ``x_end``."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support partial-range degradation"
        )

    def total(self, x: jnp.ndarray, *, x_end=None, og=None, rng=None) -> jnp.ndarray:
        """Fully degraded state x_T (used to initialize generation)."""
        b = x.shape[0]
        n = jnp.full((b,), self.timesteps, dtype=jnp.int32)
        return self.degrade(x, n, x_end=x_end, og=og, rng=rng)

    def reset(self, rng: jax.Array, batch_size: int) -> "Degradation":
        """Redraw any stochastic operator state (snow fields, ...).

        Mirrors ``ForwardProcessBase.reset_parameters``
        (forward_process_impl.py:49-52).  Pure: returns a new operator.
        """
        del rng, batch_size
        return self

    def sample_x_end(self, rng: jax.Array, x: jnp.ndarray):
        """Synthesize the degradation endpoint for ops that own one (hot noise
        draws N(0,I), fade-generation draws a random constant color).  Returns
        None when the endpoint must come from data (animorphosis) or when the
        operator is deterministic (Family A)."""
        del rng, x
        return None

    def sample_rng_state(self, rng: jax.Array, batch_size: int):
        """Draw per-call randomness consumed by ``degrade`` (e.g. the
        Random_Incremental fade crops redrawn at every q_sample call,
        defading_diffusion_gaussian.py:496-507).  Returns a value passed back
        via ``degrade(..., rng=...)`` or None."""
        del rng, batch_size
        return None
