"""Full-covariance Gaussian mixture via EM, in JAX.

Replaces the reference's ``pycave`` GPU GMM (and its *missing* local
``gmm_pycave`` module, imported by celebA_128_test.py:12 -- the GMM test paths
cannot run in the reference as shipped).  Used by the blind unconditional
generation path: fit channel-means (or blurred low-res images) of the train
set, sample the GMM, expand to constant images, reverse-sample
(deblurring_diffusion_pytorch.py:1391-1512).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["GMM", "fit_gmm", "sample_gmm"]


class GMM(NamedTuple):
    weights: jnp.ndarray  # [K]
    means: jnp.ndarray  # [K, D]
    covs: jnp.ndarray  # [K, D, D]


def _log_prob(gmm: GMM, x: jnp.ndarray) -> jnp.ndarray:
    """[N, K] log N(x | mu_k, Sigma_k) + log w_k."""
    d = x.shape[-1]
    chol = jnp.linalg.cholesky(gmm.covs)  # [K, D, D]
    diff = x[:, None, :] - gmm.means[None]  # [N, K, D]
    linv = jax.scipy.linalg.solve_triangular(
        chol, jnp.broadcast_to(jnp.eye(d), chol.shape), lower=True
    )  # [K, D, D]
    sol = jnp.einsum("kde,nke->nkd", linv, diff,
                 precision=jax.lax.Precision.HIGHEST)
    maha = jnp.sum(sol**2, axis=-1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    return (
        -0.5 * (maha + logdet + d * jnp.log(2 * jnp.pi))
        + jnp.log(gmm.weights)[None]
    )


def fit_gmm(
    x: jnp.ndarray,
    n_components: int,
    rng: jax.Array,
    n_iters: int = 100,
    reg: float = 1e-6,
) -> GMM:
    """EM fit on [N, D] data (k-means++-free: random init from data points)."""
    n, d = x.shape
    idx = jax.random.choice(rng, n, (n_components,), replace=False)
    means = x[idx]
    covs = jnp.tile(jnp.cov(x.T).reshape(d, d)[None] + reg * jnp.eye(d), (n_components, 1, 1))
    weights = jnp.full((n_components,), 1.0 / n_components)
    gmm = GMM(weights, means, covs)

    def step(gmm, _):
        logp = _log_prob(gmm, x)  # [N, K]
        logr = logp - jax.scipy.special.logsumexp(logp, axis=1, keepdims=True)
        r = jnp.exp(logr)  # responsibilities
        nk = jnp.sum(r, axis=0) + 1e-10  # [K]
        # HIGHEST: EM statistics on TPU must not run on bf16 inputs
        means = jnp.einsum("nk,nd->kd", r, x,
                           precision=jax.lax.Precision.HIGHEST) / nk[:, None]
        diff = x[:, None, :] - means[None]  # [N, K, D]
        covs = jnp.einsum("nk,nkd,nke->kde", r, diff, diff,
                          precision=jax.lax.Precision.HIGHEST) / nk[:, None, None]
        covs = covs + reg * jnp.eye(d)[None]
        return GMM(nk / n, means, covs), None

    gmm, _ = jax.lax.scan(step, gmm, None, length=n_iters)
    return gmm


def sample_gmm(gmm: GMM, rng: jax.Array, num: int) -> jnp.ndarray:
    """Draw [num, D] samples."""
    k_rng, g_rng = jax.random.split(rng)
    comp = jax.random.categorical(k_rng, jnp.log(gmm.weights), shape=(num,))
    chol = jnp.linalg.cholesky(gmm.covs)  # [K, D, D]
    z = jax.random.normal(g_rng, (num, gmm.means.shape[-1]))
    return gmm.means[comp] + jnp.einsum(
        "nde,ne->nd", chol[comp], z, precision=jax.lax.Precision.HIGHEST)
