"""Batched EM Gaussian Mixture (SASM point-quality; reference
``core/bbox/utils/gmm.py:8-357``), jit-friendly with a fixed iteration
count."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gmm_fit(points, n_components: int = 2, n_iter: int = 10,
            eps: float = 1e-6):
    """EM fit over (..., N, 2) point sets.

    Returns (weights (..., K), means (..., K, 2), covs (..., K, 2, 2)).
    Fixed-iteration EM (no convergence branch) so it lives inside jit.
    """
    n = points.shape[-2]
    k = n_components
    # init: pick spread points as means, uniform weights, identity covs
    idx = jnp.linspace(0, n - 1, k).astype(jnp.int32)
    mu0 = jnp.take(points, idx, axis=-2)                    # (..., K, 2)
    w0 = jnp.full(points.shape[:-2] + (k,), 1.0 / k)
    var0 = jnp.var(points, axis=-2, keepdims=True) + eps    # (..., 1, 2)
    cov0 = jnp.eye(2) * var0[..., None]                     # (..., 1, 2, 2)
    cov0 = jnp.broadcast_to(cov0, points.shape[:-2] + (k, 2, 2))

    def det2(S):
        return S[..., 0, 0] * S[..., 1, 1] - S[..., 0, 1] * S[..., 1, 0]

    def em_step(state, _):
        w, mu, cov = state
        # E step: responsibilities (..., N, K)
        d = points[..., :, None, :] - mu[..., None, :, :]   # (..., N, K, 2)
        det = jnp.maximum(det2(cov), eps)[..., None, :]     # (..., 1, K)
        i00 = cov[..., 1, 1] / jnp.maximum(det2(cov), eps)
        i01 = -cov[..., 0, 1] / jnp.maximum(det2(cov), eps)
        i11 = cov[..., 0, 0] / jnp.maximum(det2(cov), eps)
        quad = (d[..., 0] ** 2 * i00[..., None, :] +
                2 * d[..., 0] * d[..., 1] * i01[..., None, :] +
                d[..., 1] ** 2 * i11[..., None, :])
        logp = -0.5 * quad - 0.5 * jnp.log(det) + \
            jnp.log(jnp.maximum(w[..., None, :], eps))
        r = jax.nn.softmax(logp, axis=-1)                   # (..., N, K)
        # M step
        nk = r.sum(-2) + eps                                # (..., K)
        w_new = nk / n
        mu_new = jnp.einsum('...nk,...nd->...kd', r, points) / nk[..., None]
        d2 = points[..., :, None, :] - mu_new[..., None, :, :]
        cov_new = jnp.einsum('...nk,...nki,...nkj->...kij', r, d2, d2) / \
            nk[..., None, None] + eps * jnp.eye(2)
        return (w_new, mu_new, cov_new), None

    (w, mu, cov), _ = jax.lax.scan(em_step, (w0, mu0, cov0), None,
                                   length=n_iter)
    return w, mu, cov
