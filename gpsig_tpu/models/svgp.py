"""Sparse variational GP (SVGP) with whitened parameterisation.

Re-implements the dependency-owned model layer the reference builds on
(SURVEY.md §2.3 / §3.1: ``gpflow.models.SVGP._build_likelihood`` — the ELBO
with minibatch scaling — and ``_build_predict``), as a pure-functional JAX
model whose pytree leaves are the variational and hyper parameters.

ELBO = (N/B) Σ_batch E_q[log p(y_i | f_i)] − KL[q(u) ‖ p(u)].

whiten=True (the reference's benchmark setting): u = L v, q(v) = N(μ, SSᵀ),
KL is against N(0, I) and the conditional projects through L⁻¹Kuf.

The entire step — Gram construction (MXU), DP recursions (VPU), chol +
triangular solves, likelihood quadrature — is one jitted function;
``gpsig_tpu/parallel`` shards it over a device mesh.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from gpsig_tpu import gauss
from gpsig_tpu.config import precise_linalg


@struct.dataclass
class SVGP:
    kernel: Any
    likelihood: Any
    inducing: Any
    q_mu: jnp.ndarray  # [M, C]
    q_sqrt: jnp.ndarray  # [C, M, M] (lower-tri used) or [M, C] if q_diag
    whiten: bool = struct.field(pytree_node=False, default=True)
    q_diag: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, kernel, likelihood, inducing, num_latent,
               whiten=True, q_diag=False, dtype=jnp.float64):
        M = inducing.num_inducing
        q_mu = jnp.zeros((M, num_latent), dtype)
        if q_diag:
            q_sqrt = jnp.ones((M, num_latent), dtype)
        else:
            q_sqrt = jnp.broadcast_to(
                jnp.eye(M, dtype=dtype), (num_latent, M, M)
            )
        return cls(kernel=kernel, likelihood=likelihood, inducing=inducing,
                   q_mu=q_mu, q_sqrt=q_sqrt, whiten=whiten, q_diag=q_diag)

    @property
    def num_latent(self):
        return self.q_mu.shape[1]

    def _tril_q_sqrt(self):
        if self.q_diag:
            return self.q_sqrt
        return jnp.tril(self.q_sqrt)

    def _covariances(self, X):
        # jitter=None → the inducing object resolves a dtype-aware default
        if hasattr(self.inducing, "covariances"):
            return self.inducing.covariances(self.kernel, X, None)
        Kuu = self.inducing.Kuu(self.kernel, None)
        Kuf = self.inducing.Kuf(self.kernel, X)
        return Kuu, Kuf

    @property
    def _kuu_identity(self):
        """VOSF fast path: Kuu = I needs no Cholesky/solves (O(M) KL and
        elementwise conditional — SURVEY.md §2.2)."""
        return getattr(self.inducing, "kuu_is_identity", False)

    @precise_linalg
    def _identity_conditional(self, Kuf, Knn):
        q_sqrt = self._tril_q_sqrt()
        mean = Kuf.T @ self.q_mu
        if self.q_diag:
            extra = (q_sqrt.T[:, :, None] ** 2 * Kuf[None] ** 2).sum(1)
        else:
            SA = jnp.einsum("cmk,kn->cmn", jnp.swapaxes(q_sqrt, -1, -2), Kuf)
            extra = jnp.sum(SA**2, axis=1)
        var = Knn[None, :] - jnp.sum(Kuf**2, axis=0)[None, :] + extra
        return mean, var.T

    @precise_linalg
    def predict_f(self, X, full_cov=False):
        if self._kuu_identity and not full_cov:
            Kuf = self.inducing.Kuf(self.kernel, X)
            return self._identity_conditional(Kuf, self.kernel.Kdiag(X))
        Kuu, Kuf = self._covariances(X)
        Knn = (
            self.kernel.K(X) if full_cov else self.kernel.Kdiag(X)
        )
        return gauss.conditional(
            Kuf, Kuu, Knn, self.q_mu, self._tril_q_sqrt(),
            white=self.whiten, full_cov=full_cov,
        )

    def prior_kl(self, Kuu=None):
        q_sqrt = self._tril_q_sqrt()
        if self.whiten:
            return gauss.gauss_kl(self.q_mu, q_sqrt)
        if Kuu is None:
            Kuu = self.inducing.Kuu(self.kernel, None)
        return gauss.gauss_kl(self.q_mu, q_sqrt, K=Kuu)

    @precise_linalg
    def elbo(self, X, Y, num_data=None, key=None):
        """Evidence lower bound on a (mini)batch.

        num_data: total dataset size N for minibatch scaling (defaults to
        the batch size). key: PRNG key for Monte-Carlo likelihoods.
        """
        Knn = self.kernel.Kdiag(X)
        if self._kuu_identity:
            Kuf = self.inducing.Kuf(self.kernel, X)
            fmean, fvar = self._identity_conditional(Kuf, Knn)
            kl = gauss.gauss_kl(self.q_mu, self._tril_q_sqrt())
        else:
            Kuu, Kuf = self._covariances(X)
            L = gauss.stable_cholesky(Kuu)
            fmean, fvar = gauss.conditional(
                Kuf, Kuu, Knn, self.q_mu, self._tril_q_sqrt(),
                white=self.whiten, Kmm_chol=L,
            )
            if self.whiten:
                kl = gauss.gauss_kl(self.q_mu, self._tril_q_sqrt())
            else:
                kl = gauss.gauss_kl(self.q_mu, self._tril_q_sqrt(), K_chol=L)
        var_exp = self.likelihood.variational_expectations(
            Y, fmean, fvar, key=key
        )
        batch = fmean.shape[0]
        total = batch if num_data is None else num_data
        scale = jnp.asarray(total, fmean.dtype) / batch
        return scale * jnp.sum(var_exp) - kl

    def predict_y(self, X, **kw):
        m, v = self.predict_f(X)
        return self.likelihood.predict_mean_and_var(m, v, **kw)

    def predict_log_density(self, X, Y, **kw):
        m, v = self.predict_f(X)
        return self.likelihood.predict_log_density(Y, m, v, **kw)
