"""Explicit truncated signatures of batched paths (Chen recursion).

Used by the VOSF path (variational orthogonal signature features — the
fork's ``Kuu = I`` inter-domain family, SURVEY.md §2.2) and as an oracle
for the recursion engine. The reference fork computes explicit signatures
with tensor ops / iisignature; here it is a `lax.scan` over steps with
per-level flattened coordinate vectors:

    S ← S ⊗ exp⊗(Δx_t),   exp⊗(v) = (1, v, v⊗v/2!, …)

Level-m coordinates live in [N, d^m]; cost O(N·L·d^num_levels) — the VOSF
regime is small d / moderate num_levels where Σ d^m stays in the hundreds.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def truncated_signature(X, num_levels):
    """X: [N, L, d] → list of level coordinates [N, d^m], m = 1..num_levels.

    Exact signature of the piecewise-linear interpolation."""
    N, L, d = X.shape
    dX = jnp.diff(X, axis=1)  # [N, L-1, d]
    dtype = X.dtype

    def step(levels, dx):
        # exp terms E_k = dx^{⊗k}/k!, flattened
        E = [dx]
        for k in range(2, num_levels + 1):
            out = E[-1][:, :, None] * dx[:, None, :] / k
            E.append(out.reshape(N, -1))
        new = []
        for m in range(1, num_levels + 1):
            term = levels[m - 1] + E[m - 1]  # S_m·1 + 1·E_m
            for a in range(1, m):
                prod = levels[a - 1][:, :, None] * E[m - a - 1][:, None, :]
                term = term + prod.reshape(N, -1)
            new.append(term)
        return tuple(new), None

    init = tuple(
        jnp.zeros((N, d**m), dtype) for m in range(1, num_levels + 1)
    )
    levels, _ = lax.scan(step, init, jnp.moveaxis(dX, 1, 0))
    return list(levels)


def signature_dim(d, num_levels, include_constant=True):
    total = sum(d**m for m in range(1, num_levels + 1))
    return total + (1 if include_constant else 0)
