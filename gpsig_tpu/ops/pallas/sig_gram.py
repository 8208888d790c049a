"""Fused Pallas TPU kernel for the truncated signature-kernel recursion.

This is the TPU-native analogue of the reference's hot loop
(``gpsig/signature_algs.py::signature_kern_first_order`` — SURVEY.md §2.1):
instead of materialising the level tensor A (shape [B, L1, L2]) in HBM for
every level (2×num_levels cumsum round-trips in the XLA path), each sequence
pair's increment matrix is loaded into VMEM once and the whole per-level DP
runs on-chip:

    A_1 = M;  A_m = M ⊙ (SL · A_{m-1} · SU);  k_m = Σ_{ij} A_m[i,j]

where SL/SU are strictly-lower/upper triangular ones matrices — the
exclusive 2-D cumsum expressed as two [L, L] matmuls so it runs on the MXU
(this Pallas lowering has no native cumsum primitive; the matmul form is
faster anyway for L ≲ a few hundred). Only the [num_levels+1] level sums
leave the chip.

Gradients use the adjoint recursion in a second fused kernel (one forward
recompute + reverse sweep, all in VMEM):

    Ḡ_{A_nl} = w_nl ⊙ 1
    Ḡ_M     += E(A_{m-1}) ⊙ Ḡ_{A_m};   Ḡ_{A_{m-1}} = SLᵀ·(M ⊙ Ḡ_{A_m})·SUᵀ
               + w_{m-1} ⊙ 1
    Ḡ_M     += Ḡ_{A_1}

Zero-padding M to (8, 128)-aligned shapes is exact: zero increments do not
change the recursion (same trick as the repeat-last-observation padding).

Currently order=1 (the reference benchmarks' default); higher orders fall
back to the XLA path in the kernel layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _tri(L, dtype, strictly_lower):
    r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    return ((c < r) if strictly_lower else (r < c)).astype(dtype)


def _fwd_kernel(m_ref, out_ref, *, num_levels):
    M = m_ref[0]  # [L1, L2]
    L1, L2 = M.shape
    dt = M.dtype
    SL = _tri(L1, dt, strictly_lower=True)
    SU = _tri(L2, dt, strictly_lower=False)
    out_ref[0, 0] = jnp.asarray(1.0, dt)
    A = M
    out_ref[1, 0] = jnp.sum(A)
    for m in range(2, num_levels + 1):
        E = jnp.dot(
            jnp.dot(SL, A, preferred_element_type=jnp.float32),
            SU,
            preferred_element_type=jnp.float32,
        ).astype(dt)
        A = M * E
        out_ref[m, 0] = jnp.sum(A)


def _bwd_kernel(m_ref, w_ref, gm_ref, *, num_levels):
    M = m_ref[0]  # [L1, L2]
    L1, L2 = M.shape
    dt = M.dtype
    SL = _tri(L1, dt, strictly_lower=True)
    SU = _tri(L2, dt, strictly_lower=False)
    SLT = SL.T
    SUT = SU.T

    # forward recompute, storing E_m = E(A_{m-1}) for m = 2..nl
    Es = []
    A = M
    for m in range(2, num_levels + 1):
        E = jnp.dot(
            jnp.dot(SL, A, preferred_element_type=jnp.float32),
            SU,
            preferred_element_type=jnp.float32,
        ).astype(dt)
        Es.append(E)
        A = M * E

    gM = jnp.zeros_like(M)
    gA = jnp.full((L1, L2), w_ref[num_levels, 0], dt)
    for m in range(num_levels, 1, -1):
        E = Es[m - 2]
        gM = gM + E * gA
        inner = M * gA
        gA_prev = jnp.dot(
            jnp.dot(SLT, inner, preferred_element_type=jnp.float32),
            SUT,
            preferred_element_type=jnp.float32,
        ).astype(dt)
        gA = gA_prev + w_ref[m - 1, 0]
    gM = gM + gA  # A_1 = M
    gm_ref[0] = gM


def _pad_m(M):
    B, L1, L2 = M.shape
    P1, P2 = _round_up(L1, 8), _round_up(L2, 128)
    if (P1, P2) != (L1, L2):
        M = jnp.pad(M, ((0, 0), (0, P1 - L1), (0, P2 - L2)))
    return M


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def sig_gram_levels(M, num_levels, interpret=False):
    """Per-level signature kernels (order 1) from increment matrices.

    M: [B, L1, L2] → [num_levels+1, B] (level 0 = 1)."""
    return _sig_gram_fwd_impl(M, num_levels, interpret)


def _sig_gram_fwd_impl(M, num_levels, interpret):
    B = M.shape[0]
    Mp = _pad_m(M)
    _, L1, L2 = Mp.shape
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, num_levels=num_levels),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L1, L2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_levels + 1, 1), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_levels + 1, B), M.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (num_levels - 1) * (L1 * L1 * L2 + L1 * L2 * L2),
            bytes_accessed=4 * B * L1 * L2,
            transcendentals=0,
        ),
    )(Mp)
    return out


def _vjp_fwd(M, num_levels, interpret):
    return _sig_gram_fwd_impl(M, num_levels, interpret), M


def _vjp_bwd(num_levels, interpret, M, w):
    B, L1o, L2o = M.shape
    Mp = _pad_m(M)
    _, L1, L2 = Mp.shape
    gM = pl.pallas_call(
        functools.partial(_bwd_kernel, num_levels=num_levels),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L1, L2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_levels + 1, 1), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L1, L2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L1, L2), M.dtype),
        interpret=interpret,
    )(Mp, w.astype(M.dtype))
    return (gM[:, :L1o, :L2o],)


sig_gram_levels.defvjp(_vjp_fwd, _vjp_bwd)
