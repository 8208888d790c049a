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
leave the chip, packed into one 128-lane vector per pair (TPU block shapes
must tile to (8, 128) or span the full dimension).

Gradients use the adjoint recursion in a second fused kernel (one forward
recompute + reverse sweep, all in VMEM):

    Ḡ_{A_nl} = w_nl ⊙ 1
    Ḡ_M     += E(A_{m-1}) ⊙ Ḡ_{A_m};   Ḡ_{A_{m-1}} = SLᵀ·(M ⊙ Ḡ_{A_m})·SUᵀ
               + w_{m-1} ⊙ 1
    Ḡ_M     += Ḡ_{A_1}

Zero-padding M to (8, 128)-aligned shapes is exact: zero increments do not
change the recursion (same trick as the repeat-last-observation padding).

Order >= 2 (the reference's higher-order correction,
``signature_kern_higher_order``) runs the same way: the run-length-indexed
DP states D_{r,s} (see ``gpsig_tpu/ops/signature.py``) are [L1, L2] VMEM
arrays and every exclusive cumsum is a triangular matmul — row cumsums
``X·SU``, column cumsums ``SL·X``, the double cumsum ``SL·X·SU``. Its
backward is fused too (``_bwd_kernel_ho``): a forward recompute keeping
all ≤ p²·num_levels DP states resident in VMEM, then the hand-derived
adjoint of the run-length recursion — higher-order *training* never
round-trips the [B, L1, L2] tensor through HBM either.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpsig_tpu.ops import signature as sigops

_LANE = 128

# See fused_gram.py: in-kernel matmul mode ('highest' exact f32, 'split'
# two-pass bf16 hi/lo, 'default' one-pass bf16) from GPSIG_MXU_PRECISION;
# every dot here has one structural 0/±1 triangular operand.
from gpsig_tpu.ops.pallas.fused_gram import _default_mxu, _mxu_dot


def _dot_sl(S, A, mxu):
    """structural @ data."""
    return _mxu_dot(S, A, mxu, "right").astype(A.dtype)


def _dot_sr(A, S, mxu):
    """data @ structural."""
    return _mxu_dot(A, S, mxu, "left").astype(A.dtype)


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
    mxu = _default_mxu()
    SL = _tri(L1, dt, strictly_lower=True)
    SU = _tri(L2, dt, strictly_lower=False)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    out = jnp.where(lane == 0, jnp.asarray(1.0, dt), 0.0)
    A = M
    out = out + jnp.where(lane == 1, jnp.sum(A), 0.0)
    for m in range(2, num_levels + 1):
        E = _dot_sr(_dot_sl(SL, A, mxu), SU, mxu)
        A = M * E
        out = out + jnp.where(lane == m, jnp.sum(A), 0.0)
    out_ref[0] = out


def _bwd_kernel(m_ref, w_ref, gm_ref, *, num_levels):
    M = m_ref[0]  # [L1, L2]
    dt = M.dtype
    L1, L2 = M.shape
    mxu = _default_mxu()
    SL = _tri(L1, dt, strictly_lower=True)
    SU = _tri(L2, dt, strictly_lower=False)
    w = w_ref[0]  # [1, 128]; w[0, m] = cotangent of level m

    # forward recompute, storing E_m = E(A_{m-1}) for m = 2..nl
    Es = []
    A = M
    for m in range(2, num_levels + 1):
        E = _dot_sr(_dot_sl(SL, A, mxu), SU, mxu)
        Es.append(E)
        A = M * E

    gM = jnp.zeros_like(M)
    gA = jnp.broadcast_to(w[0, num_levels], (L1, L2))
    for m in range(num_levels, 1, -1):
        E = Es[m - 2]
        gM = gM + E * gA
        inner = M * gA
        gA = _dot_sr(_dot_sl(SL.T, inner, mxu), SU.T, mxu) + w[0, m - 1]
    gM = gM + gA  # A_1 = M
    gm_ref[0] = gM


def _fwd_kernel_ho(m_ref, out_ref, *, num_levels, order):
    """Higher-order forward: run-length DP states D[r][s] in VMEM.

    Mirrors ``gpsig_tpu/ops/signature.py::_higher_order`` with every
    exclusive cumsum as a triangular matmul (MXU)."""
    M = m_ref[0]  # [L1, L2]
    L1, L2 = M.shape
    dt = M.dtype
    mxu = _default_mxu()
    SL = _tri(L1, dt, strictly_lower=True)
    SU = _tri(L2, dt, strictly_lower=False)

    def msl(A, B):
        # one operand is always the structural SL (left) or SU (right)
        if A is SL:
            return _dot_sl(A, B, mxu)
        return _dot_sr(A, B, mxu)

    def tree_sum(items):
        acc = None
        for it in items:
            if it is None:
                continue
            acc = it if acc is None else acc + it
        return acc

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    out = jnp.where(lane == 0, jnp.asarray(1.0, dt), 0.0)
    out = out + jnp.where(lane == 1, jnp.sum(M), 0.0)
    p = min(order, num_levels)
    D = [[None] * p for _ in range(p)]
    D[0][0] = M
    for m in range(2, num_levels + 1):
        R = min(p, m)
        Dn = [[None] * p for _ in range(p)]
        total = tree_sum(d for row in D for d in row)
        Dn[0][0] = M * msl(msl(SL, total), SU)
        for r in range(1, R):
            row = tree_sum(D[r - 1])
            if row is not None:
                Dn[r][0] = (M / (r + 1)) * msl(row, SU)
            col = tree_sum(D[s][r - 1] for s in range(p))
            if col is not None:
                Dn[0][r] = (M / (r + 1)) * msl(SL, col)
        for r in range(1, R):
            for s in range(1, R):
                if D[r - 1][s - 1] is not None:
                    Dn[r][s] = (M / ((r + 1) * (s + 1))) * D[r - 1][s - 1]
        D = Dn
        out = out + jnp.where(
            lane == m, jnp.sum(tree_sum(d for row in D for d in row)), 0.0
        )
    out_ref[0] = out


def _fwd_ho_states(M, SL, SU, num_levels, order, mxu):
    """Run the higher-order forward, returning per-level DP states and the
    triangular-matmul products the adjoint needs.

    Returns (Ds, hist): Ds[m-1] = level-m state grid (p×p, None where a
    state does not exist yet); hist[m-2] = (TOP, rowsU, colsL) for level m
    with TOP = SL·total·SU, rowsU[r] = rowsum_{r-1}·SU,
    colsL[r] = SL·colsum_{r-1}."""

    def tree_sum(items):
        acc = None
        for it in items:
            if it is None:
                continue
            acc = it if acc is None else acc + it
        return acc

    p = min(order, num_levels)
    D = [[None] * p for _ in range(p)]
    D[0][0] = M
    Ds = [D]
    hist = []
    for m in range(2, num_levels + 1):
        R = min(p, m)
        Dn = [[None] * p for _ in range(p)]
        total = tree_sum(d for row in D for d in row)
        TOP = _dot_sr(_dot_sl(SL, total, mxu), SU, mxu)
        Dn[0][0] = M * TOP
        rowsU, colsL = {}, {}
        for r in range(1, R):
            row = tree_sum(D[r - 1])
            if row is not None:
                rowsU[r] = _dot_sr(row, SU, mxu)
                Dn[r][0] = (M / (r + 1)) * rowsU[r]
            col = tree_sum(D[s][r - 1] for s in range(p))
            if col is not None:
                colsL[r] = _dot_sl(SL, col, mxu)
                Dn[0][r] = (M / (r + 1)) * colsL[r]
        for r in range(1, R):
            for s in range(1, R):
                if D[r - 1][s - 1] is not None:
                    Dn[r][s] = (M / ((r + 1) * (s + 1))) * D[r - 1][s - 1]
        hist.append((TOP, rowsU, colsL))
        Ds.append(Dn)
        D = Dn
    return Ds, hist


def _bwd_kernel_ho(m_ref, w_ref, gm_ref, *, num_levels, order):
    """Fused higher-order backward: forward recompute keeping all run-length
    DP states in VMEM, then the adjoint recursion level-by-level — order≥2
    training never re-materialises the [B, L1, L2] tensor through XLA."""
    M = m_ref[0]
    dt = M.dtype
    L1, L2 = M.shape
    mxu = _default_mxu()
    SL = _tri(L1, dt, strictly_lower=True)
    SU = _tri(L2, dt, strictly_lower=False)
    SLT, SUT = SL.T, SU.T
    w = w_ref[0]  # [1, 128]; w[0, m] = cotangent of level m
    p = min(order, num_levels)

    Ds, hist = _fwd_ho_states(M, SL, SU, num_levels, order, mxu)

    def bc(x):
        return jnp.broadcast_to(x, (L1, L2))

    # level-num_levels cotangents: every existing state feeds k_nl
    gD = [
        [
            bc(w[0, num_levels]) if Ds[-1][r][s] is not None else None
            for s in range(p)
        ]
        for r in range(p)
    ]
    gM = jnp.zeros_like(M)
    for m in range(num_levels, 1, -1):
        TOP, rowsU, colsL = hist[m - 2]
        Dprev = Ds[m - 2]
        R = min(p, m)
        # start level-(m-1) cotangents with the k_{m-1} sum contribution
        gprev = [
            [
                bc(w[0, m - 1]) if Dprev[r][s] is not None else None
                for s in range(p)
            ]
            for r in range(p)
        ]
        # Dn[0][0] = M ⊙ (SL·total·SU): flows to M and to every prev state
        g00 = gD[0][0]
        gM = gM + TOP * g00
        T = _dot_sr(_dot_sl(SLT, M * g00, mxu), SUT, mxu)
        for r in range(p):
            for s in range(p):
                if gprev[r][s] is not None:
                    gprev[r][s] = gprev[r][s] + T
        for r in range(1, R):
            if r in rowsU and gD[r][0] is not None:
                # Dn[r][0] = (M/(r+1)) ⊙ (rowsum_{r-1}·SU)
                gM = gM + rowsU[r] * gD[r][0] / (r + 1)
                Ur = _dot_sr(M * gD[r][0], SUT, mxu) / (r + 1)
                for s in range(p):
                    if gprev[r - 1][s] is not None:
                        gprev[r - 1][s] = gprev[r - 1][s] + Ur
            if r in colsL and gD[0][r] is not None:
                # Dn[0][r] = (M/(r+1)) ⊙ (SL·colsum_{r-1})
                gM = gM + colsL[r] * gD[0][r] / (r + 1)
                Vr = _dot_sl(SLT, M * gD[0][r], mxu) / (r + 1)
                for a in range(p):
                    if gprev[a][r - 1] is not None:
                        gprev[a][r - 1] = gprev[a][r - 1] + Vr
        for r in range(1, R):
            for s in range(1, R):
                if gD[r][s] is not None and Dprev[r - 1][s - 1] is not None:
                    c = 1.0 / ((r + 1) * (s + 1))
                    gM = gM + Dprev[r - 1][s - 1] * gD[r][s] * c
                    gprev[r - 1][s - 1] = gprev[r - 1][s - 1] + M * gD[
                        r
                    ][s] * c
        gD = gprev
    gM = gM + gD[0][0]  # D_1[0][0] = M
    gm_ref[0] = gM


def _pad_m(M):
    B, L1, L2 = M.shape
    P1, P2 = _round_up(L1, 8), _round_up(L2, _LANE)
    if (P1, P2) != (L1, L2):
        M = jnp.pad(M, ((0, 0), (0, P1 - L1), (0, P2 - L2)))
    return M


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def sig_gram_levels(M, num_levels, interpret=False):
    """Per-level signature kernels (order 1) from increment matrices.

    M: [B, L1, L2] → [num_levels+1, B] (level 0 = 1)."""
    return _sig_gram_fwd_impl(M, num_levels, interpret)


def _sig_gram_fwd_impl(M, num_levels, interpret):
    if num_levels + 1 > _LANE:
        raise ValueError("num_levels must be < 128")
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
        out_specs=pl.BlockSpec((1, 1, _LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, _LANE), M.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * max(num_levels - 1, 0)
            * (L1 * L1 * L2 + L1 * L2 * L2),
            bytes_accessed=4 * B * L1 * L2,
            transcendentals=0,
        ),
    )(Mp)
    return out[:, 0, : num_levels + 1].T  # [nl+1, B]


def _vjp_fwd(M, num_levels, interpret):
    return _sig_gram_fwd_impl(M, num_levels, interpret), M


def _vjp_bwd(num_levels, interpret, M, w):
    B, L1o, L2o = M.shape
    Mp = _pad_m(M)
    _, L1, L2 = Mp.shape
    wp = jnp.zeros((B, 1, _LANE), M.dtype)
    wp = wp.at[:, 0, : num_levels + 1].set(w.T.astype(M.dtype))
    gM = pl.pallas_call(
        functools.partial(_bwd_kernel, num_levels=num_levels),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L1, L2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L1, L2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L1, L2), M.dtype),
        interpret=interpret,
    )(Mp, wp)
    return (gM[:, :L1o, :L2o],)


sig_gram_levels.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def sig_gram_levels_ho(M, num_levels, order, interpret=False):
    """Per-level signature kernels at order >= 2 from increment matrices.

    M: [B, L1, L2] → [num_levels+1, B] (level 0 = 1). Forward is the fused
    VMEM kernel; backward recomputes through the XLA recursion (exact)."""
    return _sig_gram_ho_fwd_impl(M, num_levels, order, interpret)


def _sig_gram_ho_fwd_impl(M, num_levels, order, interpret):
    if num_levels + 1 > _LANE:
        raise ValueError("num_levels must be < 128")
    B = M.shape[0]
    Mp = _pad_m(M)
    _, L1, L2 = Mp.shape
    p = min(order, num_levels)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_ho, num_levels=num_levels,
                          order=order),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L1, L2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, _LANE), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, _LANE), M.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * max(num_levels - 1, 0) * (p + 1)
            * (L1 * L1 * L2 + L1 * L2 * L2),
            bytes_accessed=4 * B * L1 * L2,
            transcendentals=0,
        ),
    )(Mp)
    return out[:, 0, : num_levels + 1].T  # [nl+1, B]


def _vjp_ho_fwd(M, num_levels, order, interpret):
    return _sig_gram_ho_fwd_impl(M, num_levels, order, interpret), M


def _vjp_ho_bwd(num_levels, order, interpret, M, w):
    return (_sig_gram_ho_bwd_impl(M, w, num_levels, order, interpret),)


def _sig_gram_ho_bwd_impl(M, w, num_levels, order, interpret):
    B, L1o, L2o = M.shape
    Mp = _pad_m(M)
    _, L1, L2 = Mp.shape
    wp = jnp.zeros((B, 1, _LANE), M.dtype)
    wp = wp.at[:, 0, : num_levels + 1].set(w.T.astype(M.dtype))
    gM = pl.pallas_call(
        functools.partial(_bwd_kernel_ho, num_levels=num_levels,
                          order=order),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L1, L2), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L1, L2), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L1, L2), M.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * max(num_levels - 1, 0)
            * (2 * min(order, num_levels) + 3)
            * (L1 * L1 * L2 + L1 * L2 * L2),
            bytes_accessed=4 * B * 2 * L1 * L2,
            transcendentals=0,
        ),
    )(Mp, wp)
    return gM[:, :L1o, :L2o]


sig_gram_levels_ho.defvjp(_vjp_ho_fwd, _vjp_ho_bwd)
