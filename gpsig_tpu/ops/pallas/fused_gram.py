"""Fully-fused signature-Gram Pallas kernel: base kernel + differencing +
per-level DP in one pass, nothing O(N²L²) ever touches HBM.

Profiling the XLA path (N=200, L=50) shows the increment-matrix
construction (base-kernel Gram + [N1,L,N2,L]→[N1,N2,L,L] transpose + double
difference) costs as much as the recursion itself — both are HBM-bandwidth
bound on the [N²,L,L] tensor. This kernel removes that tensor entirely:

- grid = (N1/bx, N2/(sy·128)): bx x-sequences (lane-packed) against sy
  128-lane blocks of y-sequences (sublane-stacked with block-diagonal
  structural matrices, filling the MXU's M/K tiles toward 128) per step.
  HBM traffic = X + Yᵀ + [levels, N1, N2] out.
- inside: a `fori_loop` over columns j of the (virtual) increment matrix.
  Per column, the base-kernel column K[:, j+1] is computed from the raw
  sequences (d-loop of FMAs; exp for RBF), double-differenced against the
  previous column, and fed to the running DP states
      C_m[i, p] = Σ_{j' < j} A_m[i, j', p]
  with the exclusive row-cumsum as ONE [Lp, Lp]·[Lp, (nl-1)·128] MXU
  matmul per column (all levels batched along lanes):
      A_m[:, j] = Mcol ⊙ (SL · C_{m-1}),   k_m += Σ_i A_m[:, j].
- lanes are pairs ⇒ no lane padding waste; L pads only to sublane
  granularity (8).

Total FLOPs ≈ 2·levels·N²·L²·Lp — the information-theoretic cost of the
recursion — with N²·L·d FMAs for the base kernel.

Backward: a fully-fused reverse column sweep on TPU backends
(``fused_gram_levels_bwd_pallas`` — reconstructs the DP states in VMEM);
row-blocked XLA recompute elsewhere.

The diagonal variant (k_m(x_n, x_n), needed by per-level normalisation and
Kdiag) uses the same column scan with both sides per-lane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpsig_tpu.ops import signature as sigops

_LANE = 128
_LEVROWS = 8  # output rows reserved for level sums (num_levels+1 <= 8)

# MXU precision for the in-kernel matmuls (triangular-ones cumsums, 0/1
# expansion/difference operators, and DP products). Mosaic's dot lowering
# supports only DEFAULT (1-pass bf16, ~4e-3 rel err on f32 operands) and
# HIGHEST (exact f32 via 6 passes) — Precision.HIGH raises
# NotImplementedError. Every matmul here has one *structural* operand
# (0/±1 triangular/bidiagonal/expansion matrices — exact in bf16), so a
# third mode exists that Mosaic can't express natively: 'split' decomposes
# the data operand a = hi + lo (both bf16, lo carrying the next 8 mantissa
# bits) and runs TWO 1-pass matmuls, giving ~2^-16 relative error — close
# to f32 — at a third of HIGHEST's MXU cycles. These per-pair DP matmuls
# are M=K=Lp≈L shaped (well under the 128×128 systolic array), so the
# kernel is pass-count-bound and 'split' is the throughput mode of choice.
# Modes: 'highest' (exact f32), 'split' (~2e-5 rel err), 'default'
# (1-pass bf16, ~4e-3). Env GPSIG_MXU_PRECISION sets the process default;
# the public entry points also take an explicit ``mxu=`` argument.
import os as _os

_MXU_MODES = ("highest", "split", "default")


def _default_mxu():
    mode = _os.environ.get("GPSIG_MXU_PRECISION", "highest").lower()
    if mode not in _MXU_MODES:
        raise ValueError(
            f"GPSIG_MXU_PRECISION={mode!r}; expected one of {_MXU_MODES}"
        )
    return mode


def _mxu_dot(a, b, mode, data):
    """Matmul with one structural 0/±1 operand (exact in bfloat16).

    data: 'left'|'right' — which operand carries real values (the other is
    a 0/±1 matrix). Returns float32 (the MXU accumulates in f32 in every
    mode; callers .astype back to the kernel dtype)."""
    if mode == "split":
        # precision must be pinned to DEFAULT explicitly: these bf16 dots
        # can be traced inside config.precise_linalg's
        # default_matmul_precision("float32") context (the SVGP ELBO is),
        # and Mosaic rejects bf16 operands with an fp32 contract precision
        # ("Bad lhs type").
        dflt = jax.lax.Precision.DEFAULT
        v = a if data == "left" else b
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(v.dtype)).astype(jnp.bfloat16)
        if data == "left":
            s = b.astype(jnp.bfloat16)
            return jnp.dot(hi, s, preferred_element_type=jnp.float32,
                           precision=dflt) + (
                jnp.dot(lo, s, preferred_element_type=jnp.float32,
                        precision=dflt)
            )
        s = a.astype(jnp.bfloat16)
        return jnp.dot(s, hi, preferred_element_type=jnp.float32,
                       precision=dflt) + (
            jnp.dot(s, lo, preferred_element_type=jnp.float32,
                    precision=dflt)
        )
    prec = (
        jax.lax.Precision.HIGHEST
        if mode == "highest"
        else jax.lax.Precision.DEFAULT
    )
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _sl(Lp, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1)
    return (c < r).astype(dtype)


def _dmat(Lp, L, dtype):
    """Bidiagonal difference operator: (D·v)[i] = v[i+1] − v[i] for
    i < L−1, zero otherwise (Mosaic has no sublane shift/concat here, and a
    0/±1 matmul is exact)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1)
    up = (c == r + 1).astype(dtype)
    diag = (c == r).astype(dtype)
    mask = (r < L - 1).astype(dtype)
    return (up - diag) * mask


def _pipeline_enabled():
    """Software-pipelined column loop (GPSIG_FUSED_PIPELINE=1): issue the
    DP matmuls for column j, then build column j+2's base-kernel block
    (VPU) *before* consuming the matmul results, so the VPU floor and the
    MXU passes overlap instead of summing. Same math — the base-kernel
    build depends only on the raw sequences, never on the DP state."""
    return _os.environ.get("GPSIG_FUSED_PIPELINE", "0") == "1"


def _fused_kernel(x_ref, y_ref, out_ref, *, L, d, num_levels, rbf, bx,
                  sy, mxu, pipeline=False):
    """x_ref: [1, Lp, d·bx] (packed X block, rows pre-padded to Lp);
    y_ref: [L, d, sy·128]; out_ref: [bx, _LEVROWS, sy·128].

    ``sy`` y-lane-blocks are stacked along *sublanes* (rows h·Lp:(h+1)·Lp
    handle y-block h) with block-diagonal structural matrices: the DP
    matmuls become [sy·Lp, sy·Lp]·[sy·Lp, (nl-1)·W] so the MXU's M/K tiles
    fill toward 128 instead of idling at Lp≈56 — the kernel is
    pass-latency-bound, and sy=2 at L=50 nearly doubles useful work per
    pass (measured on-chip; see PERF.md)."""
    dt = x_ref.dtype
    Lp = x_ref.shape[1]
    W = bx * _LANE
    nl = num_levels
    Lq = sy * Lp

    # lane-group expansion of x channels: [L, bx] -> [Lp, bx·128] with
    # lane b·128+p holding x[i, b]. Built as a matmul with a 0/1 expansion
    # matrix (pltpu.repeat tiles rather than element-repeats; the matmul is
    # exact since every product is x·1 or x·0).
    er = jax.lax.broadcasted_iota(jnp.int32, (bx, W), 0)
    ec = jax.lax.broadcasted_iota(jnp.int32, (bx, W), 1)
    Eb = (ec // _LANE == er).astype(dt)
    xcols = []
    nx1 = jnp.zeros((Lp, W), dt)
    for dd in range(d):
        xs = x_ref[0, :, dd * bx : (dd + 1) * bx]  # [Lp, bx]
        xw = _mxu_dot(xs, Eb, mxu, "left").astype(dt)
        xcols.append(xw)
        nx1 = nx1 + xw * xw
    # row-stack the x data once so per-column work is a single [Lq, W] op
    xcols_s = [
        jnp.concatenate([xc] * sy, axis=0) if sy > 1 else xc
        for xc in xcols
    ]
    nxc1 = -0.5 * nx1  # [Lp, W], hoisted out of the column loop

    def kcol_stacked(jj):
        """Base-kernel columns for all sy y-blocks, stacked: [Lq, W].

        VPU-floor lever (VERDICT r2 #5): for RBF the wrapper packs
        −½·Σ_d y² as channel d of y_ref, so the column's activation is
        built by pure FMA accumulation, acc = −½nx −½ny + Σ_d x·y, with
        no per-column norm recomputation and zero combine ops before the
        exp — exp(acc) IS exp(−½‖x−y‖²)."""
        g_rows = []
        for h in range(sy):
            if rbf:
                cy = y_ref[jj, d : d + 1, h * _LANE : (h + 1) * _LANE]
                cyw = jnp.concatenate([cy] * bx, axis=1)  # [1, W]
                Gh = nxc1 + cyw
            else:
                Gh = jnp.zeros((Lp, W), dt)
            for dd in range(d):
                yv = y_ref[jj, dd : dd + 1, h * _LANE : (h + 1) * _LANE]
                yw = jnp.concatenate([yv] * bx, axis=1)  # [1, W]
                Gh = Gh + xcols[dd] * yw
            g_rows.append(Gh)
        G = g_rows[0] if sy == 1 else jnp.concatenate(g_rows, axis=0)
        return jnp.exp(G) if rbf else G

    SL = _sl_blk(Lp, sy, dt)
    Dm = _dmat_blk(Lp, L, sy, dt)
    K0 = kcol_stacked(0)
    C0 = jnp.zeros((Lq, max(nl - 1, 1) * W), dt)
    Snl0 = jnp.zeros((Lq, W), dt)

    # Level sums are read off the DP state afterwards: C's m-th block is
    # exactly Σ_j A_m[:, j] for m < nl (it is the running cumsum the DP
    # needs anyway), so the loop carries only ONE extra accumulator (level
    # nl) and does no per-column reductions or masked placements.
    def body(jj, carry):
        Kprev, C, Snl = carry
        Knext = kcol_stacked(jj + 1)
        colD = Knext - Kprev  # [Lq, W]
        Mcol = _mxu_dot(Dm, colD, mxu, "right").astype(dt)
        if nl >= 2:
            E = _mxu_dot(SL, C, mxu, "right").astype(dt)
        As = [Mcol]
        for m in range(2, nl + 1):
            As.append(Mcol * E[:, (m - 2) * W : (m - 1) * W])
        Snl = Snl + As[-1]
        if nl >= 2:
            C = C + jnp.concatenate(As[: nl - 1], axis=1)
        return Knext, C, Snl

    def bodyp(jj, carry):
        """Software-pipelined variant (see _pipeline_enabled): the carry
        holds columns j and j+1; the DP matmuls for increment column j are
        issued first and column j+2's base-kernel block is built while
        they run — its only inputs are the raw sequences, so the VPU work
        slots into the MXU shadow instead of serializing before it."""
        Kprev, Kcur, C, Snl = carry
        colD = Kcur - Kprev
        Mcol = _mxu_dot(Dm, colD, mxu, "right").astype(dt)
        if nl >= 2:
            E = _mxu_dot(SL, C, mxu, "right").astype(dt)
        Knext = kcol_stacked(jnp.minimum(jj + 2, L - 1))
        As = [Mcol]
        for m in range(2, nl + 1):
            As.append(Mcol * E[:, (m - 2) * W : (m - 1) * W])
        Snl = Snl + As[-1]
        if nl >= 2:
            C = C + jnp.concatenate(As[: nl - 1], axis=1)
        return Kcur, Knext, C, Snl

    # manual 2× unroll (Mosaic's fori_loop supports only unroll∈{1, all}):
    # the second column's base-kernel build (VPU) is independent of the
    # first column's DP matmul (MXU), giving the scheduler overlap room.
    def body2(jj2, carry):
        carry = body(2 * jj2, carry)
        return body(2 * jj2 + 1, carry)

    def bodyp2(jj2, carry):
        carry = bodyp(2 * jj2, carry)
        return bodyp(2 * jj2 + 1, carry)

    if pipeline:
        K1 = kcol_stacked(1) if L >= 2 else K0
        carry = jax.lax.fori_loop(0, (L - 1) // 2, bodyp2,
                                  (K0, K1, C0, Snl0))
        if (L - 1) % 2:
            carry = bodyp(L - 2, carry)
        _, _, C, Snl = carry
    else:
        carry = jax.lax.fori_loop(0, (L - 1) // 2, body2, (K0, C0, Snl0))
        if (L - 1) % 2:
            carry = body(L - 2, carry)
        _, C, Snl = carry

    def halfsums(A):
        """Row sums per sy-half: [Lq, W] -> [1, sy·W]."""
        if sy == 1:
            return jnp.sum(A, axis=0, keepdims=True)
        return jnp.concatenate(
            [
                jnp.sum(A[h * Lp : (h + 1) * Lp], axis=0, keepdims=True)
                for h in range(sy)
            ],
            axis=1,
        )

    levrow = jax.lax.broadcasted_iota(jnp.int32, (_LEVROWS, sy * W), 0)
    acc = jnp.where(levrow == 0, jnp.asarray(1.0, dt), 0.0)
    for m in range(1, nl):
        acc = acc + jnp.where(
            levrow == m, halfsums(C[:, (m - 1) * W : m * W]), 0.0
        )
    acc = acc + jnp.where(levrow == nl, halfsums(Snl), 0.0)
    # acc lanes: [half h][bx block b][lane p] -> out lanes [b][h][p]
    for b in range(bx):
        out_ref[b] = jnp.concatenate(
            [
                acc[:, h * W + b * _LANE : h * W + (b + 1) * _LANE]
                for h in range(sy)
            ],
            axis=1,
        )


def _sl_blk(Lp, sy, dtype):
    """Block-diagonal stack of sy strictly-lower-triangular ones blocks,
    built directly from iota (Mosaic has no dynamic_update_slice)."""
    n = sy * Lp
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    same = (r // Lp) == (c // Lp)
    return (same & ((c % Lp) < (r % Lp))).astype(dtype)


def _dmat_blk(Lp, L, sy, dtype):
    """Block-diagonal stack of sy difference operators (see _dmat)."""
    n = sy * Lp
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    same = (r // Lp) == (c // Lp)
    ri, ci = r % Lp, c % Lp
    up = (same & (ci == ri + 1)).astype(dtype)
    diag = (same & (ci == ri)).astype(dtype)
    mask = (ri < L - 1).astype(dtype)
    return (up - diag) * mask


def _diag_kernel(xt_ref, out_ref, *, L, d, num_levels, rbf, mxu):
    """Self-pair variant: both sides per-lane. xt_ref: [Lp, d(+1 for
    RBF), 128] (rows pre-padded to Lp; for RBF the wrapper packs −½Σx²
    as channel d — see kcol_stacked's VPU-floor note)."""
    dt = xt_ref.dtype
    Lp = xt_ref.shape[0]
    xcols = [xt_ref[:, dd, :] for dd in range(d)]  # [Lp, 128] each
    nxc = xt_ref[:, d, :] if rbf else None  # −½Σx², packed

    def kcol_diag(jj):
        if rbf:
            G = nxc + xt_ref[jj, d : d + 1, :]
        else:
            G = jnp.zeros((Lp, _LANE), dt)
        for dd in range(d):
            G = G + xcols[dd] * xt_ref[jj, dd : dd + 1, :]
        return jnp.exp(G) if rbf else G

    SL = _sl(Lp, dt)
    Dm = _dmat(Lp, L, dt)
    K0 = kcol_diag(0)
    C0 = jnp.zeros((Lp, max(num_levels - 1, 1) * _LANE), dt)
    acc0 = jnp.zeros((_LEVROWS, _LANE), dt)

    def body(jj, carry):
        Kprev, C, acc = carry
        Knext = kcol_diag(jj + 1)
        colD = Knext - Kprev
        Mcol = _mxu_dot(Dm, colD, mxu, "right").astype(dt)
        nl = num_levels
        if nl >= 2:
            E = _mxu_dot(SL, C, mxu, "right").astype(dt)
        levrow = jax.lax.broadcasted_iota(jnp.int32, (_LEVROWS, _LANE), 0)
        As = [Mcol]
        for m in range(2, nl + 1):
            As.append(Mcol * E[:, (m - 2) * _LANE : (m - 1) * _LANE])
        for m, A in enumerate(As, start=1):
            acc = acc + jnp.where(
                levrow == m, jnp.sum(A, axis=0, keepdims=True), 0.0
            )
        if nl >= 2:
            C = C + jnp.concatenate(As[: nl - 1], axis=1)
        return Knext, C, acc

    _, _, acc = jax.lax.fori_loop(0, L - 1, body, (K0, C0, acc0))
    levrow = jax.lax.broadcasted_iota(jnp.int32, (_LEVROWS, _LANE), 0)
    acc = acc + jnp.where(levrow == 0, jnp.asarray(1.0, dt), 0.0)
    out_ref[0] = acc


def _xla_reference(X, Y, num_levels, rbf):
    """Mathematically identical XLA path (also the VJP route).

    The squared distance is deliberately *unclamped* (no max(·, 0)) to match
    the fused forward kernel exactly — the custom VJP must differentiate the
    same function the forward computes (see tens_seq._xla_reference_tens_seq
    for the full rationale)."""
    N1, L, d = X.shape
    N2 = Y.shape[0]
    a = X.reshape(N1 * L, d)
    b = Y.reshape(N2 * L, d)
    if rbf:
        na = jnp.sum(a * a, -1)
        nb = jnp.sum(b * b, -1)
        G = jnp.exp(
            -0.5
            * (na[:, None] + nb[None, :]
               - 2.0 * jnp.matmul(a, b.T, precision='highest'))
        )
    else:
        G = jnp.matmul(a, b.T, precision='highest')
    G = G.reshape(N1, L, N2, L).transpose(0, 2, 1, 3)
    M = sigops.incremental_gram(G)
    return sigops.signature_kern(M, num_levels, order=1)


def _xla_reference_diag(X, num_levels, rbf):
    N, L, d = X.shape
    if rbf:
        # unclamped, matching the fused diag forward (see _xla_reference)
        n = jnp.sum(X * X, -1)
        G = jnp.exp(
            -0.5
            * (n[:, :, None] + n[:, None, :]
               - 2.0 * jnp.einsum("nld,nkd->nlk", X, X,
                                  precision="highest"))
        )
    else:
        G = jnp.einsum("nld,nkd->nlk", X, X, precision="highest")
    M = sigops.incremental_gram(G)
    return sigops.signature_kern(M, num_levels, order=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def fused_gram_levels(X, Y, num_levels, rbf=True, interpret=False, bx=8,
                      mxu=None, pipeline=None):
    """[nl+1, N1, N2] per-level signature kernels, fully fused.

    X: [N1, L, d], Y: [N2, L, d] — pre-scaled sequences (order 1,
    difference=True semantics). num_levels <= 7. ``bx`` = x-sequences per
    grid step (wider MXU matmuls; VMEM budget ~ bx·(nl-1)·128·L·4B).
    ``mxu``: 'highest' | 'split' | 'default' in-kernel matmul mode (None →
    env GPSIG_MXU_PRECISION, default 'highest'); see module docstring.
    ``pipeline``: force the software-pipelined column loop on (True) or
    off (False); None reads GPSIG_FUSED_PIPELINE **at trace time** — a
    jit-cached trace keeps whatever value the env var had when it was
    first compiled, so flipping the env var later has no effect on cached
    entry points (pass the kwarg explicitly to control it per call)."""
    return _fused_fwd_impl(X, Y, num_levels, rbf, interpret, bx, mxu,
                           pipeline=pipeline)


def _fused_fwd_impl(X, Y, num_levels, rbf, interpret, bx=8, mxu=None,
                    pipeline=None):
    if mxu is None:
        mxu = _default_mxu()
    if pipeline is None:
        pipeline = _pipeline_enabled()
    if num_levels + 1 > _LEVROWS:
        raise ValueError("fused kernel supports num_levels <= 7")
    N1, L, d = X.shape
    N2 = Y.shape[0]
    Lp = _round_up(L, 8)
    # sy y-blocks stacked along sublanes so the [sy·Lp, sy·Lp] structural
    # matmuls fill the MXU's M/K tiles (the kernel is pass-latency-bound)
    sy = max(1, min(_LANE // Lp, -(-N2 // _LANE)))
    N1p = _round_up(N1, bx)
    N2p = _round_up(N2, sy * _LANE)
    Xp = jnp.pad(X, ((0, N1p - N1), (0, Lp - L), (0, 0)))
    # pack: [nblk, bx, Lp, d] -> [nblk, Lp, d, bx] -> [nblk, Lp, d*bx]
    Xpk = Xp.reshape(N1p // bx, bx, Lp, d).transpose(0, 2, 3, 1).reshape(
        N1p // bx, Lp, d * bx
    )
    Yt = jnp.moveaxis(Y, 0, -1)  # [L, d, N2]
    dy = d
    if rbf:
        # pack −½Σ_d y² as an extra channel: the kernel's column build is
        # then pure FMA accumulation (see _fused_kernel.kcol_stacked)
        cy = -0.5 * jnp.sum(Y * Y, -1).T[:, None, :]  # [L, 1, N2]
        Yt = jnp.concatenate([Yt, cy.astype(Y.dtype)], axis=1)
        dy = d + 1
    if N2p != N2:
        Yt = jnp.pad(Yt, ((0, 0), (0, 0), (0, N2p - N2)))
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, L=L, d=d, num_levels=num_levels, rbf=rbf, bx=bx,
            sy=sy, mxu=mxu, pipeline=pipeline,
        ),
        grid=(N1p // bx, N2p // (sy * _LANE)),
        in_specs=[
            pl.BlockSpec((1, Lp, d * bx), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, dy, sy * _LANE), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bx, _LEVROWS, sy * _LANE),
                               lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N1p, _LEVROWS, N2p), X.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N1p * N2p * L * _round_up(L, 8) ** 2
            * max(num_levels - 1, 1),
            bytes_accessed=4 * (N1p * L * d + L * dy * N2p
                                + N1p * _LEVROWS * N2p),
            transcendentals=N1p * N2p * L * L if rbf else 0,
        ),
    )(Xpk, Yt)
    return jnp.moveaxis(out[:N1, : num_levels + 1, :N2], 1, 0)


def _fused_vjp_fwd(X, Y, num_levels, rbf, interpret, bx, mxu,
                   pipeline):
    return (
        _fused_fwd_impl(X, Y, num_levels, rbf, interpret, bx, mxu,
                        pipeline=pipeline),
        (X, Y),
    )


_BWD_ROW_BLOCK = 64


def _fused_vjp_bwd(num_levels, rbf, interpret, bx, mxu, pipeline, res,
                   g):
    del pipeline  # forward-only scheduling variant; adjoint is unaffected
    """Backward: fully-fused reverse-sweep Pallas kernel on TPU backends;
    row-blocked XLA recompute elsewhere (the [N1, N2, L, L] intermediates
    would need 51 GB HBM at N=800 unblocked)."""
    X, Y = res
    if not interpret and jax.default_backend() not in ("cpu",):
        return fused_gram_levels_bwd_pallas(
            X, Y, g, num_levels, rbf, interpret, bx, mxu
        )
    N1 = X.shape[0]
    rb = _BWD_ROW_BLOCK
    if N1 <= rb:
        _, vjp = jax.vjp(
            lambda x, y: _xla_reference(x, y, num_levels, rbf), X, Y
        )
        return vjp(g)

    pad = (-N1) % rb
    Xp = jnp.concatenate([X, jnp.zeros((pad,) + X.shape[1:], X.dtype)])
    gp = jnp.concatenate(
        [g, jnp.zeros(g.shape[:1] + (pad,) + g.shape[2:], g.dtype)], axis=1
    )
    xblocks = Xp.reshape(-1, rb, *X.shape[1:])
    gblocks = jnp.moveaxis(
        gp.reshape(g.shape[0], -1, rb, g.shape[2]), 1, 0
    )  # [nblk, nl+1, rb, N2]

    def block_vjp(args):
        xb, gb = args
        _, vjp = jax.vjp(
            lambda x, y: _xla_reference(x, y, num_levels, rbf), xb, Y
        )
        return vjp(gb)

    xbar_blocks, ybar_blocks = jax.lax.map(block_vjp, (xblocks, gblocks))
    xbar = xbar_blocks.reshape(-1, *X.shape[1:])[:N1]
    return xbar, jnp.sum(ybar_blocks, axis=0)


fused_gram_levels.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_diag_levels(X, num_levels, rbf=True, interpret=False, mxu=None):
    """[nl+1, N] per-level self kernels k_m(x_n, x_n), fully fused."""
    return _fused_diag_impl(X, num_levels, rbf, interpret, mxu)


def _fused_diag_impl(X, num_levels, rbf, interpret, mxu=None):
    if mxu is None:
        mxu = _default_mxu()
    if num_levels + 1 > _LEVROWS:
        raise ValueError("fused kernel supports num_levels <= 7")
    N, L, d = X.shape
    Lp = _round_up(L, 8)
    Np = _round_up(N, _LANE)
    Xt = jnp.moveaxis(X, 0, -1)  # [L, d, N]
    dx = d
    if rbf:
        cx = -0.5 * jnp.sum(X * X, -1).T[:, None, :]  # [L, 1, N]
        Xt = jnp.concatenate([Xt, cx.astype(X.dtype)], axis=1)
        dx = d + 1
    Xt = jnp.pad(Xt, ((0, Lp - L), (0, 0), (0, Np - N)))
    out = pl.pallas_call(
        functools.partial(
            _diag_kernel, L=L, d=d, num_levels=num_levels, rbf=rbf, mxu=mxu
        ),
        grid=(Np // _LANE,),
        in_specs=[
            pl.BlockSpec((Lp, dx, _LANE), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _LEVROWS, _LANE), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np // _LANE, _LEVROWS, _LANE),
                                       X.dtype),
        interpret=interpret,
    )(Xt)
    out = out.transpose(1, 0, 2).reshape(_LEVROWS, Np)
    return out[: num_levels + 1, :N]


def _diag_vjp_fwd(X, num_levels, rbf, interpret, mxu):
    return _fused_diag_impl(X, num_levels, rbf, interpret, mxu), X


def _diag_vjp_bwd(num_levels, rbf, interpret, mxu, X, g):
    _, vjp = jax.vjp(
        lambda x: _xla_reference_diag(x, num_levels, rbf), X
    )
    return vjp(g)


fused_diag_levels.defvjp(_diag_vjp_fwd, _diag_vjp_bwd)


# ---------------------------------------------------------------------------
# Fully-fused backward: reverse column sweep (adjoint of the forward DP).
#
# Derivation. Forward: A_1[:,j] = M[:,j];  A_m[:,j] = M[:,j] ⊙ (SL·CC_{m-1,j})
# with CC_{m,j} = Σ_{j'<j} A_m[:,j'];  k_m = Σ A_m. For cotangents w_m:
#
#   Ā_m[:,j] = w_m + R_m(j),  R_m(j) = Σ_{j'>j} SLᵀ·(M[:,j'] ⊙ Ā_{m+1}[:,j'])
#   M̄[:,j]  = Ā_1[:,j] + Σ_{m≥2} Ā_m[:,j] ⊙ (SL·CC_{m-1,j})
#
# The forward states CC are reconstructed EXACTLY while sweeping j downward
# (CC_{m,j} = CC_{m,j+1} − A_m[:,j], resolvable in ascending m), so nothing
# O(L) per pair is ever stored: one forward recompute to get the end states,
# then one reverse sweep — ~3× forward cost, all in VMEM. M̄ chains back
# through the bidiagonal difference (Dᵀ), the base-kernel column (exp for
# RBF) and the d-loop FMAs to X̄ and Ȳ. Partial X̄/Ȳ per grid step are
# reduced over the opposing grid axis outside the kernel (grid revisits
# along a non-innermost axis cannot accumulate in-place on TPU).
# ---------------------------------------------------------------------------


def _bwd_fused_kernel(x_ref, y_ref, g_ref, xb_ref, yb_ref, yscr,
                      *, L, d, num_levels, rbf, bx, sy, mxu):
    """x_ref [1, Lp, d·bx]; y_ref [L, d(+1 for RBF), sy·128] (the wrapper
    packs −½Σy² as channel d); g_ref [bx, _LEVROWS, sy·128] (cotangents of
    the level sums); outputs: xb_ref [1, 1, Lp, d·bx] (X̄ partial for this
    y-block group), yb_ref [1, 1, L, d·sy·128] (Ȳ partial for this
    x-block); yscr: VMEM scratch [L, d·sy·128].

    Same sy sublane-stacking as the forward (``_fused_kernel``): sy y-lane
    blocks occupy rows h·Lp:(h+1)·Lp with block-diagonal structural
    matrices, so every DP matmul of the reverse sweep is [sy·Lp, sy·Lp] ·
    [sy·Lp, ·] — the MXU's M/K tiles fill toward 128 in the backward too.
    X̄ partials accumulate per stacked row block and are folded over h with
    exact VPU adds at the end."""
    dt = x_ref.dtype
    Lp = x_ref.shape[1]
    W = bx * _LANE
    nl = num_levels
    Lq = sy * Lp

    er = jax.lax.broadcasted_iota(jnp.int32, (bx, W), 0)
    ec = jax.lax.broadcasted_iota(jnp.int32, (bx, W), 1)
    Eb = (ec // _LANE == er).astype(dt)
    xcols = []
    nx1 = jnp.zeros((Lp, W), dt)
    for dd in range(d):
        xs = x_ref[0, :, dd * bx : (dd + 1) * bx]
        xw = _mxu_dot(xs, Eb, mxu, "left").astype(dt)
        xcols.append(xw)
        nx1 = nx1 + xw * xw
    xcols_s = [
        jnp.concatenate([xc] * sy, axis=0) if sy > 1 else xc
        for xc in xcols
    ]
    nxc = (
        jnp.concatenate([-0.5 * nx1] * sy, axis=0) if sy > 1
        else -0.5 * nx1
    )
    SL = _sl_blk(Lp, sy, dt)
    Dm = _dmat_blk(Lp, L, sy, dt)

    def kcol(jj):
        """Stacked base-kernel column [Lq, W] + per-channel y rows.

        yws[dd] is materialised at [Lq, W] (row block h broadcasts y-block
        h's values) because the reverse chain multiplies it elementwise
        against stacked [Lq, W] cotangents. RBF columns use the packed
        −½Σy² channel (pure FMA accumulation, see the forward kernel)."""
        yws = []
        if rbf:
            rows = []
            for h in range(sy):
                cyv = y_ref[jj, d : d + 1, h * _LANE : (h + 1) * _LANE]
                rows.append(jnp.concatenate([cyv] * bx, axis=1))
            cyw = (
                jnp.concatenate(
                    [jnp.broadcast_to(r, (Lp, W)) for r in rows], axis=0
                )
                if sy > 1 else jnp.broadcast_to(rows[0], (Lp, W))
            )
            G = nxc + cyw
        else:
            G = jnp.zeros((Lq, W), dt)
        for dd in range(d):
            rows = []
            for h in range(sy):
                yv = y_ref[jj, dd : dd + 1, h * _LANE : (h + 1) * _LANE]
                yw = jnp.concatenate([yv] * bx, axis=1)  # [1, W]
                rows.append(jnp.broadcast_to(yw, (Lp, W)))
            ywf = rows[0] if sy == 1 else jnp.concatenate(rows, axis=0)
            yws.append(ywf)
            G = G + xcols_s[dd] * ywf
        if rbf:
            return jnp.exp(G), yws
        return G, yws

    # cotangent blocks w_m: [Lq, W] per level (row block h carries the
    # cotangents of this grid step's h-th y lane block)
    wvecs = []
    for m in range(1, nl + 1):
        rows = []
        for h in range(sy):
            pieces = [
                g_ref[b, m : m + 1, h * _LANE : (h + 1) * _LANE]
                for b in range(bx)
            ]
            wrow = jnp.concatenate(pieces, axis=1)  # [1, W]
            rows.append(jnp.broadcast_to(wrow, (Lp, W)))
        wvecs.append(
            rows[0] if sy == 1 else jnp.concatenate(rows, axis=0)
        )

    # ---- phase 1: forward recompute of the end states CC_m(L-1) ----------
    K0, _ = kcol(0)
    C0 = jnp.zeros((Lq, max(nl - 1, 1) * W), dt)

    def fwd_body(jj, carry):
        Kprev, C = carry
        Knext, _ = kcol(jj + 1)
        Mcol = _mxu_dot(Dm, Knext - Kprev, mxu, "right").astype(dt)
        if nl >= 2:
            E = _mxu_dot(SL, C, mxu, "right").astype(dt)
            As = [Mcol] + [
                Mcol * E[:, (m - 2) * W : (m - 1) * W]
                for m in range(2, nl + 1)
            ]
            C = C + jnp.concatenate(As[: nl - 1], axis=1)
        return Knext, C

    _, CCend = jax.lax.fori_loop(0, L - 1, fwd_body, (K0, C0))

    # ---- phase 2: reverse sweep -------------------------------------------
    def chain_column(c_idx, Kbar, Kc, yws, xbar_acc, nxbar):
        """Backprop one base-kernel column's cotangent to X̄/Ȳ; writes the
        Ȳ row into yscr and returns updated (xbar_acc, nxbar)."""
        if rbf:
            ubar = Kbar * Kc
            Gbar = ubar
            nxbar = nxbar - 0.5 * ubar
            # per-row-block ny cotangents: [1, W] for each stacked block h
            nybars = [
                -0.5 * jnp.sum(
                    ubar[h * Lp : (h + 1) * Lp], axis=0, keepdims=True
                )
                for h in range(sy)
            ]
        else:
            Gbar = Kbar
            nybars = None
        yrow_parts = []
        new_xbar = []
        for dd in range(d):
            xb = xbar_acc[:, dd * W : (dd + 1) * W] + Gbar * yws[dd]
            new_xbar.append(xb)
            GX = Gbar * xcols_s[dd]
            for h in range(sy):
                yb = jnp.sum(
                    GX[h * Lp : (h + 1) * Lp], axis=0, keepdims=True
                )
                if rbf:
                    yb = yb + 2.0 * yws[dd][h * Lp : h * Lp + 1] * nybars[h]
                # reduce lane groups: [1, W] -> [1, 128]
                red = yb[:, :_LANE]
                for b in range(1, bx):
                    red = red + yb[:, b * _LANE : (b + 1) * _LANE]
                yrow_parts.append(red)
        yscr[pl.ds(c_idx, 1), :] = jnp.concatenate(yrow_parts, axis=1)
        return jnp.concatenate(new_xbar, axis=1), nxbar

    Kend, yws_end = kcol(L - 1)

    def rev_body(t, carry):
        (K_hi, yws_hi, CC, R, colDbar_prev, xbar_acc, nxbar) = carry
        jj = L - 2 - t
        K_lo, yws_lo = kcol(jj)
        Mcol = _mxu_dot(Dm, K_hi - K_lo, mxu, "right").astype(dt)
        # reconstruct CC_m(jj) and E_m = SL·CC_{m-1}(jj), ascending m
        As = [Mcol]
        Es = []
        CC_new = []
        for m in range(1, nl):
            CCm = CC[:, (m - 1) * W : m * W] - As[m - 1]
            CC_new.append(CCm)
            E = _mxu_dot(SL, CCm, mxu, "right").astype(dt)
            Es.append(E)
            As.append(Mcol * E)
        CC = (jnp.concatenate(CC_new, axis=1) if nl >= 2
              else CC)
        # cotangents of A_m at this column
        Abars = []
        for m in range(1, nl + 1):
            ab = wvecs[m - 1]
            if m <= nl - 1:
                ab = ab + R[:, (m - 1) * W : m * W]
            Abars.append(ab)
        Mbar = Abars[0]
        for m in range(2, nl + 1):
            Mbar = Mbar + Abars[m - 1] * Es[m - 2]
        # R_m += SLᵀ·(M ⊙ Ā_{m+1}), batched over m = 1..nl-1
        if nl >= 2:
            inner = jnp.concatenate(
                [Mcol * Abars[m] for m in range(1, nl)], axis=1
            )
            R = R + _mxu_dot(SL.T, inner, mxu, "right").astype(dt)
        colDbar = _mxu_dot(Dm.T, Mbar, mxu, "right").astype(dt)
        Kbar_hi = colDbar - colDbar_prev
        xbar_acc, nxbar = chain_column(
            jj + 1, Kbar_hi, K_hi, yws_hi, xbar_acc, nxbar
        )
        return (K_lo, yws_lo, CC, R, colDbar, xbar_acc, nxbar)

    xbar0 = jnp.zeros((Lq, d * W), dt)
    nxbar0 = jnp.zeros((Lq, W), dt)
    R0 = jnp.zeros((Lq, max(nl - 1, 1) * W), dt)
    colD0 = jnp.zeros((Lq, W), dt)
    (K_last, yws_last, _, _, colDbar_last, xbar_acc, nxbar) = (
        jax.lax.fori_loop(
            0, L - 1, rev_body,
            (Kend, yws_end, CCend, R0, colD0, xbar0, nxbar0),
        )
    )
    # column c = 0: K̄(0) = −colD̄(0)
    xbar_acc, nxbar = chain_column(
        0, -colDbar_last, K_last, yws_last, xbar_acc, nxbar
    )

    def fold(A):
        """Exact fold of the sy stacked row blocks: [Lq, W] -> [Lp, W]."""
        out = A[:Lp]
        for h in range(1, sy):
            out = out + A[h * Lp : (h + 1) * Lp]
        return out

    # nx chain: x̄w_dd += 2 xw_dd ⊙ nx̄ ; fold row blocks, then reduce lane
    # groups via Ebᵀ
    for dd in range(d):
        xb = xbar_acc[:, dd * W : (dd + 1) * W]
        if rbf:
            xb = xb + 2.0 * xcols_s[dd] * nxbar
        xred = _mxu_dot(fold(xb), Eb.T, mxu, "left").astype(dt)  # [Lp, bx]
        xb_ref[0, 0, :, dd * bx : (dd + 1) * bx] = xred
    yb_ref[0, 0] = yscr[...]


def fused_gram_levels_bwd_pallas(X, Y, g, num_levels, rbf=True,
                                 interpret=False, bx=8, mxu=None):
    """Fully-fused backward: (X̄, Ȳ) from level-sum cotangents g
    [nl+1, N1, N2]. Same tiling (incl. sy sublane-stacking) as the
    forward."""
    if mxu is None:
        mxu = _default_mxu()
    N1, L, d = X.shape
    N2 = Y.shape[0]
    Lp = _round_up(L, 8)
    sy = max(1, min(_LANE // Lp, -(-N2 // _LANE)))
    N1p = _round_up(N1, bx)
    N2p = _round_up(N2, sy * _LANE)
    Xp = jnp.pad(X, ((0, N1p - N1), (0, Lp - L), (0, 0)))
    Xpk = Xp.reshape(N1p // bx, bx, Lp, d).transpose(0, 2, 3, 1).reshape(
        N1p // bx, Lp, d * bx
    )
    Yt = jnp.moveaxis(Y, 0, -1)
    dy = d
    if rbf:
        cy = -0.5 * jnp.sum(Y * Y, -1).T[:, None, :]  # [L, 1, N2]
        Yt = jnp.concatenate([Yt, cy.astype(Y.dtype)], axis=1)
        dy = d + 1
    Yt = jnp.pad(Yt, ((0, 0), (0, 0), (0, N2p - N2)))
    gp = jnp.zeros((N1p, _LEVROWS, N2p), X.dtype)
    gp = gp.at[:N1, : num_levels + 1, :N2].set(
        jnp.moveaxis(g, 0, 1).astype(X.dtype)
    )
    nbi, nbj = N1p // bx, N2p // (sy * _LANE)
    xb, yb = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, L=L, d=d, num_levels=num_levels, rbf=rbf,
            bx=bx, sy=sy, mxu=mxu,
        ),
        grid=(nbi, nbj),
        in_specs=[
            pl.BlockSpec((1, Lp, d * bx), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, dy, sy * _LANE), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bx, _LEVROWS, sy * _LANE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Lp, d * bx), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, d * sy * _LANE), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nbj, nbi, Lp, d * bx), X.dtype),
            jax.ShapeDtypeStruct((nbi, nbj, L, d * sy * _LANE), X.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((L, d * sy * _LANE), X.dtype)],
        interpret=interpret,
    )(Xpk, Yt, gp)
    # X̄: sum partials over y-blocks, unpack [nbi, Lp, d, bx] layout
    xbar = jnp.sum(xb, axis=0).reshape(nbi, Lp, d, bx)
    xbar = xbar.transpose(0, 3, 1, 2).reshape(N1p, Lp, d)[:N1, :L]
    # Ȳ: sum partials over x-blocks; yscr lanes are [dd][h][p] so the
    # y index of lane (dd, h, p) in block j is j·sy·128 + h·128 + p
    ybar = jnp.sum(yb, axis=0).reshape(nbj, L, d, sy, _LANE)
    ybar = ybar.transpose(0, 3, 4, 1, 2).reshape(N2p, L, d)[:N2]
    return xbar, ybar
