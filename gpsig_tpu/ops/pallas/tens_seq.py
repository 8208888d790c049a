"""Fused inducing-tensor-vs-sequence Pallas kernel: base kernel +
increment/sequence differencing + the per-level 1-D DP in one VMEM pass.

This is the SVGP *training* hot loop (reference:
``gpsig/kernels.py::SignatureKernel.K_tens_vs_seq`` →
``signature_algs.signature_kern_tens_vs_seq`` — SURVEY.md §3.1): every ELBO
step evaluates Kuf[z, x] = ⟨z^{(m)}, S_m(x)⟩ for M≈500 inducing tensors
against a minibatch. The XLA path materialises the [T, N, F, L] base-kernel
tensor in HBM and runs Σ_m (m−1) cumsum+multiply passes over it; this
kernel streams everything through VMEM instead.

Layout (flagship shape M≈500, B≈50, L≈50, levels 4–5):

- **lanes = inducing tensors** (T pads to a multiple of 128 — full lanes at
  M=500, the reference's benchmark scale), grid = (T/128, N): one sequence
  against a 128-tensor block per step.
- Per step: the base-kernel slab K[f, i, t] for all F factor rows is built
  by d broadcast-FMAs per factor ([Lp, 1] x-channel × [1, 128] z-row — VPU
  work, exact f32), pair-differenced (``increments``), then differenced
  along the sequence axis as ONE [Lp, Lp]·[Lp, F·128] structural-bidiagonal
  MXU matmul.
- The level-m DP E ← U_{m,a} ⊙ ecumsum(E) runs all levels batched along
  lanes (E: [Lp, nl·128]): each of the nl−1 steps is one strictly-lower-
  triangular [Lp, Lp]·[Lp, nl·128] MXU matmul plus a masked elementwise
  update — finished levels (m ≤ a) are frozen by a lane-block mask.
- HBM traffic: Z + X + [N, levels, T] out; nothing O(T·N·F·L) is ever
  materialised.

Backward: a fully-fused VMEM adjoint on TPU backends
(``tens_seq_bwd_pallas``): the per-step slab set [Lp, F·128] is small
enough that ALL forward DP stages are recomputed and held in VMEM, so the
reverse pass is exact with no O(T·N·F·L) HBM intermediate — Z̄ accumulates
in-place across the innermost (sequence) grid axis and X̄ partials reduce
over the few tensor blocks outside. The XLA recompute route remains the
CPU fallback (at the training shape its [T, N, F, L] intermediate is
~75 MB — fine; at prediction-scale N it would hit the HBM wall the fused
path avoids).

Supports order=1, difference=True (the reference benchmarks' setting) —
the speed-tuned path; every other fused-able configuration takes the
general engine in ``tens_seq_general.py`` (see kernels/signature.py
docstring, "Engine coverage").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpsig_tpu.ops import signature as sigops
from gpsig_tpu.ops.pallas.fused_gram import (
    _LANE,
    _LEVROWS,
    _default_mxu,
    _dmat,
    _mxu_dot,
    _round_up,
    _sl,
)


def _tens_seq_kernel(z_ref, x_ref, out_ref, *, L, d, num_levels, rbf,
                     increments, mxu):
    """z_ref: [F2, d(+1 for RBF), 128] (factor-major tensor lanes; for RBF
    the wrapper packs −½Σz² as channel d); x_ref: [1, Lp, d] (one
    sequence, rows pre-padded); out_ref: [1, _LEVROWS, 128]."""
    dt = x_ref.dtype
    Lp = x_ref.shape[1]
    nl = num_levels
    F = nl * (nl + 1) // 2
    F2 = z_ref.shape[0]

    # x channel columns broadcast across the 128 tensor lanes
    xcols = []
    nx = jnp.zeros((Lp, _LANE), dt)
    for dd in range(d):
        xc = jnp.broadcast_to(x_ref[0, :, dd : dd + 1], (Lp, _LANE))
        xcols.append(xc)
        nx = nx + xc * xc
    nxc = -0.5 * nx if rbf else None  # hoisted out of the factor loop

    def kblock(f):
        """Base-kernel slab for factor row f: [Lp, 128] — pure FMA
        accumulation for RBF (−½nx −½nz + Σ x·z, then one exp)."""
        if rbf:
            G = nxc + z_ref[f, d : d + 1, :]
        else:
            G = jnp.zeros((Lp, _LANE), dt)
        for dd in range(d):
            G = G + xcols[dd] * z_ref[f, dd : dd + 1, :]
        return jnp.exp(G) if rbf else G

    # raw factor slabs, pair-differenced when factors are RKHS increments
    if increments:
        slabs = [kblock(2 * f + 1) - kblock(2 * f) for f in range(F)]
    else:
        slabs = [kblock(f) for f in range(F)]

    # difference along the sequence axis: one structural-bidiagonal matmul
    # over all factor rows at once (also zeroes the padded rows i >= L-1)
    Dm = _dmat(Lp, L, dt)
    U = _mxu_dot(Dm, jnp.concatenate(slabs, axis=1), mxu, "right").astype(dt)

    def ublock(f):
        return U[:, f * _LANE : (f + 1) * _LANE]

    # level-major DP, all levels batched along lanes. Level m (1-based)
    # occupies lane block m-1; its factor rows start at off_m = m(m-1)/2.
    off = [m * (m - 1) // 2 for m in range(1, nl + 1)]
    E = jnp.concatenate([ublock(off[m - 1]) for m in range(1, nl + 1)],
                        axis=1)  # [Lp, nl*128]
    SL = _sl(Lp, dt)
    blk = jax.lax.broadcasted_iota(jnp.int32, (Lp, nl * _LANE), 1) // _LANE
    for a in range(1, nl):
        Ecum = _mxu_dot(SL, E, mxu, "right").astype(dt)
        Ua = jnp.concatenate(
            [
                ublock(off[m - 1] + a) if m > a else ublock(off[m - 1])
                for m in range(1, nl + 1)
            ],
            axis=1,
        )
        E = jnp.where(blk >= a, Ua * Ecum, E)

    # per-level sums -> output rows (level 0 is the constant 1)
    levrow = jax.lax.broadcasted_iota(jnp.int32, (_LEVROWS, _LANE), 0)
    acc = jnp.where(levrow == 0, jnp.asarray(1.0, dt), 0.0)
    for m in range(1, nl + 1):
        km = jnp.sum(E[:, (m - 1) * _LANE : m * _LANE], axis=0,
                     keepdims=True)
        acc = acc + jnp.where(levrow == m, km, 0.0)
    out_ref[0] = acc


def _xla_reference_tens_seq(Z, X, num_levels, rbf, increments):
    """Mathematically identical XLA path (also the VJP route). Z, X are
    pre-scaled; mirrors kernels/signature.py::K_tens_vs_seq with order=1,
    difference=True."""
    T, F = Z.shape[0], Z.shape[1]
    N, L, d = X.shape
    z2 = Z.reshape(-1, d)
    x2 = X.reshape(-1, d)
    if rbf:
        nz = jnp.sum(z2 * z2, -1)
        nx = jnp.sum(x2 * x2, -1)
        # NB: deliberately *unclamped* squared distance — the fused Pallas
        # forward computes exp(-(nx+nz-2G)/2) with no max(·, 0), and this
        # function is its custom-VJP recompute route, so both must be the
        # same function (the clamp only differs at exactly-duplicated
        # points, where it would also zero the lengthscale gradient).
        G = jnp.exp(
            -0.5
            * (
                nz[:, None]
                + nx[None, :]
                - 2.0 * jnp.matmul(z2, x2.T, precision="highest")
            )
        )
    else:
        G = jnp.matmul(z2, x2.T, precision="highest")
    if increments:
        G = G.reshape(T, F, 2, N, L)
        G = G[:, :, 1] - G[:, :, 0]
    else:
        G = G.reshape(T, F, N, L)
    U = G[..., 1:] - G[..., :-1]
    U = jnp.moveaxis(U, 1, 2)  # [T, N, F, L-1]
    return sigops.signature_kern_tens_vs_seq(U, num_levels, order=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_tens_seq_levels(Z, X, num_levels, rbf=True, increments=False,
                          interpret=False, mxu=None):
    """[nl+1, T, N] per-level ⟨z^{(m)}, S_m(x)⟩, fully fused.

    Z: [T, F, d] (or [T, F, 2, d] with ``increments``) pre-scaled factor
    stacks; X: [N, L, d] pre-scaled sequences. order=1, difference=True
    semantics; num_levels <= 7. ``mxu`` as in fused_gram_levels."""
    return _tens_seq_fwd_impl(Z, X, num_levels, rbf, increments, interpret,
                              mxu)


def _tens_seq_fwd_impl(Z, X, num_levels, rbf, increments, interpret,
                       mxu=None):
    if mxu is None:
        mxu = _default_mxu()
    if num_levels + 1 > _LEVROWS:
        raise ValueError("fused kernel supports num_levels <= 7")
    F = sigops.tensor_factor_count(num_levels)
    if Z.shape[1] != F:
        raise ValueError(f"Z must have F={F} factor rows; got {Z.shape}")
    T = Z.shape[0]
    N, L, d = X.shape
    Lp = _round_up(L, 8)
    Tp = _round_up(T, _LANE)
    F2 = 2 * F if increments else F
    # [T, F(,2), d] -> [F2, d, Tp]
    Zt = jnp.moveaxis(Z.reshape(T, F2, d), 0, -1)
    dz = d
    if rbf:
        cz = -0.5 * jnp.sum(Zt * Zt, 1, keepdims=True)  # [F2, 1, T]
        Zt = jnp.concatenate([Zt, cz.astype(Zt.dtype)], axis=1)
        dz = d + 1
    if Tp != T:
        Zt = jnp.pad(Zt, ((0, 0), (0, 0), (0, Tp - T)))
    Xp = jnp.pad(X, ((0, 0), (0, Lp - L), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _tens_seq_kernel, L=L, d=d, num_levels=num_levels, rbf=rbf,
            increments=increments, mxu=mxu,
        ),
        grid=(Tp // _LANE, N),
        in_specs=[
            pl.BlockSpec((F2, dz, _LANE), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _LEVROWS, _LANE), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, _LEVROWS, Tp), X.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (Tp // _LANE) * N * Lp * Lp
            * (F + num_levels * max(num_levels - 1, 1)) * _LANE,
            bytes_accessed=4 * (F2 * d * Tp + N * Lp * d
                                + N * _LEVROWS * Tp),
            transcendentals=Tp * N * L * F2 if rbf else 0,
        ),
    )(Zt, Xp)
    return jnp.transpose(out[:, : num_levels + 1, :T], (1, 2, 0))


def _tens_seq_vjp_fwd(Z, X, num_levels, rbf, increments, interpret, mxu):
    return (
        _tens_seq_fwd_impl(Z, X, num_levels, rbf, increments, interpret,
                           mxu),
        (Z, X),
    )


def _tens_seq_vjp_bwd(num_levels, rbf, increments, interpret, mxu, res, g):
    Z, X = res
    if not interpret and jax.default_backend() not in ("cpu",):
        return tens_seq_bwd_pallas(Z, X, g, num_levels, rbf, increments,
                                   interpret, mxu)
    _, vjp = jax.vjp(
        lambda z, x: _xla_reference_tens_seq(z, x, num_levels, rbf,
                                             increments),
        Z,
        X,
    )
    return vjp(g)


fused_tens_seq_levels.defvjp(_tens_seq_vjp_fwd, _tens_seq_vjp_bwd)


# ---------------------------------------------------------------------------
# Fully-fused backward (VERDICT r2 #4): exact adjoint of the per-level DP.
#
# Forward per (z-block, sequence): U_f = D·slab_f; level m uses factor slots
# off_m..off_m+m-1 with E^{(0)} = U_{off_m}, E^{(a)} = U_{off_m+a} ⊙ SL·E^{(a-1)},
# k_m = Σ_i E^{(m-1)}[i]. The slab set [Lp, F·128] fits in VMEM, so the
# backward recomputes and STORES every stage E^{(a)} (another [Lp, F·128]),
# takes EC = SL·S in one matmul, and runs the exact reverse recursion
#     Ū_{off+a} = Ē ⊙ EC_{a-1},   Ē ← SLᵀ·(U_{off+a} ⊙ Ē),   Ū_{off} = Ē
# batched over levels along lanes exactly like the forward. Ū chains back
# through Dᵀ, the increment pair-difference, and the base kernel to Z̄/X̄.
# Z̄ accumulates IN-PLACE across the innermost (sequence) grid axis — its
# output block index ignores j, so the block stays VMEM-resident over the
# whole j sweep; X̄ partials are written per (block, sequence) and reduced
# over the (few) tensor blocks outside the kernel.
# ---------------------------------------------------------------------------


def _tens_seq_bwd_kernel(z_ref, x_ref, g_ref, zb_ref, xb_ref, *, L, d,
                         num_levels, rbf, increments, mxu):
    """z_ref [F2, d(+1 for RBF, packing −½Σz²), 128]; x_ref [1, Lp, d];
    g_ref [1, _LEVROWS, 128]; zb_ref [1, F2·d, 128] (accumulated in place
    over the sequence axis); xb_ref [1, 1, Lp, d] (X̄ partial for this
    tensor block)."""
    dt = x_ref.dtype
    Lp = x_ref.shape[1]
    nl = num_levels
    F = nl * (nl + 1) // 2
    F2 = 2 * F if increments else F
    j = pl.program_id(1)

    xcols = []
    nx = jnp.zeros((Lp, _LANE), dt)
    for dd in range(d):
        xc = jnp.broadcast_to(x_ref[0, :, dd : dd + 1], (Lp, _LANE))
        xcols.append(xc)
        nx = nx + xc * xc
    nxc = -0.5 * nx if rbf else None

    def kblock(f):
        if rbf:
            G = nxc + z_ref[f, d : d + 1, :]
        else:
            G = jnp.zeros((Lp, _LANE), dt)
        for dd in range(d):
            G = G + xcols[dd] * z_ref[f, dd : dd + 1, :]
        return jnp.exp(G) if rbf else G

    Ks = [kblock(f) for f in range(F2)]
    if increments:
        slabs = [Ks[2 * f + 1] - Ks[2 * f] for f in range(F)]
    else:
        slabs = Ks
    Dm = _dmat(Lp, L, dt)
    SL = _sl(Lp, dt)
    U = _mxu_dot(Dm, jnp.concatenate(slabs, axis=1), mxu, "right").astype(dt)

    def ublock(A, f):
        return A[:, f * _LANE : (f + 1) * _LANE]

    off = [m * (m - 1) // 2 for m in range(1, nl + 1)]

    # ---- forward DP, storing every stage in slot off_m + a ----------------
    # stage 0 of every level is its first slab; later stages overwrite the
    # slots the forward's batched sweep walks through
    stages = [ublock(U, f) for f in range(F)]  # init: slot f = U_f
    E = jnp.concatenate([ublock(U, off[m - 1]) for m in range(1, nl + 1)],
                        axis=1)
    blk = jax.lax.broadcasted_iota(jnp.int32, (Lp, nl * _LANE), 1) // _LANE
    for a in range(1, nl):
        Ecum = _mxu_dot(SL, E, mxu, "right").astype(dt)
        Ua = jnp.concatenate(
            [
                ublock(U, off[m - 1] + a) if m > a else ublock(U, off[m - 1])
                for m in range(1, nl + 1)
            ],
            axis=1,
        )
        E = jnp.where(blk >= a, Ua * Ecum, E)
        for m in range(a + 1, nl + 1):
            stages[off[m - 1] + a] = ublock(E, m - 1)

    # exclusive cumsums of ALL stored stages in one matmul
    EC = _mxu_dot(SL, jnp.concatenate(stages, axis=1), mxu,
                  "right").astype(dt)

    # ---- reverse DP, batched over levels ----------------------------------
    # Ē^{(m-1)}[i] = w_m (k_m = Σ_i E[i]); padded rows are harmless (U = 0)
    Ebar = jnp.concatenate(
        [
            jnp.broadcast_to(g_ref[0, m : m + 1, :], (Lp, _LANE))
            for m in range(1, nl + 1)
        ],
        axis=1,
    )
    ubars = [None] * F
    for a in range(nl - 1, 0, -1):
        for m in range(a + 1, nl + 1):
            ubars[off[m - 1] + a] = ublock(Ebar, m - 1) * ublock(
                EC, off[m - 1] + a - 1
            )
        Usel = jnp.concatenate(
            [
                ublock(U, off[m - 1] + a) if m > a
                else jnp.zeros((Lp, _LANE), dt)
                for m in range(1, nl + 1)
            ],
            axis=1,
        )
        Tb = _mxu_dot(SL.T, Usel * Ebar, mxu, "right").astype(dt)
        Ebar = jnp.where(blk >= a, Tb, Ebar)
    for m in range(1, nl + 1):
        ubars[off[m - 1]] = ublock(Ebar, m - 1)

    # ---- chain: Ū -> slab̄ (Dᵀ) -> K̄ -> (Z̄, X̄) --------------------------
    slabbar = _mxu_dot(Dm.T, jnp.concatenate(ubars, axis=1), mxu,
                       "right").astype(dt)
    if increments:
        kbars = []
        for f in range(F):
            sb = ublock(slabbar, f)
            kbars.extend([-sb, sb])  # slots 2f, 2f+1
    else:
        kbars = [ublock(slabbar, f) for f in range(F)]

    nxbar = jnp.zeros((Lp, _LANE), dt)
    gx = [jnp.zeros((Lp, _LANE), dt) for _ in range(d)]  # Σ_f2 Ḡ_f2·z_f2,dd
    zrows = []  # [1, 128] per (f2, dd), f2-major
    for f2 in range(F2):
        if rbf:
            ubar = kbars[f2] * Ks[f2]
            Gbar = ubar
            nxbar = nxbar - 0.5 * ubar
            nzbar = -0.5 * jnp.sum(ubar, axis=0, keepdims=True)
        else:
            Gbar = kbars[f2]
        for dd in range(d):
            zr = z_ref[f2, dd : dd + 1, :]
            gx[dd] = gx[dd] + Gbar * zr
            zb = jnp.sum(Gbar * xcols[dd], axis=0, keepdims=True)
            if rbf:
                zb = zb + 2.0 * zr * nzbar
            zrows.append(zb)

    # Z̄ block [F2·d, 128] assembled by where-iota row placement (Mosaic has
    # no sublane stacking of unaligned pieces), accumulated across j
    riota = jax.lax.broadcasted_iota(jnp.int32, (F2 * d, _LANE), 0)
    zacc = jnp.zeros((F2 * d, _LANE), dt)
    for r, zb in enumerate(zrows):
        zacc = zacc + jnp.where(riota == r, jnp.broadcast_to(
            zb, (F2 * d, _LANE)), 0.0)

    @pl.when(j == 0)
    def _init():
        zb_ref[0] = zacc

    @pl.when(j > 0)
    def _acc():
        zb_ref[0] = zb_ref[0] + zacc

    # X̄ rows: lane-reduce Ḡ·z per channel + the nx chain
    ciota = jax.lax.broadcasted_iota(jnp.int32, (Lp, d), 1)
    xbar = jnp.zeros((Lp, d), dt)
    for dd in range(d):
        col = jnp.sum(gx[dd], axis=1, keepdims=True)  # [Lp, 1]
        if rbf:
            col = col + 2.0 * x_ref[0, :, dd : dd + 1] * jnp.sum(
                nxbar, axis=1, keepdims=True
            )
        xbar = xbar + jnp.where(ciota == dd, jnp.broadcast_to(col, (Lp, d)),
                                0.0)
    xb_ref[0, 0] = xbar


def tens_seq_bwd_pallas(Z, X, g, num_levels, rbf=True, increments=False,
                        interpret=False, mxu=None):
    """Fully-fused backward: (Z̄, X̄) from level cotangents g [nl+1, T, N].
    Same tiling as the forward; Z̄ accumulates in-place over the sequence
    grid axis, X̄ partials reduce over the tensor blocks outside."""
    if mxu is None:
        mxu = _default_mxu()
    F = sigops.tensor_factor_count(num_levels)
    T = Z.shape[0]
    N, L, d = X.shape
    Lp = _round_up(L, 8)
    Tp = _round_up(T, _LANE)
    F2 = 2 * F if increments else F
    Zt = jnp.moveaxis(Z.reshape(T, F2, d), 0, -1)
    dz = d
    if rbf:
        cz = -0.5 * jnp.sum(Zt * Zt, 1, keepdims=True)  # [F2, 1, T]
        Zt = jnp.concatenate([Zt, cz.astype(Zt.dtype)], axis=1)
        dz = d + 1
    if Tp != T:
        Zt = jnp.pad(Zt, ((0, 0), (0, 0), (0, Tp - T)))
    Xp = jnp.pad(X, ((0, 0), (0, Lp - L), (0, 0)))
    gp = jnp.zeros((N, _LEVROWS, Tp), X.dtype)
    gp = gp.at[:, : num_levels + 1, :T].set(
        jnp.transpose(g, (2, 0, 1)).astype(X.dtype)
    )
    nbi = Tp // _LANE
    zb, xb = pl.pallas_call(
        functools.partial(
            _tens_seq_bwd_kernel, L=L, d=d, num_levels=num_levels, rbf=rbf,
            increments=increments, mxu=mxu,
        ),
        grid=(nbi, N),
        in_specs=[
            pl.BlockSpec((F2, dz, _LANE), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LEVROWS, _LANE), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, F2 * d, _LANE), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lp, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nbi, F2 * d, _LANE), X.dtype),
            jax.ShapeDtypeStruct((nbi, N, Lp, d), X.dtype),
        ),
        interpret=interpret,
    )(Zt, Xp, gp)
    # Z̄: [nbi, F2·d, 128] -> [Tp, F2, d] -> Z's shape
    zbar = zb.reshape(nbi, F2, d, _LANE).transpose(0, 3, 1, 2)
    zbar = zbar.reshape(Tp, F2, d)[:T].reshape(Z.shape)
    # X̄: reduce the partials over tensor blocks
    xbar = jnp.sum(xb, axis=0)[:, :L]
    return zbar, xbar
