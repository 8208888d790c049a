"""Fused inducing-tensor-vs-sequence kernel for the GENERAL configuration
space: order >= 2, difference=False, and Poly/Cosine bases (VERDICT r4
"What's missing #2" — the hot core's last engine asymmetry).

Reference parity: ``gpsig/signature_algs.py::signature_kern_tens_vs_seq
(~L160)``'s higher-order branch (SURVEY.md §2.1 row 3) — the Kuf
covariance of every SVGP-with-inducing-tensors configuration the tuned
order-1 kernel (``tens_seq.py``) cannot take. Those configurations used
to fall back to the XLA path, which materialises the [T, N, F, L]
base-kernel tensor in HBM (~75 MB at minibatch shapes, the wall at
prediction-scale N — and the cached posterior made prediction
*Kuf-bound*, PERF.md r4).

Layout: identical to ``tens_seq.py`` — lanes = a 128-tensor block, grid
(T/128, N), per step one sequence's slab set [Lp, F·128] built in VMEM.
The difference is the per-level DP: instead of one state per level
(batched along lanes with frozen masks), each level m carries the
run-length-indexed states of the 1-D higher-order recursion

    E_r^{(a)}[i],  r = 0..min(order, m)-1   (run length r+1)

    E^{(0)} = [U_off, None, ...]
    E^{(a)}[0] = U_{off+a} · ecumsum(Σ_r E^{(a-1)}[r])
    E^{(a)}[r] = (U_{off+a}/(r+1)) · E^{(a-1)}[r-1]
    k_m = Σ_i Σ_r E^{(m-1)}[r][i]

with the per-``a`` exclusive cumsums of ALL still-evolving levels batched
into ONE strictly-lower-triangular [Lp, Lp]·[Lp, n·128] MXU matmul (the
1-D analogue of ``fused_gram_ho.py``'s column-streamed carries — strictly
simpler here because the cumsum is along the single sequence axis the
rows already hold). order==1 degenerates to the first-order recursion;
the tuned ``tens_seq.py`` kernel stays the speed path where it applies
(order==1, difference, RBF/Linear) and this kernel is the coverage path.

Base kinds (static ``kind``, matching ``fused_gram_ho.py``):
  - 'linear':  slab = Σ_d x·z
  - 'rbf':     slab = exp(−½‖x‖² −½‖z‖² + Σ x·z)  (z-norms packed as an
               extra data channel by the wrapper)
  - 'polyK':   slab = (Σ_d x·z)^K — the offset is folded in as a constant
               channel (x_extra = 1, z_extra = offset) by the kernel
               layer, so offset gradients flow through Z̄'s extra channel
  - 'cosine':  slab = cos(√(max(−2·acc, 0) + ε)), acc as in 'rbf'

``difference``: True runs the DP on the sequence-differenced slabs (one
structural-bidiagonal matmul, rows >= L−1 zeroed); False on the raw
slabs with a sublane row mask (rows >= L zeroed) so padding stays exact
for the non-vanishing-at-zero kinds.

Backward: fully-fused VMEM adjoint on TPU backends — the forward DP is
recomputed storing every stage's states and every transition's exclusive
cumsum (the per-step working set is a few MB at benchmark shapes; a
static VMEM gate falls back to the row-blocked XLA recompute beyond it),
then the exact reverse recursion runs with the per-``a`` SLᵀ matmuls
batched across levels like the forward. Ū chains to Z̄/X̄ through the
shared slab machinery (Dᵀ / row mask, pair-difference, per-kind base
adjoint). Z̄ accumulates in-place across the sequence grid axis.
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
from gpsig_tpu.ops.pallas.fused_gram_ho import _kind_params


def _live_states(num_levels, order):
    """live[m-1][a] = tuple of live run-length indices r of E^{(a)} for
    level m (1-based), a = 0..m-1 — mirrors the None-tracking of
    ops/signature.py::signature_kern_tens_vs_seq."""
    p = min(max(order, 1), num_levels)
    live = []
    for m in range(1, num_levels + 1):
        R = min(p, m)
        stages = [(0,)]
        for a in range(1, m):
            prev = stages[-1]
            cur = [0]
            for r in range(1, min(R, a + 1)):
                if (r - 1) in prev:
                    cur.append(r)
            stages.append(tuple(cur))
        live.append(stages)
    return live, p


def _slab_builder(z_ref, x_ref, L, d, kind, dt):
    """Shared column machinery: returns (kblock, xcols, nxc) where
    kblock(f) is the [Lp, 128] base-kernel slab of factor row f (the
    activated value) and, for differentiable kinds, its pre-activation.

    kblock returns (value, pre) — pre is the accumulator the backward
    chains through (dot for poly, acc for rbf/cosine, None for linear).
    """
    Lp = x_ref.shape[1]
    norms, degree = _kind_params(kind)
    xcols = []
    nx = jnp.zeros((Lp, _LANE), dt)
    for dd in range(d):
        xc = jnp.broadcast_to(x_ref[0, :, dd : dd + 1], (Lp, _LANE))
        xcols.append(xc)
        nx = nx + xc * xc
    nxc = -0.5 * nx if norms else None

    def kblock(f):
        if norms:
            G = nxc + z_ref[f, d : d + 1, :]
        else:
            G = jnp.zeros((Lp, _LANE), dt)
        for dd in range(d):
            G = G + xcols[dd] * z_ref[f, dd : dd + 1, :]
        if kind == "rbf":
            return jnp.exp(G), G
        if kind == "cosine":
            t = jnp.sqrt(jnp.maximum(-2.0 * G, 0.0) + 1e-36)
            return jnp.cos(t), G
        if degree is not None:
            out = G
            for _ in range(degree - 1):
                out = out * G
            return out, G
        return G, None

    return kblock, xcols, nxc


def _forward_dp(U, num_levels, order, mxu, dt, Lp, store=False):
    """The run-length DP over the slab set U (callable f -> [Lp, 128]).

    Returns (levels k_m as [1, 128] rows dict, stores) where stores =
    (stages, ecs) when ``store`` — everything the backward needs:
    stages[m][a] = list of state arrays (None for dead r) AFTER stage a;
    ecs[m][a] = the exclusive cumsum used by transition a (a >= 1).
    """
    nl = num_levels
    live, p = _live_states(nl, order)
    SL = _sl(Lp, dt)
    off = [m * (m - 1) // 2 for m in range(1, nl + 1)]

    E = {}
    stages = {m: [None] * m for m in range(1, nl + 1)} if store else None
    ecs = {m: [None] * m for m in range(1, nl + 1)} if store else None
    for m in range(1, nl + 1):
        R = min(p, m)
        E[m] = [U(off[m - 1])] + [None] * (R - 1)
        if store:
            stages[m][0] = list(E[m])
    for a in range(1, nl):
        ms = [m for m in range(a + 1, nl + 1)]
        if not ms:
            break
        totals = []
        for m in ms:
            tot = None
            for st in E[m]:
                if st is not None:
                    tot = st if tot is None else tot + st
            totals.append(tot)
        cat = totals[0] if len(totals) == 1 else jnp.concatenate(
            totals, axis=1
        )
        EC = _mxu_dot(SL, cat, mxu, "right").astype(dt)
        for i, m in enumerate(ms):
            R = min(p, m)
            Ua = U(off[m - 1] + a)
            ec = EC[:, i * _LANE : (i + 1) * _LANE]
            En = [None] * R
            En[0] = Ua * ec
            for r in range(1, min(R, a + 1)):
                if E[m][r - 1] is not None:
                    En[r] = (Ua / (r + 1)) * E[m][r - 1]
            E[m] = En
            if store:
                stages[m][a] = list(En)
                ecs[m][a] = ec
    levels = {}
    for m in range(1, nl + 1):
        tot = None
        for st in E[m]:
            if st is not None:
                tot = st if tot is None else tot + st
        levels[m] = jnp.sum(tot, axis=0, keepdims=True)  # [1, 128]
    return levels, (stages, ecs)


def _tsg_kernel(z_ref, x_ref, out_ref, *, L, d, num_levels, order, kind,
                increments, difference, mxu):
    """z_ref: [F2, dz, 128] (dz = d+1 when norms are packed); x_ref:
    [1, Lp, d]; out_ref: [1, _LEVROWS, 128]."""
    dt = x_ref.dtype
    Lp = x_ref.shape[1]
    nl = num_levels
    F = nl * (nl + 1) // 2

    kblock, _, _ = _slab_builder(z_ref, x_ref, L, d, kind, dt)
    if increments:
        slabs = [kblock(2 * f + 1)[0] - kblock(2 * f)[0] for f in range(F)]
    else:
        slabs = [kblock(f)[0] for f in range(F)]

    cat = jnp.concatenate(slabs, axis=1)
    if difference:
        Dm = _dmat(Lp, L, dt)
        Uall = _mxu_dot(Dm, cat, mxu, "right").astype(dt)
    else:
        ri = jax.lax.broadcasted_iota(jnp.int32, (Lp, F * _LANE), 0)
        Uall = jnp.where(ri < L, cat, 0.0)

    def U(f):
        return Uall[:, f * _LANE : (f + 1) * _LANE]

    levels, _ = _forward_dp(U, nl, order, mxu, dt, Lp, store=False)

    levrow = jax.lax.broadcasted_iota(jnp.int32, (_LEVROWS, _LANE), 0)
    acc = jnp.where(levrow == 0, jnp.asarray(1.0, dt), 0.0)
    for m in range(1, nl + 1):
        acc = acc + jnp.where(levrow == m, levels[m], 0.0)
    out_ref[0] = acc


def _xla_reference_tens_seq_general(Z, X, num_levels, order, kind,
                                    increments, difference):
    """Mathematically identical XLA path (CPU VJP route + test oracle).
    Z, X pre-scaled (and pre-augmented for 'poly<K>'); matches
    kernels/signature.py::K_tens_vs_seq's fallback exactly."""
    T, F = Z.shape[0], (Z.shape[1])
    N, L, d = X.shape
    z2 = Z.reshape(-1, d)
    x2 = X.reshape(-1, d)
    dot = jnp.matmul(z2, x2.T, precision="highest")
    if kind in ("rbf", "cosine"):
        nz = jnp.sum(z2 * z2, -1)
        nx = jnp.sum(x2 * x2, -1)
        # unclamped on purpose — must be the same function as the fused
        # forward (see tens_seq._xla_reference_tens_seq)
        acc = -0.5 * nz[:, None] - 0.5 * nx[None, :] + dot
        if kind == "rbf":
            G = jnp.exp(acc)
        else:
            G = jnp.cos(jnp.sqrt(jnp.maximum(-2.0 * acc, 0.0) + 1e-36))
    elif kind == "linear":
        G = dot
    else:
        _, degree = _kind_params(kind)
        G = dot**degree
    if increments:
        G = G.reshape(T, F, 2, N, L)
        G = G[:, :, 1] - G[:, :, 0]
    else:
        G = G.reshape(T, F, N, L)
    U = G[..., 1:] - G[..., :-1] if difference else G
    U = jnp.moveaxis(U, 1, 2)  # [T, N, F, l]
    return sigops.signature_kern_tens_vs_seq(U, num_levels, order)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def fused_tens_seq_general_levels(Z, X, num_levels, order, kind="rbf",
                                  increments=False, difference=True,
                                  interpret=False, mxu=None):
    """[nl+1, T, N] per-level ⟨z^{(m)}, S_m(x)⟩, fully fused, for any
    order / difference / base kind (see module docstring).

    Z: [T, F, d] (or [T, F, 2, d] with ``increments``) pre-scaled factor
    stacks; X: [N, L, d] pre-scaled sequences. For 'poly<K>' the caller
    must already have appended the constant offset channel (x_extra = 1,
    z_extra = offset) — see kernels/signature.py. num_levels <= 7."""
    return _tsg_fwd_impl(Z, X, num_levels, order, kind, increments,
                         difference, interpret, mxu)


def _pack_inputs(Z, X, num_levels, kind, increments):
    norms, _ = _kind_params(kind)
    F = sigops.tensor_factor_count(num_levels)
    if Z.shape[1] != F:
        raise ValueError(f"Z must have F={F} factor rows; got {Z.shape}")
    T = Z.shape[0]
    N, L, d = X.shape
    Lp = _round_up(L, 8)
    Tp = _round_up(T, _LANE)
    F2 = 2 * F if increments else F
    Zt = jnp.moveaxis(Z.reshape(T, F2, d), 0, -1)  # [F2, d, T]
    dz = d
    if norms:
        cz = -0.5 * jnp.sum(Zt * Zt, 1, keepdims=True)  # [F2, 1, T]
        Zt = jnp.concatenate([Zt, cz.astype(Zt.dtype)], axis=1)
        dz = d + 1
    if Tp != T:
        Zt = jnp.pad(Zt, ((0, 0), (0, 0), (0, Tp - T)))
    Xp = jnp.pad(X, ((0, 0), (0, Lp - L), (0, 0)))
    return Zt, Xp, dict(T=T, N=N, L=L, d=d, dz=dz, Lp=Lp, Tp=Tp, F=F,
                        F2=F2)


def _tsg_fwd_impl(Z, X, num_levels, order, kind, increments, difference,
                  interpret, mxu=None):
    if mxu is None:
        mxu = _default_mxu()
    if num_levels + 1 > _LEVROWS:
        raise ValueError("fused kernel supports num_levels <= 7")
    Zt, Xp, dm = _pack_inputs(Z, X, num_levels, kind, increments)
    T, N, L, d = dm["T"], dm["N"], dm["L"], dm["d"]
    dz, Lp, Tp, F, F2 = dm["dz"], dm["Lp"], dm["Tp"], dm["F"], dm["F2"]
    live, p = _live_states(num_levels, order)
    out = pl.pallas_call(
        functools.partial(
            _tsg_kernel, L=L, d=d, num_levels=num_levels, order=order,
            kind=kind, increments=increments, difference=difference,
            mxu=mxu,
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
            * (F + num_levels * max(num_levels - 1, 1) * p) * _LANE,
            bytes_accessed=4 * (F2 * dz * Tp + N * Lp * d
                                + N * _LEVROWS * Tp),
            transcendentals=Tp * N * L * F2 if kind != "linear" else 0,
        ),
    )(Zt, Xp)
    return jnp.transpose(out[:, : num_levels + 1, :T], (1, 2, 0))


def _bwd_state_arrays(num_levels, order):
    """[Lp, 128]-array count of the backward's stored working set."""
    live, p = _live_states(num_levels, order)
    n = 0
    for m in range(1, num_levels + 1):
        for a in range(m):
            n += len(live[m - 1][a])  # stages
            if a >= 1:
                n += 1  # ecs
    return n


#: VMEM budget for the fused backward's stored DP stages (bytes); beyond
#: it the vjp falls back to the row-blocked XLA recompute.
_BWD_VMEM_BUDGET = 8 * 2**20
_BWD_ROW_BLOCK = 64


def _tsg_bwd_kernel(z_ref, x_ref, g_ref, zb_ref, xb_ref, *, L, d,
                    num_levels, order, kind, increments, difference, mxu):
    """Fully-fused backward. Refs as in tens_seq._tens_seq_bwd_kernel:
    z_ref [F2, dz, 128]; x_ref [1, Lp, d]; g_ref [1, _LEVROWS, 128];
    zb_ref [1, F2·dz_grad, 128] accumulated over j; xb_ref [1, 1, Lp, d]."""
    dt = x_ref.dtype
    Lp = x_ref.shape[1]
    nl = num_levels
    F = nl * (nl + 1) // 2
    F2 = 2 * F if increments else F
    j = pl.program_id(1)
    norms, degree = _kind_params(kind)
    live, p = _live_states(nl, order)
    off = [m * (m - 1) // 2 for m in range(1, nl + 1)]
    SL = _sl(Lp, dt)

    kblock, xcols, nxc = _slab_builder(z_ref, x_ref, L, d, kind, dt)
    vals, pres = [], []
    for f in range(F2):
        v, pre = kblock(f)
        vals.append(v)
        pres.append(pre)
    if increments:
        slabs = [vals[2 * f + 1] - vals[2 * f] for f in range(F)]
    else:
        slabs = vals
    cat = jnp.concatenate(slabs, axis=1)
    if difference:
        Dm = _dmat(Lp, L, dt)
        Uall = _mxu_dot(Dm, cat, mxu, "right").astype(dt)
    else:
        ri = jax.lax.broadcasted_iota(jnp.int32, (Lp, F * _LANE), 0)
        Uall = jnp.where(ri < L, cat, 0.0)

    def U(f):
        return Uall[:, f * _LANE : (f + 1) * _LANE]

    # ---- forward DP with full stage storage -------------------------------
    _, (stages, ecs) = _forward_dp(U, nl, order, mxu, dt, Lp, store=True)

    # ---- reverse DP -------------------------------------------------------
    # k_m = Σ_i Σ_r E^{(m-1)}[r][i] → every live final state's adjoint is
    # the broadcast level cotangent.
    Ebar = {}
    for m in range(1, nl + 1):
        R = min(p, m)
        gb = jnp.broadcast_to(g_ref[0, m : m + 1, :], (Lp, _LANE))
        Ebar[m] = [
            gb if r in live[m - 1][m - 1] else None for r in range(R)
        ]
    ubars = [None] * F
    for a in range(nl - 1, 0, -1):
        ms = [m for m in range(a + 1, nl + 1)]
        pieces = []
        for m in ms:
            Ua = U(off[m - 1] + a)
            Ebn = Ebar[m]
            # Ū_{off+a} = Ēn[0]·EC + Σ_{r>=1} Ēn[r]·E^{(a-1)}[r-1]/(r+1)
            ub = Ebn[0] * ecs[m][a]
            R = min(p, m)
            for r in range(1, min(R, a + 1)):
                if Ebn[r] is not None and stages[m][a - 1][r - 1] is not None:
                    ub = ub + Ebn[r] * (stages[m][a - 1][r - 1] / (r + 1))
            ubars[off[m - 1] + a] = ub
            pieces.append(Ua * Ebn[0])
        cat_p = pieces[0] if len(pieces) == 1 else jnp.concatenate(
            pieces, axis=1
        )
        Tcat = _mxu_dot(SL.T, cat_p, mxu, "right").astype(dt)
        for i, m in enumerate(ms):
            tb = Tcat[:, i * _LANE : (i + 1) * _LANE]
            Ua = U(off[m - 1] + a)
            R = min(p, m)
            newE = [None] * R
            for r in live[m - 1][a - 1]:
                nb = tb  # every old state feeds the total chain
                if r + 1 < R and Ebar[m][r + 1] is not None:
                    nb = nb + (Ua / (r + 2)) * Ebar[m][r + 1]
                newE[r] = nb
            Ebar[m] = newE
    for m in range(1, nl + 1):
        ubars[off[m - 1]] = Ebar[m][0]

    # ---- chain: Ū -> slab̄ -> K̄ -> (Z̄, X̄) -------------------------------
    ucat = jnp.concatenate(ubars, axis=1)
    if difference:
        slabbar = _mxu_dot(Dm.T, ucat, mxu, "right").astype(dt)
    else:
        ri = jax.lax.broadcasted_iota(jnp.int32, (Lp, F * _LANE), 0)
        slabbar = jnp.where(ri < L, ucat, 0.0)

    def sb(f):
        return slabbar[:, f * _LANE : (f + 1) * _LANE]

    if increments:
        kbars = []
        for f in range(F):
            s = sb(f)
            kbars.extend([-s, s])  # slots 2f, 2f+1
    else:
        kbars = [sb(f) for f in range(F)]

    # per-kind pre-activation adjoint: prebar = dslab/dpre · kbar
    prebars = []
    for f2 in range(F2):
        kb = kbars[f2]
        if kind == "rbf":
            prebars.append(kb * vals[f2])
        elif kind == "cosine":
            pre = pres[f2]
            t = jnp.sqrt(jnp.maximum(-2.0 * pre, 0.0) + 1e-36)
            prebars.append(kb * (jnp.sin(t) / t)
                           * (pre < 0.0).astype(dt))
        elif degree is not None:
            pre = pres[f2]
            dp = jnp.asarray(float(degree), dt)
            pw = pre
            for _ in range(degree - 2):
                pw = pw * pre
            prebars.append(kb * dp * (pw if degree >= 2 else 1.0))
        else:
            prebars.append(kb)

    nxbar = jnp.zeros((Lp, _LANE), dt)
    gx = [jnp.zeros((Lp, _LANE), dt) for _ in range(d)]
    zrows = []  # [1, 128] rows, f2-major then channel (z̄ via data chans)
    for f2 in range(F2):
        Gbar = prebars[f2]
        if norms:
            nxbar = nxbar - 0.5 * Gbar
            nzbar = -0.5 * jnp.sum(Gbar, axis=0, keepdims=True)
        for dd in range(d):
            zr = z_ref[f2, dd : dd + 1, :]
            gx[dd] = gx[dd] + Gbar * zr
            zb = jnp.sum(Gbar * xcols[dd], axis=0, keepdims=True)
            if norms:
                zb = zb + 2.0 * zr * nzbar
            zrows.append(zb)

    riota = jax.lax.broadcasted_iota(jnp.int32, (F2 * d, _LANE), 0)
    zacc = jnp.zeros((F2 * d, _LANE), dt)
    for r, zb in enumerate(zrows):
        zacc = zacc + jnp.where(
            riota == r, jnp.broadcast_to(zb, (F2 * d, _LANE)), 0.0
        )

    @pl.when(j == 0)
    def _init():
        zb_ref[0] = zacc

    @pl.when(j > 0)
    def _acc():
        zb_ref[0] = zb_ref[0] + zacc

    ciota = jax.lax.broadcasted_iota(jnp.int32, (Lp, d), 1)
    xbar = jnp.zeros((Lp, d), dt)
    for dd in range(d):
        col = jnp.sum(gx[dd], axis=1, keepdims=True)
        if norms:
            col = col + 2.0 * x_ref[0, :, dd : dd + 1] * jnp.sum(
                nxbar, axis=1, keepdims=True
            )
        xbar = xbar + jnp.where(
            ciota == dd, jnp.broadcast_to(col, (Lp, d)), 0.0
        )
    xb_ref[0, 0] = xbar


def tens_seq_general_bwd_pallas(Z, X, g, num_levels, order, kind,
                                increments, difference, interpret=False,
                                mxu=None):
    """Fully-fused backward: (Z̄, X̄) from level cotangents g [nl+1, T, N]."""
    if mxu is None:
        mxu = _default_mxu()
    Zt, Xp, dm = _pack_inputs(Z, X, num_levels, kind, increments)
    T, N, L, d = dm["T"], dm["N"], dm["L"], dm["d"]
    dz, Lp, Tp, F, F2 = dm["dz"], dm["Lp"], dm["Tp"], dm["F"], dm["F2"]
    gp = jnp.zeros((N, _LEVROWS, Tp), X.dtype)
    gp = gp.at[:, : num_levels + 1, :T].set(
        jnp.transpose(g, (2, 0, 1)).astype(X.dtype)
    )
    nbi = Tp // _LANE
    zb, xb = pl.pallas_call(
        functools.partial(
            _tsg_bwd_kernel, L=L, d=d, num_levels=num_levels, order=order,
            kind=kind, increments=increments, difference=difference,
            mxu=mxu,
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
    zbar = zb.reshape(nbi, F2, d, _LANE).transpose(0, 3, 1, 2)
    zbar = zbar.reshape(Tp, F2, d)[:T].reshape(Z.shape)
    xbar = jnp.sum(xb, axis=0)[:, :L]
    return zbar, xbar


def _tsg_vjp_fwd(Z, X, num_levels, order, kind, increments, difference,
                 interpret, mxu):
    return (
        _tsg_fwd_impl(Z, X, num_levels, order, kind, increments,
                      difference, interpret, mxu),
        (Z, X),
    )


def _tsg_vjp_bwd(num_levels, order, kind, increments, difference,
                 interpret, mxu, res, g):
    Z, X = res
    Lp = _round_up(X.shape[1], 8)
    vmem = (_bwd_state_arrays(num_levels, order) + 4 * Z.shape[1]
            * (2 if increments else 1)) * Lp * _LANE * 4
    if (not interpret and jax.default_backend() not in ("cpu",)
            and vmem <= _BWD_VMEM_BUDGET):
        return tens_seq_general_bwd_pallas(
            Z, X, g, num_levels, order, kind, increments, difference,
            interpret, mxu
        )
    # row-blocked XLA recompute over sequences (CPU / VMEM-gate fallback)
    N = X.shape[0]
    rb = _BWD_ROW_BLOCK

    def f(z, x):
        return _xla_reference_tens_seq_general(
            z, x, num_levels, order, kind, increments, difference
        )

    if N <= rb:
        _, vjp = jax.vjp(f, Z, X)
        return vjp(g)
    pad = (-N) % rb
    Xp = jnp.concatenate([X, jnp.zeros((pad,) + X.shape[1:], X.dtype)])
    gp = jnp.concatenate(
        [g, jnp.zeros(g.shape[:2] + (pad,), g.dtype)], axis=2
    )
    xblocks = Xp.reshape(-1, rb, *X.shape[1:])
    gblocks = jnp.moveaxis(
        gp.reshape(g.shape[0], g.shape[1], -1, rb), 2, 0
    )

    def block_vjp(args):
        xb, gb = args
        _, vjp = jax.vjp(f, Z, xb)
        return vjp(gb)

    zbar_blocks, xbar_blocks = jax.lax.map(block_vjp, (xblocks, gblocks))
    xbar = xbar_blocks.reshape(-1, *X.shape[1:])[:N]
    return jnp.sum(zbar_blocks, axis=0), xbar


fused_tens_seq_general_levels.defvjp(_tsg_vjp_fwd, _tsg_vjp_bwd)
