"""Fully-fused backward for the general fused Gram (``fused_gram_ho.py``):
reverse column sweep of the run-length (higher-order) signature DP, all
states reconstructed in VMEM — order≥2 / difference=False / Poly / Cosine
*training* never materialises the [N², L, L] tensor in HBM either.

Adjoint derivation (per column j, level m, grid state (r, s)):

forward transitions (see fused_gram_ho._ho_kernel.column_states)
    cur_m[(0,0)]  = M_j ⊙ (SL·T_{m-1})              T: ecumsum2 carry
    cur_m[(r,0)]  = M_j/(r+1) ⊙ RowAcc_{m-1}[r-1]   RowAcc: j-cumsum carry
    cur_m[(0,r)]  = M_j/(r+1) ⊙ SL·(Σ_s cur_{m-1}[(s,r-1)])   same column
    cur_m[(r,s)]  = M_j/((r+1)(s+1)) ⊙ cur_{m-1}[(r-1,s-1)]   same column

cotangents (Ā = bar of cur; w_m = level-sum cotangent):
    Ā_m[(r,s)](j) = w_m + Rtot_m + Rrow_m[r] + inj_m[(r,s)]
      Rtot_m  = Σ_{j'>j} SLᵀ·(M_{j'} ⊙ Ā_{m+1}[(0,0)](j'))    [carry]
      Rrow_m[q] = Σ_{j'>j} M_{j'}/(q+2) ⊙ Ā_{m+1}[(q+1,0)](j') [carry]
      inj_m[(s,r-1)] += SLᵀ·(M_j/(r+1) ⊙ Ā_{m+1}[(0,r)](j))    [same col]
      inj_m[(r-1,s-1)] += M_j/((r+1)(s+1)) ⊙ Ā_{m+1}[(r,s)](j) [same col]
    M̄_j = Ā_1[(0,0)] + Σ_{m≥2} [ Ā_m[(0,0)]⊙E_m
            + Σ_r Ā_m[(r,0)]/(r+1)⊙RowAcc_{m-1}[r-1]
            + Σ_r Ā_m[(0,r)]/(r+1)⊙SLcol_{m,r}
            + Σ_{r,s} Ā_m[(r,s)]/((r+1)(s+1))⊙cur_{m-1}[(r-1,s-1)] ]

Forward states at column j are reconstructed by subtraction while
sweeping j downward — T_m(j) = T_m(j+1) − Σ_rs cur_m[(r,s)](j),
resolvable in ascending m (cur_1 = M_j needs no carry) — so nothing
O(L) per pair is ever stored: one forward pass for the end states, then
one reverse sweep, all in VMEM. M̄ chains to X̄/Ȳ through the
difference operator (Dᵀ, difference=True) or a row mask
(difference=False) and the base-kernel column (kind-specific acc chain:
exp for RBF, sin(t)/t for Cosine, k·accᵏ⁻¹ for Poly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpsig_tpu.ops.pallas.fused_gram import (
    _LANE,
    _LEVROWS,
    _default_mxu,
    _dmat_blk,
    _mxu_dot,
    _round_up,
    _sl_blk,
)
from gpsig_tpu.ops.pallas.fused_gram_ho import (
    _existing_states,
    _kind_params,
    _prep_xy,
    _rowacc_slots,
)


def _ho_bwd_kernel(x_ref, y_ref, g_ref, xb_ref, yb_ref, yscr, *, L, d,
                   num_levels, order, kind, difference, bx, sy, mxu):
    """Layouts as in fused_gram._bwd_fused_kernel: x_ref [1, Lp, d·bx];
    y_ref [L, dy, sy·128]; g_ref [bx, _LEVROWS, sy·128]; xb_ref
    [1, 1, Lp, d·bx] (X̄ partial per y-block group); yb_ref
    [1, 1, L, d·sy·128] (Ȳ partial per x-block); yscr VMEM scratch."""
    dt = x_ref.dtype
    Lp = x_ref.shape[1]
    W = bx * _LANE
    nl = num_levels
    Lq = sy * Lp
    norms, degree = _kind_params(kind)
    live, p = _existing_states(nl, order)
    ra_slots = _rowacc_slots(live, p, nl)
    nT = max(nl - 1, 1)
    nRA = max(len(ra_slots), 1)

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
    if difference:
        Dm = _dmat_blk(Lp, L, sy, dt)
        ncols = L - 1
    else:
        ri = jax.lax.broadcasted_iota(jnp.int32, (Lq, W), 0) % Lp
        rowmask = (ri < L).astype(dt)
        ncols = L

    def kcol(jj):
        """(G, acc, yws): stacked base column, its pre-activation
        accumulator, and the per-channel broadcast y rows [Lq, W]."""
        yws = []
        if norms:
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
            acc = nxc + cyw
        else:
            acc = jnp.zeros((Lq, W), dt)
        for dd in range(d):
            rows = []
            for h in range(sy):
                yv = y_ref[jj, dd : dd + 1, h * _LANE : (h + 1) * _LANE]
                yw = jnp.concatenate([yv] * bx, axis=1)
                rows.append(jnp.broadcast_to(yw, (Lp, W)))
            ywf = rows[0] if sy == 1 else jnp.concatenate(rows, axis=0)
            yws.append(ywf)
            acc = acc + xcols_s[dd] * ywf
        if kind == "rbf":
            return jnp.exp(acc), acc, yws
        if kind == "cosine":
            t = jnp.sqrt(jnp.maximum(-2.0 * acc, 0.0) + 1e-36)
            return jnp.cos(t), acc, yws
        if degree is not None:
            G = acc
            for _ in range(degree - 1):
                G = G * acc
            return G, acc, yws
        return acc, acc, yws

    def accbar_of(Kbar, G, acc):
        """Chain the base-column cotangent through the activation."""
        if kind == "rbf":
            return Kbar * G
        if kind == "cosine":
            t = jnp.sqrt(jnp.maximum(-2.0 * acc, 0.0) + 1e-36)
            return Kbar * jnp.where(acc <= 0, jnp.sin(t) / t, 0.0)
        if degree is not None:
            pw = jnp.ones_like(acc)
            for _ in range(degree - 1):
                pw = pw * acc
            return Kbar * (float(degree) * pw)
        return Kbar

    # cotangent blocks w_m: [Lq, W] per level
    wvecs = []
    for m in range(1, nl + 1):
        rows = []
        for h in range(sy):
            pieces = [
                g_ref[b, m : m + 1, h * _LANE : (h + 1) * _LANE]
                for b in range(bx)
            ]
            wrow = jnp.concatenate(pieces, axis=1)
            rows.append(jnp.broadcast_to(wrow, (Lp, W)))
        wvecs.append(rows[0] if sy == 1 else jnp.concatenate(rows, axis=0))

    def mcol_of(K_hi, K_lo):
        if difference:
            return _mxu_dot(Dm, K_hi - K_lo, mxu, "right").astype(dt)
        return rowmask * K_lo

    def reconstruct(Mcol, Tcat, RA, forward_mode):
        """Column states for all levels. forward_mode=True: Tcat/RA are
        pre-column (exclusive) — returns (cur_all, Tcat', RA', E, SLcols)
        with carries updated to include this column. forward_mode=False
        (reverse): Tcat/RA are post-column — returns the same tuple but
        with carries *subtracted* to their exclusive values (which both
        feed this column's adjoint and become the next reverse carry).
        """
        cur_all = []
        SLcols = [dict() for _ in range(nl)]
        Tparts = [Tcat[:, k * W : (k + 1) * W] for k in range(nT)]
        RAparts = [RA[:, k * W : (k + 1) * W] for k in range(nRA)]
        Eparts = [None] * max(nl - 1, 1)

        def finish_level(m, cur):
            """After cur for level m is built: in reverse mode subtract
            its totals from the carries so levels above see exclusive
            values."""
            cur_all.append(cur)
            if forward_mode:
                return
            if m <= nl - 1:
                tot = None
                for v in cur.values():
                    tot = v if tot is None else tot + v
                Tparts[m - 1] = Tparts[m - 1] - tot
            for k, (mm, q) in enumerate(ra_slots):
                if mm != m:
                    continue
                tot = None
                for s in range(p):
                    v = cur.get((q, s))
                    if v is not None:
                        tot = v if tot is None else tot + v
                if tot is not None:
                    RAparts[k] = RAparts[k] - tot

        finish_level(1, {(0, 0): Mcol})
        for m in range(2, nl + 1):
            R = min(p, m)
            prev = cur_all[-1]
            Em = _mxu_dot(SL, Tparts[m - 2], mxu, "right").astype(dt)
            Eparts[m - 2] = Em
            cur = {(0, 0): Mcol * Em}
            for r in range(1, R):
                if (m - 1, r - 1) in ra_slots:
                    k = ra_slots.index((m - 1, r - 1))
                    cur[(r, 0)] = (Mcol / (r + 1)) * RAparts[k]
            cols, tags = [], []
            for r in range(1, R):
                pieces = [
                    prev[(s, r - 1)] for s in range(p)
                    if (s, r - 1) in prev
                ]
                if pieces:
                    acc = pieces[0]
                    for pc in pieces[1:]:
                        acc = acc + pc
                    cols.append(acc)
                    tags.append(r)
            if cols:
                batched = _mxu_dot(
                    SL,
                    jnp.concatenate(cols, axis=1) if len(cols) > 1
                    else cols[0],
                    mxu, "right",
                ).astype(dt)
                for i, r in enumerate(tags):
                    sc = batched[:, i * W : (i + 1) * W]
                    SLcols[m - 1][r] = sc
                    cur[(0, r)] = (Mcol / (r + 1)) * sc
            for r in range(1, R):
                for s in range(1, R):
                    if (r - 1, s - 1) in prev:
                        cur[(r, s)] = (
                            Mcol / ((r + 1) * (s + 1))
                        ) * prev[(r - 1, s - 1)]
            finish_level(m, cur)
        if forward_mode:
            for m in range(1, nl):
                tot = None
                for v in cur_all[m - 1].values():
                    tot = v if tot is None else tot + v
                Tparts[m - 1] = Tparts[m - 1] + tot
            for k, (mm, q) in enumerate(ra_slots):
                tot = None
                for s in range(p):
                    v = cur_all[mm - 1].get((q, s))
                    if v is not None:
                        tot = v if tot is None else tot + v
                RAparts[k] = RAparts[k] + tot
        Tcat2 = (
            jnp.concatenate(Tparts, axis=1) if len(Tparts) > 1
            else Tparts[0]
        )
        RA2 = (
            jnp.concatenate(RAparts, axis=1) if len(RAparts) > 1
            else RAparts[0]
        )
        return cur_all, Tcat2, RA2, Eparts, SLcols

    # ---- phase 1: forward recompute of the end-state carries -------------
    def fwd_body(jj, carry):
        K_hi, Tcat, RA = carry
        if difference:
            G, _, _ = kcol(jj + 1)
            Mcol = mcol_of(G, K_hi)
            Knew = G
        else:
            G, _, _ = kcol(jj)
            Mcol = mcol_of(None, G)
            Knew = K_hi
        _, Tcat, RA, _, _ = reconstruct(Mcol, Tcat, RA, True)
        return Knew, Tcat, RA

    K0 = kcol(0)[0] if difference else jnp.zeros((1, 1), dt)
    Tcat0 = jnp.zeros((Lq, nT * W), dt)
    RA0 = jnp.zeros((Lq, nRA * W), dt)
    _, Tend, RAend = jax.lax.fori_loop(
        0, ncols, fwd_body, (K0, Tcat0, RA0)
    )

    # ---- phase 2: reverse sweep ------------------------------------------
    def adjoint_column(Mcol, cur_all, Eparts, SLcols, RA_excl, Rtot,
                       Rrow):
        """Ā levels (descending) → (Mbar, rtot_pieces, rrow_pieces)."""
        inj = {}  # state -> same-column injection, for the level below
        Mbar = None
        rtot_pieces = [None] * max(nl - 1, 1)
        rrow_pieces = [None] * nRA
        for m in range(nl, 0, -1):
            Abar = {}
            for (r, s) in sorted(live[m - 1]):
                a = wvecs[m - 1]
                if m <= nl - 1:
                    a = a + Rtot[:, (m - 1) * W : m * W]
                if (m, r) in ra_slots:
                    k = ra_slots.index((m, r))
                    a = a + Rrow[:, k * W : (k + 1) * W]
                if (r, s) in inj:
                    a = a + inj[(r, s)]
                Abar[(r, s)] = a
            # contributions to Mbar and to the level below
            inj = {}
            if m >= 2:
                prev = cur_all[m - 2]
                contrib = Abar[(0, 0)] * Eparts[m - 2]
                Mbar = contrib if Mbar is None else Mbar + contrib
                R = min(p, m)
                for r in range(1, R):
                    if (r, 0) in Abar and (m - 1, r - 1) in ra_slots:
                        k = ra_slots.index((m - 1, r - 1))
                        Mbar = Mbar + (
                            Abar[(r, 0)] / (r + 1)
                        ) * RA_excl[:, k * W : (k + 1) * W]
                # (0, r): Mbar via SLcol; V_r into prev rows, batched
                vin, vtags = [], []
                for r in range(1, R):
                    if (0, r) in Abar and r in SLcols[m - 1]:
                        Mbar = Mbar + (
                            Abar[(0, r)] / (r + 1)
                        ) * SLcols[m - 1][r]
                        vin.append((Mcol / (r + 1)) * Abar[(0, r)])
                        vtags.append(r)
                if vin:
                    Vb = _mxu_dot(
                        SL.T,
                        jnp.concatenate(vin, axis=1) if len(vin) > 1
                        else vin[0],
                        mxu, "right",
                    ).astype(dt)
                    for i, r in enumerate(vtags):
                        V = Vb[:, i * W : (i + 1) * W]
                        for s in range(p):
                            if (s, r - 1) in live[m - 2]:
                                inj[(s, r - 1)] = (
                                    inj.get((s, r - 1), 0.0) + V
                                )
                for r in range(1, R):
                    for s in range(1, R):
                        if (r, s) in Abar and (r - 1, s - 1) in prev:
                            c = 1.0 / ((r + 1) * (s + 1))
                            Mbar = Mbar + Abar[(r, s)] * prev[
                                (r - 1, s - 1)
                            ] * c
                            inj[(r - 1, s - 1)] = inj.get(
                                (r - 1, s - 1), 0.0
                            ) + (Mcol * c) * Abar[(r, s)]
                # deferred reverse-accumulator pieces (applied post-column)
                rtot_pieces[m - 2] = Mcol * Abar[(0, 0)]
                for r in range(1, R):
                    if (r, 0) in Abar and (m - 1, r - 1) in ra_slots:
                        k = ra_slots.index((m - 1, r - 1))
                        rrow_pieces[k] = (Mcol / (r + 1)) * Abar[(r, 0)]
            else:
                Mbar = (
                    Abar[(0, 0)] if Mbar is None else Mbar + Abar[(0, 0)]
                )
        return Mbar, rtot_pieces, rrow_pieces

    def apply_reverse_updates(Rtot, Rrow, rtot_pieces, rrow_pieces):
        """Fold this column's deferred pieces into the reverse carries
        (deferred so this column's own Ā reads the strictly-later-column
        values)."""
        if nl >= 2:
            parts = [
                rp if rp is not None else jnp.zeros((Lq, W), dt)
                for rp in rtot_pieces
            ]
            stacked = (
                jnp.concatenate(parts, axis=1) if len(parts) > 1
                else parts[0]
            )
            Rtot = Rtot + _mxu_dot(SL.T, stacked, mxu, "right").astype(dt)
        if ra_slots and any(rp is not None for rp in rrow_pieces):
            parts = [
                Rrow[:, k * W : (k + 1) * W]
                + (rrow_pieces[k] if rrow_pieces[k] is not None else 0.0)
                for k in range(nRA)
            ]
            Rrow = (
                jnp.concatenate(parts, axis=1) if len(parts) > 1
                else parts[0]
            )
        return Rtot, Rrow

    def chain_column(c_idx, Kbar, G, acc, yws, xbar_acc, nxbar):
        """Backprop one base-kernel column's cotangent to X̄/Ȳ (writes
        the Ȳ row into yscr); mirrors fused_gram._bwd_fused_kernel."""
        ab = accbar_of(Kbar, G, acc)
        if norms:
            nxbar = nxbar - 0.5 * ab
            nybars = [
                -0.5 * jnp.sum(
                    ab[h * Lp : (h + 1) * Lp], axis=0, keepdims=True
                )
                for h in range(sy)
            ]
        yrow_parts = []
        new_xbar = []
        for dd in range(d):
            xb = xbar_acc[:, dd * W : (dd + 1) * W] + ab * yws[dd]
            new_xbar.append(xb)
            GX = ab * xcols_s[dd]
            for h in range(sy):
                yb = jnp.sum(
                    GX[h * Lp : (h + 1) * Lp], axis=0, keepdims=True
                )
                if norms:
                    yb = yb + 2.0 * yws[dd][h * Lp : h * Lp + 1] * nybars[h]
                red = yb[:, :_LANE]
                for b in range(1, bx):
                    red = red + yb[:, b * _LANE : (b + 1) * _LANE]
                yrow_parts.append(red)
        yscr[pl.ds(c_idx, 1), :] = jnp.concatenate(yrow_parts, axis=1)
        return jnp.concatenate(new_xbar, axis=1), nxbar

    def rev_body(t, carry):
        (K_hi, acc_hi, yws_hi, Tcat, RA, Rtot, Rrow, colDbar_prev,
         xbar_acc, nxbar) = carry
        jj = ncols - 1 - t
        G_lo, acc_lo, yws_lo = kcol(jj)
        if difference:
            Mcol = mcol_of(K_hi, G_lo)
        else:
            Mcol = mcol_of(None, G_lo)
        cur_all, Tcat, RA, Eparts, SLcols = reconstruct(
            Mcol, Tcat, RA, False
        )
        Mbar, rtp, rrp = adjoint_column(Mcol, cur_all, Eparts, SLcols, RA,
                                        Rtot, Rrow)
        Rtot, Rrow = apply_reverse_updates(Rtot, Rrow, rtp, rrp)
        if difference:
            colDbar = _mxu_dot(Dm.T, Mbar, mxu, "right").astype(dt)
            Kbar_hi = colDbar - colDbar_prev
            xbar_acc, nxbar = chain_column(
                jj + 1, Kbar_hi, K_hi, acc_hi, yws_hi, xbar_acc, nxbar
            )
            return (G_lo, acc_lo, tuple(yws_lo), Tcat, RA, Rtot, Rrow,
                    colDbar, xbar_acc, nxbar)
        Kbar = rowmask * Mbar
        xbar_acc, nxbar = chain_column(
            jj, Kbar, G_lo, acc_lo, yws_lo, xbar_acc, nxbar
        )
        return (K_hi, acc_hi, yws_hi, Tcat, RA, Rtot, Rrow, colDbar_prev,
                xbar_acc, nxbar)

    xbar0 = jnp.zeros((Lq, d * W), dt)
    nxbar0 = jnp.zeros((Lq, W), dt)
    Rtot0 = jnp.zeros((Lq, nT * W), dt)
    Rrow0 = jnp.zeros((Lq, nRA * W), dt)
    colD0 = jnp.zeros((Lq, W), dt)
    if difference:
        Kend, acc_end, yws_end = kcol(L - 1)
    else:
        Kend = acc_end = jnp.zeros((1, 1), dt)
        yws_end = [jnp.zeros((1, 1), dt)] * d
    carry0 = (Kend, acc_end, tuple(yws_end), Tend, RAend, Rtot0, Rrow0,
              colD0, xbar0, nxbar0)
    (K_last, acc_last, yws_last, _, _, _, _, colDbar_last, xbar_acc,
     nxbar) = jax.lax.fori_loop(0, ncols, rev_body, carry0)
    if difference:
        # column c = 0: K̄(0) = −colD̄(0)
        xbar_acc, nxbar = chain_column(
            0, -colDbar_last, K_last, acc_last, yws_last, xbar_acc, nxbar
        )

    def fold(A):
        out = A[:Lp]
        for h in range(1, sy):
            out = out + A[h * Lp : (h + 1) * Lp]
        return out

    for dd in range(d):
        xb = xbar_acc[:, dd * W : (dd + 1) * W]
        if norms:
            xb = xb + 2.0 * xcols_s[dd] * nxbar
        xred = _mxu_dot(fold(xb), Eb.T, mxu, "left").astype(dt)  # [Lp, bx]
        xb_ref[0, 0, :, dd * bx : (dd + 1) * bx] = xred
    yb_ref[0, 0] = yscr[...]


def fused_gram_ho_bwd_pallas(X, Y, g, num_levels, order, kind="rbf",
                             difference=True, interpret=False, mxu=None,
                             bx=None):
    """(X̄, Ȳ) from level-sum cotangents g [nl+1, N1, N2]; same tiling
    as the forward. The default bx is small (2): the reverse sweep keeps
    ~3× the forward's VMEM working set resident."""
    if mxu is None:
        mxu = _default_mxu()
    if bx is None:
        bx = 2
    Xpk, Yt, dm = _prep_xy(X, Y, kind, bx)
    L, d, dy = dm["L"], dm["d"], dm["dy"]
    Lp, sy, N1p, N2p = dm["Lp"], dm["sy"], dm["N1p"], dm["N2p"]
    N1, N2 = dm["N1"], dm["N2"]
    gp = jnp.zeros((N1p, _LEVROWS, N2p), X.dtype)
    gp = gp.at[:N1, : num_levels + 1, :N2].set(
        jnp.moveaxis(g, 0, 1).astype(X.dtype)
    )
    nbi, nbj = N1p // bx, N2p // (sy * _LANE)
    xb, yb = pl.pallas_call(
        functools.partial(
            _ho_bwd_kernel, L=L, d=d, num_levels=num_levels, order=order,
            kind=kind, difference=difference, bx=bx, sy=sy, mxu=mxu,
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
            pl.BlockSpec((1, 1, L, d * sy * _LANE),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nbj, nbi, Lp, d * bx), X.dtype),
            jax.ShapeDtypeStruct((nbi, nbj, L, d * sy * _LANE), X.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((L, d * sy * _LANE), X.dtype)],
        interpret=interpret,
    )(Xpk, Yt, gp)
    xbar = jnp.sum(xb, axis=0).reshape(nbi, Lp, d, bx)
    xbar = xbar.transpose(0, 3, 1, 2).reshape(N1p, Lp, d)[:N1, :L]
    ybar = jnp.sum(yb, axis=0).reshape(nbj, L, d, sy, _LANE)
    ybar = ybar.transpose(0, 3, 4, 1, 2).reshape(N2p, L, d)[:N2]
    return xbar, ybar
