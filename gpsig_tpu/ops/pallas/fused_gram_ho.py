"""Fully-fused signature Gram for the GENERAL configuration space:
order >= 2, difference=False, and Poly/Cosine bases — nothing O(N²L²)
ever touches HBM (VERDICT r3 "What's missing #1").

Reference parity: ``gpsig/signature_algs.py::signature_kern_higher_order
(~L80)`` and the ``SignaturePoly``/``SignatureCosine`` subclasses
(SURVEY.md §2.1) — the configurations the tuned order-1 kernel
(``fused_gram.py``) cannot take. That kernel requires order==1,
difference==True and an RBF/Linear base; every other configuration used
to fall back to ``sig_gram.py``, which fuses only the per-pair DP and
still needs the [N², L, L] increment tensor built by XLA in HBM — i.e.
order-2 at N=800 hits exactly the 51 GB wall the fused design removes.

Design: the same column-streaming layout as ``fused_gram.py`` (bx
x-sequences lane-packed against sy sublane-stacked 128-lane y-blocks,
base-kernel columns built in VMEM), but the per-column DP carries the
*run-length-indexed* states of the higher-order recursion
(``ops/signature.py::_higher_order``):

    level m, grid (r, s) = run lengths (r+1, s+1), state D_m[r][s][i, j].

Streaming over columns j, the exclusive cumsums decompose into three
kinds of work, all on the MXU or pure VPU:

  - ``ecumsum2(total)``   → carry T_m[i]    = Σ_{j'<j} Σ_{rs} D_m[rs][i,j']
                            and one batched SL·Tcat matmul per column;
  - ``ecumsum(row, -1)``  → carry RowAcc_m[q][i] = Σ_{j'<j} Σ_s D_m[q][s][i,j']
                            (no matmul — it is already the running sum);
  - ``ecumsum(col, -2)``  → SL·(Σ_s Dcur_m[s][q]) on the *current*
                            column — one batched matmul per level,
                            sequential in m (the recursion's depth).

Level sums for m < num_levels read off the final T_m (it is the running
total the DP needs anyway); level ``num_levels`` carries one extra
accumulator. order==1 degenerates to the first-order recursion (p=1:
only the (0,0) state exists, RowAcc disappears) — this kernel is the
*general* engine and ``fused_gram.py`` stays the speed-tuned
specialization for its (order-1, difference, RBF/Linear) fast path.

Base kinds (static ``kind``):
  - 'linear':  G = Σ_d x·y                     (raw FMA accumulation)
  - 'rbf':     G = exp(−½‖x‖² −½‖y‖² + Σ x·y)  (norms packed as an extra
               data channel by the wrapper — the VPU-floor lever)
  - 'polyK':   G = (Σ_d x·y)^K with the offset folded in as a constant
               channel (x_extra = 1, y_extra = c) by the *kernel layer*,
               so offset gradients flow through Ȳ's extra channel
  - 'cosine':  G = cos(√(max(−2·acc, 0) + ε)), acc as in 'rbf'

``difference``: True streams columns of the double-differenced
increment matrix (Dm·ΔK, L−1 columns); False streams the raw base-Gram
columns (L columns) with a sublane row mask so zero-padding stays exact
for the non-vanishing-at-zero kinds (RBF/Cosine).

Backward: fully-fused reverse column sweep (``fused_gram_ho_bwd_pallas``)
on TPU backends — forward states are reconstructed by subtraction
(T_m(j) = T_m(j+1) − Σ_rs Dcur_m[rs](j), resolvable ascending m), the
adjoint runs the reverse transitions with two reverse accumulators per
level (Rtot_m for the ecumsum2 chain, Rrow_m[q] for the row-cumsum
chain), and M̄ chains to X̄/Ȳ through the shared column machinery.
Row-blocked XLA recompute on CPU.
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
    _dmat_blk,
    _mxu_dot,
    _round_up,
    _sl_blk,
)

_KINDS = ("linear", "rbf", "cosine")  # + 'poly<degree>'


def _kind_params(kind):
    """(packs_norms, degree). degree is None unless kind is 'poly<K>'."""
    if kind in ("rbf", "cosine"):
        return True, None
    if kind == "linear":
        return False, None
    if kind.startswith("poly"):
        return False, int(kind[4:])
    raise ValueError(f"unknown base kind {kind!r}")


def _existing_states(num_levels, order):
    """Mirror ops/signature.py::_higher_order's None-tracking: the set of
    (r, s) grid positions with a live state at each level 1..num_levels."""
    p = min(max(order, 1), num_levels)
    live = [{(0, 0)}]
    cur = {(0, 0)}
    for m in range(2, num_levels + 1):
        R = min(p, m)
        nxt = {(0, 0)}
        for r in range(1, R):
            if any((r - 1, s) in cur for s in range(p)):
                nxt.add((r, 0))
            if any((s, r - 1) in cur for s in range(p)):
                nxt.add((0, r))
        for r in range(1, R):
            for s in range(1, R):
                if (r - 1, s - 1) in cur:
                    nxt.add((r, s))
        live.append(nxt)
        cur = nxt
    return live, p


def _rowacc_slots(live, p, num_levels):
    """Static layout of the RowAcc carry: list of (level m, row q) pairs
    needed — level m+1's (r, 0) state reads RowAcc_m[r-1]."""
    slots = []
    for m in range(1, num_levels):  # source level (1-based), m <= nl-1
        R_next = min(p, m + 1)
        for r in range(1, R_next):
            q = r - 1
            if any((q, s) in live[m - 1] for s in range(p)):
                slots.append((m, q))
    return slots


def _ho_kernel(x_ref, y_ref, out_ref, *, L, d, num_levels, order, kind,
               difference, bx, sy, mxu):
    """x_ref: [1, Lp, d·bx]; y_ref: [L, dy, sy·128]; out: [bx, _LEVROWS,
    sy·128]. dy = d (+1 when norms are packed). Layout contracts are
    identical to fused_gram._fused_kernel (sy sublane-stacking with
    block-diagonal structural matrices)."""
    dt = x_ref.dtype
    Lp = x_ref.shape[1]
    W = bx * _LANE
    nl = num_levels
    Lq = sy * Lp
    norms, degree = _kind_params(kind)
    live, p = _existing_states(nl, order)
    ra_slots = _rowacc_slots(live, p, nl)
    nT = max(nl - 1, 1)

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
    nxc1 = -0.5 * nx1

    def kcol_stacked(jj):
        """Stacked base-kernel column [Lq, W] for all sy y-blocks."""
        g_rows = []
        for h in range(sy):
            if norms:
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
        if kind == "rbf":
            return jnp.exp(G)
        if kind == "cosine":
            return jnp.cos(jnp.sqrt(jnp.maximum(-2.0 * G, 0.0) + 1e-36))
        if degree is not None:
            out = G
            for _ in range(degree - 1):
                out = out * G
            return out
        return G

    SL = _sl_blk(Lp, sy, dt)
    if difference:
        Dm = _dmat_blk(Lp, L, sy, dt)
        ncols = L - 1
    else:
        ri = jax.lax.broadcasted_iota(jnp.int32, (Lq, W), 0) % Lp
        rowmask = (ri < L).astype(dt)
        ncols = L

    def mcol_at(jj, Kprev):
        """(Mcol, Knext). difference=True: Dm·(K[:,jj+1] − K[:,jj]);
        difference=False: row-masked raw column K[:, jj]."""
        if difference:
            Knext = kcol_stacked(jj + 1)
            return (
                _mxu_dot(Dm, Knext - Kprev, mxu, "right").astype(dt),
                Knext,
            )
        return rowmask * kcol_stacked(jj), Kprev

    def column_states(Mcol, Tcat, RA):
        """All levels' current-column states from the carries (exclusive
        in j by construction: Tcat/RA are pre-update). Returns
        cur[m-1] = {(r, s): [Lq, W]} for m = 1..nl."""
        if nl >= 2:
            E = _mxu_dot(SL, Tcat, mxu, "right").astype(dt)
        cur_all = [{(0, 0): Mcol}]
        for m in range(2, nl + 1):
            R = min(p, m)
            prev = cur_all[-1]
            cur = {
                (0, 0): Mcol * E[:, (m - 2) * W : (m - 1) * W]
            }
            for r in range(1, R):
                if (m - 1, r - 1) in ra_slots:
                    k = ra_slots.index((m - 1, r - 1))
                    cur[(r, 0)] = (Mcol / (r + 1)) * RA[
                        :, k * W : (k + 1) * W
                    ]
            # SL·(current column sums), batched over r within the level
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
                    SL, jnp.concatenate(cols, axis=1) if len(cols) > 1
                    else cols[0], mxu, "right",
                ).astype(dt)
                for i, r in enumerate(tags):
                    cur[(0, r)] = (Mcol / (r + 1)) * batched[
                        :, i * W : (i + 1) * W
                    ]
            for r in range(1, R):
                for s in range(1, R):
                    if (r - 1, s - 1) in prev:
                        cur[(r, s)] = (
                            Mcol / ((r + 1) * (s + 1))
                        ) * prev[(r - 1, s - 1)]
            cur_all.append(cur)
        return cur_all

    def body(jj, carry):
        Kprev, Tcat, RA, Snl = carry
        Mcol, Knext = mcol_at(jj, Kprev)
        cur_all = column_states(Mcol, Tcat, RA)
        # update carries (post-read: keeps the j-cumsums exclusive)
        tparts = []
        for m in range(1, nl):
            tot = None
            for v in cur_all[m - 1].values():
                tot = v if tot is None else tot + v
            tparts.append(Tcat[:, (m - 1) * W : m * W] + tot)
        if nl >= 2:
            Tcat = jnp.concatenate(tparts, axis=1) if len(
                tparts
            ) > 1 else tparts[0]
        raparts = []
        for k, (m, q) in enumerate(ra_slots):
            tot = None
            for s in range(p):
                v = cur_all[m - 1].get((q, s))
                if v is not None:
                    tot = v if tot is None else tot + v
            raparts.append(RA[:, k * W : (k + 1) * W] + tot)
        if raparts:
            RA = jnp.concatenate(raparts, axis=1) if len(
                raparts
            ) > 1 else raparts[0]
        totnl = None
        for v in cur_all[nl - 1].values():
            totnl = v if totnl is None else totnl + v
        Snl = Snl + totnl
        return Knext, Tcat, RA, Snl

    K0 = kcol_stacked(0) if difference else jnp.zeros((1, 1), dt)
    Tcat0 = jnp.zeros((Lq, nT * W), dt)
    RA0 = jnp.zeros((Lq, max(len(ra_slots), 1) * W), dt)
    Snl0 = jnp.zeros((Lq, W), dt)
    _, Tcat, _, Snl = jax.lax.fori_loop(
        0, ncols, body, (K0, Tcat0, RA0, Snl0)
    )

    def halfsums(A):
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
            levrow == m, halfsums(Tcat[:, (m - 1) * W : m * W]), 0.0
        )
    acc = acc + jnp.where(levrow == nl, halfsums(Snl), 0.0)
    for b in range(bx):
        out_ref[b] = jnp.concatenate(
            [
                acc[:, h * W + b * _LANE : h * W + (b + 1) * _LANE]
                for h in range(sy)
            ],
            axis=1,
        )


def _state_array_count(num_levels, order, d):
    """Rough VMEM working-set size in [Lq, W] array units (carries +
    transient column states + x data), used to pick bx."""
    live, p = _existing_states(num_levels, order)
    nstates = max(len(lv) for lv in live)
    nra = len(_rowacc_slots(live, p, num_levels))
    return (num_levels - 1) + nra + 2 + 2 * nstates + 2 * d + 2


def _pick_bx(num_levels, order, d, L, budget_bytes=6 * 2**20):
    Lp = _round_up(L, 8)
    sy = max(1, _LANE // Lp)
    per_lane_block = _state_array_count(num_levels, order, d) * (
        sy * Lp
    ) * _LANE * 4
    bx = 8
    while bx > 1 and bx * per_lane_block > budget_bytes:
        bx //= 2
    return bx


def _prep_xy(X, Y, kind, bx):
    """Shared input packing: pad/stack X, transpose Y, pack norm or
    offset channels per kind. Returns (Xpk, Yt, dims dict)."""
    norms, _ = _kind_params(kind)
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
    Yt = jnp.moveaxis(Y, 0, -1)  # [L, d, N2]
    dy = d
    if norms:
        cy = -0.5 * jnp.sum(Y * Y, -1).T[:, None, :]  # [L, 1, N2]
        Yt = jnp.concatenate([Yt, cy.astype(Y.dtype)], axis=1)
        dy = d + 1
    if N2p != N2:
        Yt = jnp.pad(Yt, ((0, 0), (0, 0), (0, N2p - N2)))
    return Xpk, Yt, dict(N1=N1, N2=N2, L=L, d=d, dy=dy, Lp=Lp, sy=sy,
                         N1p=N1p, N2p=N2p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def fused_gram_ho_levels(X, Y, num_levels, order, kind="rbf",
                         difference=True, interpret=False, bx=None,
                         mxu=None):
    """[nl+1, N1, N2] per-level signature kernels, fully fused, for any
    order / difference / base kind (see module docstring).

    X: [N1, L, d], Y: [N2, L, d] pre-scaled sequences. For 'poly<K>' the
    caller must already have appended the constant offset channel
    (x_extra = 1, y_extra = offset) — see kernels/signature.py."""
    return _ho_fwd_impl(X, Y, num_levels, order, kind, difference,
                        interpret, bx, mxu)


def _ho_fwd_impl(X, Y, num_levels, order, kind, difference, interpret,
                 bx=None, mxu=None):
    if mxu is None:
        mxu = _default_mxu()
    if num_levels + 1 > _LEVROWS:
        raise ValueError("fused kernel supports num_levels <= 7")
    if bx is None:
        bx = _pick_bx(num_levels, order, X.shape[-1], X.shape[-2])
    Xpk, Yt, dm = _prep_xy(X, Y, kind, bx)
    L, d, dy = dm["L"], dm["d"], dm["dy"]
    Lp, sy, N1p, N2p = dm["Lp"], dm["sy"], dm["N1p"], dm["N2p"]
    live, p = _existing_states(num_levels, order)
    out = pl.pallas_call(
        functools.partial(
            _ho_kernel, L=L, d=d, num_levels=num_levels, order=order,
            kind=kind, difference=difference, bx=bx, sy=sy, mxu=mxu,
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
            * max(num_levels - 1, 1) * (p + 1),
            bytes_accessed=4 * (N1p * L * d + L * dy * N2p
                                + N1p * _LEVROWS * N2p),
            transcendentals=N1p * N2p * L * L if kind != "linear" else 0,
        ),
    )(Xpk, Yt)
    return jnp.moveaxis(out[: dm["N1"], : num_levels + 1, : dm["N2"]],
                        1, 0)


def _xla_reference_ho(X, Y, num_levels, order, kind, difference):
    """Mathematically identical XLA path (CPU VJP route + test oracle).

    Squared distances deliberately unclamped to match the fused forward
    (see fused_gram._xla_reference)."""
    N1, L, d = X.shape
    N2 = Y.shape[0]
    a = X.reshape(N1 * L, d)
    b = Y.reshape(N2 * L, d)
    dot = jnp.matmul(a, b.T, precision="highest")
    if kind in ("rbf", "cosine"):
        na = jnp.sum(a * a, -1)
        nb = jnp.sum(b * b, -1)
        acc = -0.5 * na[:, None] - 0.5 * nb[None, :] + dot
        if kind == "rbf":
            G = jnp.exp(acc)
        else:
            G = jnp.cos(jnp.sqrt(jnp.maximum(-2.0 * acc, 0.0) + 1e-36))
    elif kind == "linear":
        G = dot
    else:
        _, degree = _kind_params(kind)
        G = dot**degree
    G = G.reshape(N1, L, N2, L).transpose(0, 2, 1, 3)
    M = sigops.incremental_gram(G) if difference else G
    return sigops.signature_kern(M, num_levels, order=order)


_BWD_ROW_BLOCK = 64


def _ho_vjp_fwd(X, Y, num_levels, order, kind, difference, interpret, bx,
                mxu):
    return (
        _ho_fwd_impl(X, Y, num_levels, order, kind, difference,
                     interpret, bx, mxu),
        (X, Y),
    )


def _ho_vjp_bwd(num_levels, order, kind, difference, interpret, bx, mxu,
                res, g):
    X, Y = res
    if not interpret and jax.default_backend() not in ("cpu",):
        from gpsig_tpu.ops.pallas.fused_gram_ho_bwd import (
            fused_gram_ho_bwd_pallas,
        )

        return fused_gram_ho_bwd_pallas(
            X, Y, g, num_levels, order, kind, difference, interpret, mxu
        )
    # row-blocked XLA recompute (CPU / interpret): bounded-memory exact VJP
    N1 = X.shape[0]
    rb = _BWD_ROW_BLOCK

    def f(x, y):
        return _xla_reference_ho(x, y, num_levels, order, kind, difference)

    if N1 <= rb:
        _, vjp = jax.vjp(f, X, Y)
        return vjp(g)
    pad = (-N1) % rb
    Xp = jnp.concatenate([X, jnp.zeros((pad,) + X.shape[1:], X.dtype)])
    gp = jnp.concatenate(
        [g, jnp.zeros(g.shape[:1] + (pad,) + g.shape[2:], g.dtype)],
        axis=1,
    )
    xblocks = Xp.reshape(-1, rb, *X.shape[1:])
    gblocks = jnp.moveaxis(
        gp.reshape(g.shape[0], -1, rb, g.shape[2]), 1, 0
    )

    def block_vjp(args):
        xb, gb = args
        _, vjp = jax.vjp(f, xb, Y)
        return vjp(gb)

    xbar_blocks, ybar_blocks = jax.lax.map(block_vjp, (xblocks, gblocks))
    xbar = xbar_blocks.reshape(-1, *X.shape[1:])[:N1]
    return xbar, jnp.sum(ybar_blocks, axis=0)


fused_gram_ho_levels.defvjp(_ho_vjp_fwd, _ho_vjp_bwd)
