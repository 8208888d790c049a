"""Pallas TPU wavefront kernel for the Goursat (signature-PDE) solve.

TPU-native equivalent of the reference fork's CUDA wavefront solver
(SURVEY.md §2.2: one block per sequence pair, threads sweeping
antidiagonals). Here the sweep is expressed in the *skewed* layout built by
``gpsig_tpu.ops.goursat.skewpad_diag_major`` — diagonal d of the solution
grid is a lane vector — and the kernel iterates diagonals in the Pallas
grid:

- grid = (pair_blocks, S+T-1): the second axis streams skewed-increment
  diagonals from HBM (Pallas double-buffers them automatically); the input
  is laid out diagonal-major [D, B, S+1] so each block is one diagonal of
  a pair block;
- the two wavefront carries (diagonals d-1, d-2) live in VMEM scratch and
  persist across grid steps (TPU grids execute sequentially);
- the lane-shift u[i-1] is a static pad+slice (no roll primitive needed);
- only the corner u(S, T) per pair is written out.

The backward pass reuses the adjoint-PDE reverse sweep of
``gpsig_tpu.ops.goursat`` (XLA scan) — the forward solve dominates SVGP
prediction/training cost because Kuu/Kuf/Kdiag all need it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpsig_tpu.ops.pallas.fused_gram import _mxu_dot

_LANE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(sk_ref, out_ref, prev_ref, prev2_ref, *, S, T, Sp):
    """sk_ref: [1, bb, Sp] — one skewed-increment diagonal for bb pairs;
    out_ref: [bb, _LANE] corner output; scratch [bb, Sp] carries."""
    d_idx = pl.program_id(1)  # 0 .. S+T-2 ; diagonal d = d_idx + 2
    bb = prev_ref.shape[0]
    dt = prev_ref.dtype
    i_lane = jax.lax.broadcasted_iota(jnp.int32, (bb, Sp), 1)

    @pl.when(d_idx == 0)
    def _init():
        # diag 0: u[0,0]=1 ; diag 1: u[0,1]=u[1,0]=1
        prev2_ref[...] = jnp.where(i_lane == 0, jnp.asarray(1.0, dt), 0.0)
        d1 = jnp.where(i_lane == 0, jnp.asarray(1.0 if T >= 1 else 0.0, dt),
                       0.0)
        if S >= 1:
            d1 = jnp.where(i_lane == 1, jnp.asarray(1.0, dt), d1)
        prev_ref[...] = d1

    d = d_idx + 2
    prev = prev_ref[...]
    prev2 = prev2_ref[...]
    acol = sk_ref[0]
    prev_sh = _shift1(prev)
    prev2_sh = _shift1(prev2)
    upd = prev + prev_sh - prev2_sh + acol * (prev + prev_sh) * 0.5
    interior = (i_lane >= jnp.maximum(1, d - T)) & (
        i_lane <= jnp.minimum(S, d - 1)
    )
    curr = jnp.where(interior, upd, jnp.asarray(0.0, dt))
    curr = jnp.where((i_lane == 0) & (d <= T), jnp.asarray(1.0, dt), curr)
    curr = jnp.where(i_lane == d, jnp.asarray(1.0, dt), curr)
    prev2_ref[...] = prev
    prev_ref[...] = curr

    @pl.when(d_idx == S + T - 2)
    def _emit():
        lane = jax.lax.broadcasted_iota(jnp.int32, (bb, _LANE), 1)
        corner = jnp.sum(
            jnp.where(i_lane == S, curr, jnp.asarray(0.0, dt)),
            axis=1, keepdims=True,
        )
        out_ref[...] = jnp.where(lane == 0, corner, 0.0)


def goursat_corner_pallas(skew, S, T, block_pairs=8, interpret=False):
    """Corner u(S,T) for a batch of skewed increment grids.

    skew: [B, S+T-1, S+1] diag-major skewed increments (from
    goursat.skewpad_diag_major); returns [B]."""
    B = skew.shape[0]
    D = S + T - 1
    Sp = _round_up(S + 1, _LANE)
    if skew.shape[-1] != Sp:
        skew = jnp.pad(skew, ((0, 0), (0, 0), (0, Sp - skew.shape[-1])))
    bb = block_pairs
    Bp = _round_up(B, bb)
    if Bp != B:
        skew = jnp.pad(skew, ((0, Bp - B), (0, 0), (0, 0)))
    skew_dm = jnp.moveaxis(skew, 1, 0)  # [D, Bp, Sp]
    out = pl.pallas_call(
        functools.partial(_kernel, S=S, T=T, Sp=Sp),
        grid=(Bp // bb, D),
        in_specs=[
            pl.BlockSpec((1, bb, Sp), lambda b, d: (d, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, _LANE), lambda b, d: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, _LANE), skew.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, Sp), skew.dtype),
            pltpu.VMEM((bb, Sp), skew.dtype),
        ],
        interpret=interpret,
    )(skew_dm)
    return out[:B, 0]


def _shift1(x):
    """x[..., i] -> x[..., i-1] with zero fill (lane shift via pad+slice)."""
    pad = jnp.zeros_like(x[:, :1])
    return jnp.concatenate([pad, x[:, :-1]], axis=1)


def _shift_up(x):
    """x[..., i] -> x[..., i+1] with zero fill."""
    pad = jnp.zeros_like(x[:, :1])
    return jnp.concatenate([x[:, 1:], pad], axis=1)


# ---------------------------------------------------------------------------
# Fused forward + adjoint with in-kernel dyadic refinement.
#
# The reference's CUDA gradient op launches a SECOND wavefront solving the
# adjoint Goursat PDE (SURVEY.md §2.2/§3.4) — it never differentiates
# through the forward sweep. These kernels are the TPU equivalent, one step
# further: they stream the *unrefined* skewed increment grid from HBM and
# expand it to the dyadic-refined grid inside VMEM (a structural 0/1
# expansion matmul per diagonal), so
#
#   * HBM traffic is independent of ``dyadic_order`` (the refined grid —
#     4^order × the data — never exists outside VMEM), and
#   * the backward pass saves only the unrefined increments as residuals:
#     it re-runs the forward wavefront into a VMEM scratch holding all
#     refined u-diagonals, then sweeps the adjoint recursion backwards,
#     accumulating gradients directly in *unrefined* coordinates.
#
# Coordinates: refined cell (I, J) = unrefined (I>>o, J>>o) with value
# inc[I>>o, J>>o] / f², f = 2^o. On refined antidiagonal c = I + J the
# unrefined source diagonal I1 + J1 takes exactly two values
# {c>>o, (c>>o) - 1} (selected per-lane by (I % f) + (J % f) < f), so each
# refined diagonal needs two unrefined skew columns — passed as two input
# refs over the same array with different block index maps.
# ---------------------------------------------------------------------------


def _expand_mat(Sp_u, Sp_r, lg, dtype):
    """E[i1, i] = 1 iff i1 == ((i-1) >> lg) + 1 — lane expansion of an
    unrefined skew column to refined positions (col[(i-1)//f + 1])."""
    i1 = jax.lax.broadcasted_iota(jnp.int32, (Sp_u, Sp_r), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (Sp_u, Sp_r), 1)
    return (i1 == ((i - 1) >> lg) + 1).astype(dtype)


def _refined_col(colA, colB, c, lg, S, T, Sp_r, E, dt):
    """Refined skew column c (acol[i] = inc_r[i-1, c-(i-1)], zero outside
    valid cells) from the two unrefined columns colA (diag c>>lg) and colB
    (diag (c>>lg)-1). colA/colB: [bb, Sp_u]."""
    bb = colA.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (bb, Sp_r), 1)
    I = i - 1
    J = c - I
    valid = (I >= 0) & (I < S) & (J >= 0) & (J < T)
    if lg == 0:
        return jnp.where(valid, colA[:, :Sp_r], jnp.asarray(0.0, dt))
    f = 1 << lg
    rsum = (I % f) + (J % f)
    # the expansion is a gather through a one-hot matrix: the data operand
    # must keep full f32 precision (a DEFAULT 1-pass bf16 matmul rounds the
    # increments to 8 mantissa bits → 4e-3 kernel error, measured on-chip)
    expA = _mxu_dot(colA, E, "highest", "left").astype(dt)
    expB = _mxu_dot(colB, E, "highest", "left").astype(dt)
    inv_f2 = 1.0 / (f * f)
    out = jnp.where(rsum < f, expA, expB) * inv_f2
    return jnp.where(valid, out, jnp.asarray(0.0, dt))


def _col_index_maps(D, lg, max_col, two_phase):
    """Block index maps for the two unrefined skew operands.

    Grid axis g enumerates forward steps (diag d = g+2, refined column
    c = g) and — when ``two_phase`` — adjoint steps (k = g-(D-1), μ diag
    d = D-k, refined column c = d-1 = 2D-2-g, clamped into range; the k=0
    step consumes no column)."""

    def cm(g):
        if not two_phase:
            return g
        return jnp.where(g <= D - 2, g, jnp.minimum(2 * D - 2 - g, D - 2))

    def idxA(b, g):
        return (jnp.clip(cm(g) >> lg, 0, max_col), b, 0)

    def idxB(b, g):
        return (jnp.clip((cm(g) >> lg) - 1, 0, max_col), b, 0)

    return idxA, idxB


def _fwd_update(prev, prev2, acol, d, S, T, dt):
    """One forward wavefront step: u diagonal d from diagonals d-1, d-2."""
    bb, Sp = prev.shape
    i_lane = jax.lax.broadcasted_iota(jnp.int32, (bb, Sp), 1)
    prev_sh = _shift1(prev)
    prev2_sh = _shift1(prev2)
    upd = prev + prev_sh - prev2_sh + acol * (prev + prev_sh) * 0.5
    interior = (i_lane >= jnp.maximum(1, d - T)) & (
        i_lane <= jnp.minimum(S, d - 1)
    )
    curr = jnp.where(interior, upd, jnp.asarray(0.0, dt))
    curr = jnp.where((i_lane == 0) & (d <= T), jnp.asarray(1.0, dt), curr)
    curr = jnp.where(i_lane == d, jnp.asarray(1.0, dt), curr)
    return curr


def _fused_kernel(colA_ref, colB_ref, out_ref, prev_ref, prev2_ref,
                  *maybe_uall, S, T, lg, Sp_r, Sp_u, with_grad, Du_cols):
    """Forward wavefront (+ optional adjoint sweep with gradient
    accumulation in unrefined coordinates).

    colA/colB: [1, bb, Sp_u] unrefined skew columns; out_ref:
    [bb, _LANE] corner (with_grad=False) or [Du_cols, bb, Sp_u] skewed
    unrefined gradient (with_grad=True); uall_ref: [D+1, bb, Sp_r] all u
    diagonals (with_grad only; also doubles as the μ carry store)."""
    uall_ref = maybe_uall[0] if maybe_uall else None
    D = S + T
    g = pl.program_id(1)
    bb = prev_ref.shape[0]
    dt = prev_ref.dtype
    i_lane = jax.lax.broadcasted_iota(jnp.int32, (bb, Sp_r), 1)
    E = (
        _expand_mat(Sp_u, Sp_r, lg, dt) if lg > 0 else None
    )

    @pl.when(g == 0)
    def _init():
        d0 = jnp.where(i_lane == 0, jnp.asarray(1.0, dt), 0.0)
        prev2_ref[...] = d0
        d1 = jnp.where(i_lane == 0, jnp.asarray(1.0 if T >= 1 else 0.0, dt),
                       0.0)
        if S >= 1:
            d1 = jnp.where(i_lane == 1, jnp.asarray(1.0, dt), d1)
        prev_ref[...] = d1
        if with_grad:
            uall_ref[0] = d0
            uall_ref[1] = d1
            out_ref[...] = jnp.zeros(out_ref.shape, dt)

    @pl.when(g <= D - 2)
    def _forward():
        d = g + 2
        acol = _refined_col(colA_ref[0], colB_ref[0], g, lg, S, T, Sp_r, E,
                            dt)
        curr = _fwd_update(prev_ref[...], prev2_ref[...], acol, d, S, T, dt)
        prev2_ref[...] = prev_ref[...]
        prev_ref[...] = curr
        if with_grad:
            uall_ref[pl.ds(d, 1)] = curr[None]

    if not with_grad:

        @pl.when(g == D - 2)
        def _emit_corner():
            lane = jax.lax.broadcasted_iota(jnp.int32, (bb, _LANE), 1)
            corner = jnp.sum(
                jnp.where(i_lane == S, prev_ref[...], jnp.asarray(0.0, dt)),
                axis=1, keepdims=True,
            )
            out_ref[...] = jnp.where(lane == 0, corner, 0.0)

        return

    # ---- adjoint phase: g = D-1 .. 2D-3, step k = g-(D-1) ----------------
    @pl.when(g == D - 1)
    def _adj_init():
        # μ diag D: the seed ḡ=1 at μ[S, T] (position i = S); μ diag D+1 = 0
        prev_ref[...] = jnp.where(i_lane == S, jnp.asarray(1.0, dt), 0.0)
        prev2_ref[...] = jnp.zeros_like(prev2_ref)

    @pl.when(g >= D - 1)
    def _adjoint():
        k = g - (D - 1)
        d = D - k  # μ diagonal now current

        @pl.when(k > 0)
        def _mu_step():
            c = d - 1  # refined skew column feeding the μ update
            acol = _refined_col(colA_ref[0], colB_ref[0], c, lg, S, T,
                                Sp_r, E, dt)
            a_up = _shift_up(acol)
            mu1 = prev_ref[...]  # μ diag d+1
            mu2 = prev2_ref[...]  # μ diag d+2
            mu1_up = _shift_up(mu1)
            mu2_up = _shift_up(mu2)
            upd = (
                -mu2_up
                + mu1 * (1.0 + 0.5 * acol)
                + mu1_up * (1.0 + 0.5 * a_up)
            )
            interior = (i_lane >= jnp.maximum(1, d - T)) & (
                i_lane <= jnp.minimum(S, d - 1)
            )
            curr = jnp.where(interior, upd, jnp.asarray(0.0, dt))
            prev2_ref[...] = mu1
            prev_ref[...] = curr

        # emit gradient for refined diagonal c_e = d-2 (cells I+J = c_e):
        #   ∂corner/∂inc_r[I, J] = μ[I+1, J+1]·(u[I+1, J] + u[I, J+1])/2
        # μ[I+1, J+1] = current μ diag at position i = I+1; both u terms
        # live on diagonal d-1.
        c_e = d - 2
        mu_curr = prev_ref[...]
        u_prev = uall_ref[pl.ds(d - 1, 1)][0]
        gradcol = mu_curr * (u_prev + _shift1(u_prev)) * 0.5
        I = i_lane - 1
        J = c_e - I
        valid = (I >= 0) & (I < S) & (J >= 0) & (J < T)
        gradcol = jnp.where(valid, gradcol, jnp.asarray(0.0, dt))
        if lg == 0:
            out_ref[pl.ds(c_e, 1)] += gradcol[None, :, :Sp_u]
        else:
            f = 1 << lg
            inv_f2 = 1.0 / (f * f)
            rsum = (I % f) + (J % f)
            maskA = (rsum < f).astype(dt)
            qqA = jnp.clip(c_e >> lg, 0, Du_cols - 1)
            qqB = jnp.clip((c_e >> lg) - 1, 0, Du_cols - 1)
            ET = E.T  # [Sp_r, Sp_u]
            contribA = _mxu_dot(gradcol * maskA, ET, "highest",
                                "left").astype(dt) * inv_f2
            contribB = _mxu_dot(gradcol * (1.0 - maskA), ET, "highest",
                                "left").astype(dt) * inv_f2
            out_ref[pl.ds(qqA, 1)] += contribA[None]
            out_ref[pl.ds(qqB, 1)] += contribB[None]


def _fused_call(skewU, Su, Tu, dyadic_order, block_pairs, interpret,
                with_grad):
    """Shared pallas_call builder. skewU: [B, Su+Tu-1, Su+1] diag-major
    unrefined skew (goursat.skewpad_diag_major)."""
    B = skewU.shape[0]
    lg = dyadic_order
    f = 1 << lg
    S, T = Su * f, Tu * f
    D = S + T
    Du_cols = Su + Tu - 1
    Sp_r = _round_up(S + 1, _LANE)
    Sp_u = _round_up(Su + 1, _LANE)
    if skewU.shape[-1] != Sp_u:
        skewU = jnp.pad(
            skewU, ((0, 0), (0, 0), (0, Sp_u - skewU.shape[-1]))
        )
    bb = block_pairs
    Bp = _round_up(B, bb)
    if Bp != B:
        skewU = jnp.pad(skewU, ((0, Bp - B), (0, 0), (0, 0)))
    skew_dm = jnp.moveaxis(skewU, 1, 0)  # [Du_cols, Bp, Sp_u]
    n_steps = (D - 1) + (D - 1) * int(with_grad)
    idxA, idxB = _col_index_maps(D, lg, Du_cols - 1, with_grad)
    in_specs = [
        pl.BlockSpec((1, bb, Sp_u), idxA, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, Sp_u), idxB, memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((bb, Sp_r), skewU.dtype),
        pltpu.VMEM((bb, Sp_r), skewU.dtype),
    ]
    if with_grad:
        scratch.append(pltpu.VMEM((D + 1, bb, Sp_r), skewU.dtype))
        out_spec = pl.BlockSpec((Du_cols, bb, Sp_u), lambda b, g: (0, b, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Du_cols, Bp, Sp_u), skewU.dtype)
    else:
        scratch.append(None)
        out_spec = pl.BlockSpec((bb, _LANE), lambda b, g: (b, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Bp, _LANE), skewU.dtype)
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, S=S, T=T, lg=lg, Sp_r=Sp_r, Sp_u=Sp_u,
            with_grad=with_grad, Du_cols=Du_cols,
        ),
        grid=(Bp // bb, n_steps),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[s for s in scratch if s is not None],
        interpret=interpret,
    )(skew_dm, skew_dm)
    if with_grad:
        return jnp.moveaxis(out, 0, 1)[:B]  # [B, Du_cols, Sp_u]
    return out[:B, 0]


def goursat_corner_fused(skewU, Su, Tu, dyadic_order, block_pairs=8,
                         interpret=False):
    """Corner u(S·f, T·f) of the dyadically refined Goursat solve, from the
    *unrefined* diag-major skew [B, Su+Tu-1, Su+1]. Returns [B]."""
    return _fused_call(skewU, Su, Tu, dyadic_order, block_pairs, interpret,
                       with_grad=False)


def goursat_grad_fused(skewU, Su, Tu, dyadic_order, block_pairs=8,
                       interpret=False):
    """∂u(corner)/∂inc in *unrefined* coordinates, computed by a forward
    wavefront recompute into VMEM + the adjoint-PDE reverse sweep (the
    reference CUDA op's gradient strategy). Returns the skewed gradient
    [B, Su+Tu-1, Sp_u] with grad[b, I+J, I+1] = ∂corner_b/∂inc_b[I, J];
    unskew with :func:`gpsig_tpu.ops.goursat.unskew_grad`."""
    return _fused_call(skewU, Su, Tu, dyadic_order, block_pairs, interpret,
                       with_grad=True)


def fused_grad_vmem_bytes(Su, Tu, dyadic_order, block_pairs=8):
    """VMEM footprint of the gradient kernel's bb-scaled allocations: the
    u-diagonal store PLUS the skewed-gradient output block
    (Du_cols·bb·Sp_u — comparable to the u-store at refined shapes; the
    round-5 ERing joint solve compile-OOM'd at 16.13M/16M because the
    estimate omitted it) and the two wavefront carries."""
    f = 1 << dyadic_order
    D = (Su + Tu) * f
    Sp_r = _round_up(Su * f + 1, _LANE)
    Sp_u = _round_up(Su + 1, _LANE)
    bb = max(block_pairs, 8)
    u_store = (D + 1) * bb * Sp_r * 4
    out_blk = (Su + Tu - 1) * bb * Sp_u * 4
    carries = 2 * bb * Sp_r * 4
    return u_store + out_blk + carries
