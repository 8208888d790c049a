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
