"""Brute-force numpy oracles for the signature-kernel recursions.

These play the role of the reference's notebook sanity checks (SURVEY.md §4:
oracle comparison against explicit truncated signatures / naive DP). They are
deliberately slow and simple — direct enumeration of index tuples — so any
mismatch indicts the fast implementation.
"""

from __future__ import annotations

import itertools
import math

import numpy as np


def _tuples(L, m, max_mult):
    """Non-decreasing index tuples of length m over range(L), runs <= max_mult."""
    for tup in itertools.combinations_with_replacement(range(L), m):
        ok = True
        for _, grp in itertools.groupby(tup):
            if len(list(grp)) > max_mult:
                ok = False
                break
        if ok:
            yield tup


def _coeff(tup):
    c = 1.0
    for _, grp in itertools.groupby(tup):
        c /= math.factorial(len(list(grp)))
    return c


def sig_kernel_levels(M, num_levels, order=1):
    """Naive per-level signature kernel from increment matrix M [L1, L2].

    k_m = sum over non-decreasing (i, j) tuples (multiplicity <= order) of
    c(i) c(j) prod_a M[i_a, j_a]. Returns array [num_levels + 1].
    """
    L1, L2 = M.shape
    out = [1.0]
    for m in range(1, num_levels + 1):
        total = 0.0
        for ii in _tuples(L1, m, order):
            ci = _coeff(ii)
            for jj in _tuples(L2, m, order):
                total += ci * _coeff(jj) * np.prod(M[list(ii), list(jj)])
        out.append(total)
    return np.array(out)


def sig_tens_vs_seq_levels(U_levels, order=1):
    """Naive <z^(m), S_m(x)>.

    U_levels: list over levels m=1.. of arrays [m, L]; U_levels[m-1][a, i] is
    the factor-a base-kernel evaluation against increment i.
    Returns array [num_levels + 1] with leading 1.
    """
    out = [1.0]
    for U in U_levels:
        m, L = U.shape
        total = 0.0
        for ii in _tuples(L, m, order):
            total += _coeff(ii) * np.prod(U[np.arange(m), list(ii)])
        out.append(total)
    return np.array(out)


def explicit_signature(path, num_levels):
    """Exact truncated signature of a piecewise-linear path via Chen.

    path: [L, d]. Returns list of level tensors [d]*m for m = 1..num_levels.
    S(x) = prod_i exp_tensor(dx_i), truncated.
    """
    L, d = path.shape
    levels = [np.zeros((d,) * m) for m in range(1, num_levels + 1)]
    # signature of empty path = (1, 0, 0, ...)
    for step in np.diff(path, axis=0):
        # exp of the linear step: level m term = step^{⊗m} / m!
        exp_lv = []
        t = np.array(1.0)
        for m in range(1, num_levels + 1):
            t = np.multiply.outer(t, step)
            exp_lv.append(t / math.factorial(m))
        new = []
        for m in range(1, num_levels + 1):
            term = exp_lv[m - 1].copy()  # 1 * exp_m
            for a in range(1, m):
                term = term + np.multiply.outer(
                    levels[a - 1], exp_lv[m - a - 1]
                )
            term = term + levels[m - 1]  # S_m * 1
            new.append(term)
        levels = new
    return levels


def explicit_sig_kernel_levels(x, y, num_levels):
    """Exact signature kernel levels (linear base kernel) via explicit sigs."""
    sx = explicit_signature(x, num_levels)
    sy = explicit_signature(y, num_levels)
    out = [1.0]
    for a, b in zip(sx, sy):
        out.append(float(np.sum(a * b)))
    return np.array(out)


def goursat_solve_naive(inc):
    """Naive O(L^2) sequential Goursat finite-difference solve.

    inc: [S, T] increment inner products. u on the (S+1)x(T+1) grid with
    u[0, :] = u[:, 0] = 1 and the explicit midpoint update
      u[i+1, j+1] = u[i+1, j] + u[i, j+1] - u[i, j]
                    + inc[i, j] * (u[i+1, j] + u[i, j+1]) / 2.
    Returns the full grid u.
    """
    S, T = inc.shape
    u = np.ones((S + 1, T + 1))
    for i in range(S):
        for j in range(T):
            u[i + 1, j + 1] = (
                u[i + 1, j]
                + u[i, j + 1]
                - u[i, j]
                + inc[i, j] * (u[i + 1, j] + u[i, j + 1]) / 2.0
            )
    return u
