"""Benchmark: signature-kernel Gram throughput on TPU vs CPU reference.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} as required
by the driver. The baseline denominator is a vectorised float64 NumPy
implementation of the same truncated-signature recursion (the reference
GPflow/TF1 stack is CPU-bound through the same cumsum/elementwise ops and
could not be run here — empty reference mount, see SURVEY.md provenance
note), measured in-process on this machine's CPU.

Config: BASELINE staged config 1 shapes scaled up — N x N signature Gram,
L=50, d=2, num_levels=4, order=1, normalization on (per-level).
"""

from __future__ import annotations

import json
import time

import numpy as np


def numpy_reference_gram(X, num_levels):
    """Vectorised float64 NumPy truncated signature Gram (order 1,
    normalization on) — the CPU reference stand-in."""
    N, L, d = X.shape
    flat = X.reshape(N * L, d)
    # RBF via sq dists
    sq = (flat**2).sum(-1)
    D2 = sq[:, None] + sq[None, :] - 2 * (flat @ flat.T)
    K = np.exp(-0.5 * np.maximum(D2, 0)).reshape(N, L, N, L).transpose(
        0, 2, 1, 3
    )
    M = np.diff(np.diff(K, axis=2), axis=3)

    def levels_of(Mb):
        out = [np.ones(Mb.shape[:-2]), Mb.sum((-2, -1))]
        A = Mb
        for _ in range(2, num_levels + 1):
            c = np.cumsum(np.cumsum(A, -1), -2)
            E = np.zeros_like(A)
            E[..., 1:, 1:] = c[..., :-1, :-1]
            A = Mb * E
            out.append(A.sum((-2, -1)))
        return np.stack(out, 0)

    lv = levels_of(M)
    # diag for normalization
    Kd = np.exp(
        -0.5 * np.maximum(
            sq.reshape(N, L)[:, :, None] + sq.reshape(N, L)[:, None, :]
            - 2 * np.einsum("nld,nkd->nlk", X, X), 0,
        )
    )
    Md = np.diff(np.diff(Kd, axis=1), axis=2)
    dv = levels_of(Md)
    norm = np.sqrt(
        np.maximum(dv[:, :, None] * dv[:, None, :], 1e-30)
    )
    lvn = lv / norm
    lvn[0] = 1.0
    return lvn.sum(0)


def main():
    import jax
    import jax.numpy as jnp

    from gpsig_tpu.kernels.signature import SignatureRBF

    num_levels = 4
    L, d = 50, 2
    N_cpu = 60
    N_tpu = 200
    rng = np.random.default_rng(0)
    Xfull = (0.3 * rng.standard_normal((N_tpu, L, d))).cumsum(1)

    # --- CPU reference (float64 NumPy) ---
    Xc = Xfull[:N_cpu]
    t0 = time.time()
    numpy_reference_gram(Xc, num_levels)
    t_cpu = time.time() - t0
    cpu_entries_per_s = (N_cpu * N_cpu) / t_cpu

    # --- TPU jitted path, float32, fused Pallas engine ---
    kern = SignatureRBF(
        d, num_levels, lengthscales=1.0, order=1, normalization=True,
        dtype=jnp.float32,
    )
    X = jnp.asarray(Xfull, jnp.float32)

    @jax.jit
    def gram(k, X):
        return k.K(X)

    np.asarray(gram(kern, X))  # compile + settle
    # honest timing: vary the input so no layer can cache, and force a
    # host fetch (full device sync) each call; report the median of 5.
    ts = []
    for i in range(5):
        t0 = time.time()
        np.asarray(gram(kern, X * (1.0 + 1e-4 * i)))
        ts.append(time.time() - t0)
    t_tpu = sorted(ts)[len(ts) // 2]
    tpu_entries_per_s = (N_tpu * N_tpu) / t_tpu

    print(
        json.dumps(
            {
                "metric": "sig_gram_entries_per_sec",
                "value": round(tpu_entries_per_s, 1),
                "unit": "entries/s (N=200, L=50, d=2, levels=4, RBF, "
                        "normalized)",
                "vs_baseline": round(tpu_entries_per_s / cpu_entries_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
