"""On-chip validation + timing of compiled Pallas kernels (axon relay).

Run ONE job at a time (CLAUDE.md axon hazards):

    python scripts/validate_tpu.py fused_bwd
    python scripts/validate_tpu.py goursat
    python scripts/validate_tpu.py fused_fwd

Each job compiles the kernel on the real device, checks parity against the
XLA reference at f32 tolerances, and reports honest timings (varied inputs,
host fetch per call, median of 5).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_time(fn, n=5):
    ts = []
    for i in range(n):
        t0 = time.time()
        fn(i)
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def job_fused_fwd():
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram as fg

    N, L, d, nl = 200, 50, 2, 4
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    got = np.asarray(fg.fused_gram_levels(X, X, nl, True))
    want = np.asarray(fg._xla_reference(X, X, nl, True))
    err = np.max(np.abs(got - want) / (np.abs(want) + 1e-6))
    print(f"fused_fwd parity rel-err {err:.2e}")
    t = _median_time(
        lambda i: np.asarray(
            fg.fused_gram_levels(X * (1 + 1e-4 * i), X, nl, True))
    )
    print(f"fused_fwd median {t*1e3:.1f} ms  ({N*N/t:.0f} entries/s)")


def job_fused_bwd():
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram as fg

    N, L, d, nl = 200, 50, 2, 4
    rng = np.random.default_rng(1)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    Y = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    g = jnp.asarray(rng.standard_normal((nl + 1, N, N)), jnp.float32)

    xb, yb = fg.fused_gram_levels_bwd_pallas(X, Y, g, nl, True)
    xb, yb = np.asarray(xb), np.asarray(yb)
    _, vjp = jax.vjp(lambda x, y: fg._xla_reference(x, y, nl, True), X, Y)
    xw, yw = vjp(g)
    xw, yw = np.asarray(xw), np.asarray(yw)
    ex = np.max(np.abs(xb - xw)) / (np.max(np.abs(xw)) + 1e-12)
    ey = np.max(np.abs(yb - yw)) / (np.max(np.abs(yw)) + 1e-12)
    print(f"fused_bwd parity rel-err X̄ {ex:.2e}  Ȳ {ey:.2e}")
    t = _median_time(
        lambda i: np.asarray(
            fg.fused_gram_levels_bwd_pallas(
                X * (1 + 1e-4 * i), Y, g, nl, True)[0])
    )
    print(f"fused_bwd median {t*1e3:.1f} ms")


def job_goursat():
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops import goursat
    from gpsig_tpu.ops.pallas.goursat_pallas import goursat_corner_pallas

    B, S, T = 512, 99, 99  # L=100 sequences, dyadic_order=0
    rng = np.random.default_rng(2)
    inc = jnp.asarray(0.05 * rng.standard_normal((B, S, T)), jnp.float32)

    skew_fn = jax.jit(goursat.skewpad_diag_major)
    skew = skew_fn(inc)
    got = np.asarray(goursat_corner_pallas(skew, S, T, block_pairs=8))
    corner_fn = jax.jit(goursat.goursat_corner)
    want = np.asarray(corner_fn(inc))
    err = np.max(np.abs(got - want) / (np.abs(want) + 1e-6))
    print(f"goursat parity rel-err {err:.2e}")

    pallas_fn = jax.jit(
        lambda x: goursat_corner_pallas(
            goursat.skewpad_diag_major(x), S, T, block_pairs=8)
    )

    def run_pallas(i):
        return np.asarray(pallas_fn(inc * (1 + 1e-4 * i)))

    def run_scan(i):
        return np.asarray(corner_fn(inc * (1 + 1e-4 * i)))

    run_pallas(0)
    run_scan(0)
    tp = _median_time(run_pallas)
    ts = _median_time(run_scan)
    print(f"goursat pallas {tp*1e3:.1f} ms vs scan {ts*1e3:.1f} ms "
          f"({B} pairs, {S+1}x{T+1} grid) -> {ts/tp:.2f}x")


def job_goursat_sweep():
    """block_pairs sweep for the wavefront kernel (each size = one Mosaic
    compile through the relay — expect ~1 min per size)."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops import goursat
    from gpsig_tpu.ops.pallas.goursat_pallas import goursat_corner_pallas

    B, S, T = 512, 99, 99
    rng = np.random.default_rng(2)
    inc = jnp.asarray(0.05 * rng.standard_normal((B, S, T)), jnp.float32)
    corner_fn = jax.jit(goursat.goursat_corner)
    want = np.asarray(corner_fn(inc))
    ts = _median_time(lambda i: np.asarray(corner_fn(inc * (1 + 1e-4 * i))))
    print(f"scan {ts*1e3:.1f} ms")
    for bb in (64, 256, 512):
        fn = jax.jit(
            lambda x, bb=bb: goursat_corner_pallas(
                goursat.skewpad_diag_major(x), S, T, block_pairs=bb)
        )
        got = np.asarray(fn(inc))
        err = np.max(np.abs(got - want) / (np.abs(want) + 1e-6))
        t = _median_time(lambda i: np.asarray(fn(inc * (1 + 1e-4 * i))))
        print(f"pallas bb={bb}: {t*1e3:.1f} ms (err {err:.1e}) "
              f"-> {ts/t:.2f}x vs scan")


def job_sig_gram_ho():
    """Higher-order per-pair DP kernel: compiled parity + throughput."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops import signature as sigops
    from gpsig_tpu.ops.pallas.sig_gram import sig_gram_levels_ho

    B, L, nl, order = 256, 50, 5, 3
    rng = np.random.default_rng(4)
    M = jnp.asarray(0.2 * rng.standard_normal((B, L - 1, L - 1)),
                    jnp.float32)
    fn = jax.jit(lambda m: sig_gram_levels_ho(m, nl, order))
    ref = jax.jit(lambda m: sigops.signature_kern(m, nl, order=order))
    got = np.asarray(fn(M))
    want = np.asarray(ref(M))
    err = np.max(np.abs(got - want) / (np.abs(want) + 1e-6))
    print(f"sig_gram_ho parity rel-err {err:.2e}")
    tp = _median_time(lambda i: np.asarray(fn(M * (1 + 1e-4 * i))))
    tx = _median_time(lambda i: np.asarray(ref(M * (1 + 1e-4 * i))))
    print(f"pallas {tp*1e3:.1f} ms vs xla {tx*1e3:.1f} ms "
          f"({B} pairs, L={L}, nl={nl}, order={order}) -> {tx/tp:.2f}x")


def job_fused_mxu():
    """MXU-mode sweep of the fused Gram kernel: highest (6-pass f32) vs
    split (2×1-pass bf16 hi/lo decomposition) vs default (1-pass bf16).
    Amortized timing: R grams per dispatch (relay floor ~29 ms)."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram as fg

    N, L, d, nl, R = 200, 50, 2, 4, 16
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    want = np.asarray(jax.jit(
        lambda x: fg._xla_reference(x, x, nl, True))(X))
    scale = np.abs(want).max(axis=(1, 2), keepdims=True)

    for mode in ("highest", "split", "default"):
        fn = jax.jit(lambda x, mode=mode: fg.fused_gram_levels(
            x, x, nl, True, False, 8, mode))
        got = np.asarray(fn(X))
        err = np.max(np.abs(got - want) / scale)
        rep = jax.jit(lambda x, s, mode=mode: jax.lax.scan(
            lambda c, e: (c, jnp.sum(fg.fused_gram_levels(
                x * (1.0 + e), x, nl, True, False, 8, mode))),
            0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
        np.asarray(rep(X, jnp.float32(0)))
        t = _median_time(lambda i: np.asarray(rep(X, jnp.float32(i))))
        print(f"mxu={mode}: scaled err {err:.2e}  {t/R*1e3:.2f} ms/gram "
              f"({R * N * N / t:.0f} entries/s)")


def job_tens_seq():
    """Fused K_tens_vs_seq at the reference's flagship SVGP shape
    (M=500 inducing tensors, levels 5, B=50 minibatch): compiled parity
    vs the XLA path + amortized timing in both MXU modes."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import tens_seq as ts
    from gpsig_tpu.ops.signature import tensor_factor_count

    T, N, L, d, nl, R = 500, 50, 50, 3, 5, 16
    F = tensor_factor_count(nl)
    rng = np.random.default_rng(0)
    Z = jnp.asarray(0.3 * rng.standard_normal((T, F, 2, d)), jnp.float32)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    want = np.asarray(jax.jit(
        lambda z, x: ts._xla_reference_tens_seq(z, x, nl, True, True)
    )(Z, X))
    scale = np.abs(want).max(axis=(1, 2), keepdims=True) + 1e-30
    for mode in ("highest", "split"):
        fn = jax.jit(lambda z, x, mode=mode: ts.fused_tens_seq_levels(
            z, x, nl, True, True, False, mode))
        got = np.asarray(fn(Z, X))
        err = np.max(np.abs(got - want) / scale)
        rep = jax.jit(lambda z, x, s, mode=mode: jax.lax.scan(
            lambda c, e: (c, jnp.sum(ts.fused_tens_seq_levels(
                z, x * (1.0 + e), nl, True, True, False, mode))),
            0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
        np.asarray(rep(Z, X, jnp.float32(0)))
        t = _median_time(lambda i: np.asarray(rep(Z, X, jnp.float32(i))))
        print(f"tens_seq mxu={mode}: scaled err {err:.2e}  "
              f"{t/R*1e3:.2f} ms/Kuf ({R * T * N / t:.0f} entries/s)")
    # XLA path timing at the same shape for the PERF.md comparison row
    repx = jax.jit(lambda z, x, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(ts._xla_reference_tens_seq(
            z, x * (1.0 + e), nl, True, True))),
        0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
    np.asarray(repx(Z, X, jnp.float32(0)))
    t = _median_time(lambda i: np.asarray(repx(Z, X, jnp.float32(i))))
    print(f"tens_seq XLA path: {t/R*1e3:.2f} ms/Kuf "
          f"({R * T * N / t:.0f} entries/s)")


def job_goursat_fused():
    """Fused Goursat forward + adjoint with in-kernel dyadic refinement:
    on-chip parity vs the scan path and amortized timing at dyadic_order=2
    (the PDE-kernel training shape: L=50, refined 196x196 grids)."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops import goursat as g

    Su = Tu = 49
    B, o, R = 64, 2, 8
    rng = np.random.default_rng(0)
    x = (0.25 * rng.standard_normal((B, Su + 1, 3))).cumsum(1)
    y = (0.25 * rng.standard_normal((B, Tu + 1, 3))).cumsum(1)
    dx = np.diff(x, axis=1)
    dy = np.diff(y, axis=1)
    inc = jnp.asarray(np.einsum("bif,bjf->bij", dx, dy), jnp.float32)

    want_c = np.asarray(jax.jit(
        lambda a: g.goursat_corner(g.refine_increments(a, o)))(inc))
    got_c = np.asarray(jax.jit(
        lambda a: g._corner_refined_impl(a, o))(inc))
    sc = np.abs(want_c).max() + 1e-12
    print(f"goursat_fused corner rel-err {np.abs(got_c-want_c).max()/sc:.2e}")

    gbar = jnp.asarray(rng.standard_normal(B), jnp.float32)
    want_g = np.asarray(jax.jit(jax.grad(lambda a: jnp.sum(
        gbar * g.goursat_corner(g.refine_increments(a, o)))))(inc))
    got_g = np.asarray(jax.jit(
        lambda a: g._corner_refined_bwd_impl(a, o, gbar)[0])(inc))
    sg = np.abs(want_g).max() + 1e-12
    print(f"goursat_fused grad rel-err {np.abs(got_g-want_g).max()/sg:.2e}")

    # amortized timing: R solves (and R grads) per dispatch, varied inputs
    prim = jax.jit(lambda a, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(g.goursat_corner_refined(a * (1 + e), o))),
        0.0, 1e-4 * (s + jnp.arange(R, dtype=a.dtype)))[1])
    grad = jax.jit(lambda a, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(jax.grad(
            lambda aa: jnp.sum(g.goursat_corner_refined(aa, o)))(
                a * (1 + e)))),
        0.0, 1e-4 * (s + jnp.arange(R, dtype=a.dtype)))[1])
    scan_grad = jax.jit(lambda a, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(jax.grad(lambda aa: jnp.sum(
            g.goursat_corner(g.refine_increments(aa, o))))(a * (1 + e)))),
        0.0, 1e-4 * (s + jnp.arange(R, dtype=a.dtype)))[1])
    cells = B * (Su * 4) * (Tu * 4) * R
    for name, fn in (("primal", prim), ("fused grad", grad),
                     ("scan-AD grad", scan_grad)):
        np.asarray(fn(inc, jnp.float32(0)))
        t = _median_time(lambda i, fn=fn: np.asarray(fn(inc, jnp.float32(i))))
        print(f"goursat_fused {name}: {t/R*1e3:.2f} ms/batch "
              f"({cells/t/1e9:.2f} Gcell/s)")


def job_fused_breakdown():
    """Where does fused-Gram time go? A/B at N=256: RBF vs Linear base
    (exp cost), num_levels 1 vs 4 (DP-matmul cost), bx 8 vs 16 — to decide
    the next utilisation lever (VERDICT r1 #5)."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram as fg

    N, L, d = 256, 50, 2
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    R = 32
    for label, rbf, nl, mxu in [
        ("rbf nl=4 split", True, 4, "split"),
        ("rbf nl=1 split", True, 1, "split"),
        ("lin nl=4 split", False, 4, "split"),
        ("rbf nl=4 default", True, 4, "default"),
        ("rbf nl=7 split", True, 7, "split"),
    ]:
        fn = jax.jit(lambda x, s, rbf=rbf, nl=nl, mxu=mxu: jax.lax.scan(
            lambda c, e: (c, jnp.sum(fg.fused_gram_levels(
                x * (1 + e), x, nl, rbf, mxu=mxu))),
            0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
        np.asarray(fn(X, jnp.float32(0)))
        t = _median_time(lambda i, fn=fn: np.asarray(fn(X, jnp.float32(i))))
        print(f"breakdown {label}: {t/R*1e3:.2f} ms "
              f"({R*N*N/t/1e6:.1f}M entries/s)", flush=True)


def job_fused_fwdgrad():
    """VERDICT r2 #3: jitted fwd+grad vs fwd-only of the fused Gram at
    N=256 after sy-stacking the backward — parity vs the XLA vjp first,
    then amortized timings."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram as fg

    N, L, d, nl, R = 256, 50, 2, 4, 32
    MXU = "split"  # the production compiled-f32 mode (_mxu_mode)
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    Y = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    g = jnp.asarray(rng.standard_normal((nl + 1, N, N)), jnp.float32)

    xb, yb = fg.fused_gram_levels_bwd_pallas(X, Y, g, nl, True, False, 8,
                                             MXU)
    xb, yb = np.asarray(xb), np.asarray(yb)
    _, vjp = jax.vjp(lambda x, y: fg._xla_reference(x, y, nl, True), X, Y)
    xw, yw = vjp(g)
    xw, yw = np.asarray(xw), np.asarray(yw)
    ex = np.max(np.abs(xb - xw)) / (np.max(np.abs(xw)) + 1e-12)
    ey = np.max(np.abs(yb - yw)) / (np.max(np.abs(yw)) + 1e-12)
    print(f"sy-stacked bwd (split) parity rel-err X̄ {ex:.2e}  Ȳ {ey:.2e}",
          flush=True)

    fwd = jax.jit(lambda x, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(fg.fused_gram_levels(
            x * (1 + e), x, nl, True, False, 8, MXU))),
        0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
    fwdgrad = jax.jit(lambda x, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(jax.grad(
            lambda xx: jnp.sum(fg.fused_gram_levels(
                xx, xx, nl, True, False, 8, MXU)))(x * (1 + e)))),
        0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
    for name, fn in (("fwd-only", fwd), ("fwd+grad", fwdgrad)):
        np.asarray(fn(X, jnp.float32(0)))
        t = _median_time(lambda i, fn=fn: np.asarray(fn(X, jnp.float32(i))))
        print(f"fused gram {name} ({MXU}): {t/R*1e3:.2f} ms/gram "
              f"({R*N*N/t/1e6:.1f}M entries/s)", flush=True)


def job_tens_seq_grad():
    """VERDICT r2 #4: fused tens_seq fwd+grad vs fwd-only at the flagship
    Kuf shape (M=500, B=50, L=50, nl=5, increments) — the training step's
    gradients must no longer pay the XLA-recompute HBM wall."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import tens_seq as ts
    from gpsig_tpu.ops.signature import tensor_factor_count

    T, N, L, d, nl, R = 500, 50, 50, 3, 5, 16
    F = tensor_factor_count(nl)
    rng = np.random.default_rng(0)
    Z = jnp.asarray(0.3 * rng.standard_normal((T, F, 2, d)), jnp.float32)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    g = jnp.asarray(rng.standard_normal((nl + 1, T, N)), jnp.float32)

    zb, xb = ts.tens_seq_bwd_pallas(Z, X, g, nl, True, True)
    zb, xb = np.asarray(zb), np.asarray(xb)
    _, vjp = jax.vjp(
        lambda z, x: ts._xla_reference_tens_seq(z, x, nl, True, True), Z, X)
    zw, xw = vjp(g)
    zw, xw = np.asarray(zw), np.asarray(xw)
    ez = np.max(np.abs(zb - zw)) / (np.max(np.abs(zw)) + 1e-12)
    ex = np.max(np.abs(xb - xw)) / (np.max(np.abs(xw)) + 1e-12)
    print(f"tens_seq fused bwd parity rel-err Z̄ {ez:.2e}  X̄ {ex:.2e}")

    fwd = jax.jit(lambda z, x, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(ts.fused_tens_seq_levels(
            z, x * (1 + e), nl, True, True, False, "split"))),
        0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
    fwdgrad = jax.jit(lambda z, x, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(jax.grad(
            lambda zz: jnp.sum(ts.fused_tens_seq_levels(
                zz, x * (1 + e), nl, True, True, False, "split")))(z))),
        0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
    for name, fn in (("fwd-only", fwd), ("fwd+grad(Z)", fwdgrad)):
        np.asarray(fn(Z, X, jnp.float32(0)))
        t = _median_time(
            lambda i, fn=fn: np.asarray(fn(Z, X, jnp.float32(i))))
        print(f"tens_seq {name} (split): {t/R*1e3:.2f} ms/Kuf "
              f"({R*T*N/t/1e6:.2f}M entries/s)", flush=True)


def job_sharded_step():
    """VERDICT r2 #1 on-chip leg: the sharded training step (1-chip mesh)
    with the fused Pallas engines — the two headline features compiled
    together on real hardware."""
    import jax
    import jax.numpy as jnp
    import optax
    from gpsig_tpu import likelihoods as liks
    from gpsig_tpu.inducing import make_inducing_tensors_from_data
    from gpsig_tpu.kernels.signature import SignatureRBF
    from gpsig_tpu.models.svgp import SVGP
    from gpsig_tpu.parallel import mesh as meshlib
    from gpsig_tpu.parallel.train import make_sharded_step_fn, sharded_gram
    from gpsig_tpu.training.loop import init_state

    N, L, d, nl, M = 256, 50, 2, 4, 128
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    Y = jnp.asarray(rng.integers(0, 2, N))
    mesh = meshlib.make_mesh()  # all (=1) chips on the data axis

    for engine in ("pallas", "xla"):
        kern = SignatureRBF(d, nl, lengthscales=1.0, order=1,
                            normalization=True, dtype=jnp.float32,
                            engine=engine)
        feat = make_inducing_tensors_from_data(
            jax.random.PRNGKey(0), X, num_tensors=M, num_levels=nl,
            num_features=d, increments=True)
        model = SVGP.create(kern, liks.MultiClass(num_classes=2), feat,
                            num_latent=2, dtype=jnp.float32)
        opt = optax.adam(1e-3)
        step = make_sharded_step_fn(opt, num_data=N, mesh=mesh, gamma=0.1,
                                    use_natgrad=True)
        state = init_state(model, opt)
        Xs, Ys = meshlib.shard_batch(mesh, X, Y)
        t0 = time.time()
        state, elbo = step(state, Xs, Ys, jax.random.PRNGKey(0))
        elbo.block_until_ready()
        t_compile = time.time() - t0
        ts = []
        for i in range(5):
            key = jax.random.PRNGKey(i + 1)
            t0 = time.time()
            state, elbo = step(state, Xs, Ys, key)
            e = float(elbo)
            ts.append(time.time() - t0)
        t_med = sorted(ts)[len(ts) // 2]
        assert np.isfinite(e)
        print(f"sharded step engine={engine}: compile+1st {t_compile:.1f}s, "
              f"steady {t_med*1e3:.1f} ms/step "
              f"({1/t_med:.1f} steps/s), elbo {e:.1f}", flush=True)
        if engine == "pallas":
            K = sharded_gram(state.model.kernel, mesh, X)
            assert np.all(np.isfinite(np.asarray(K)))
            print("sharded_gram (pallas, 1-chip mesh) finite: ok",
                  flush=True)


def job_stable_chol():
    """VERDICT r2 #8: stable_cholesky overhead at M=500 f32 on-chip —
    healthy-path cost vs a raw cholesky after the lazy-escalation rewrite."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu import gauss

    M, R = 500, 64
    rng = np.random.default_rng(0)
    A = rng.standard_normal((M, 2 * M)).astype(np.float32)
    K0 = jnp.asarray(A @ A.T / (2 * M) + 1e-3 * np.eye(M, dtype=np.float32))

    raw = jax.jit(lambda K, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(jnp.linalg.cholesky(K + e * jnp.eye(
            M, dtype=K.dtype)))),
        0.0, 1e-5 * (s + jnp.arange(R, dtype=K.dtype)))[1])
    stab = jax.jit(lambda K, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(gauss.stable_cholesky(K + e * jnp.eye(
            M, dtype=K.dtype)))),
        0.0, 1e-5 * (s + jnp.arange(R, dtype=K.dtype)))[1])
    for name, fn in (("raw chol", raw), ("stable_cholesky", stab)):
        r = np.asarray(fn(K0, jnp.float32(0)))
        assert np.all(np.isfinite(r))
        t = _median_time(lambda i, fn=fn: np.asarray(fn(K0, jnp.float32(i))))
        print(f"{name}: {t/R*1e3:.3f} ms/call (M={M}, f32)", flush=True)


def job_low_rank():
    """SURVEY.md §5.7 long-sequence scaling, on-chip: the low-rank feature
    path (Nyström base features + sketched Khatri-Rao products,
    kernels/low_rank.py) is O(L) per level where the dense DP is O(L²).
    Measures Gram wall vs sequence length and reports the empirical
    scaling exponent; correctness (full-rank ≡ dense) is pinned by the
    CPU tests — here we check finiteness/symmetry at f32 on the device."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.kernels.low_rank import LowRankSignatureRBF

    N, d, nl, c = 256, 3, 4, 64
    rng = np.random.default_rng(0)
    lengths = (100, 400, 1600)
    walls = []
    for L in lengths:
        X = jnp.asarray(
            (0.1 * rng.standard_normal((N, L, d))).cumsum(1), jnp.float32)
        kern = LowRankSignatureRBF(
            jax.random.PRNGKey(0), X, d, nl, num_components=c,
            dtype=jnp.float32)
        K = jax.jit(kern.K)
        k0 = np.asarray(K(X))
        assert np.all(np.isfinite(k0))
        sym = np.max(np.abs(k0 - k0.T)) / (np.max(np.abs(k0)) + 1e-12)
        t = _median_time(lambda i: np.asarray(K(X * (1 + 1e-4 * i))))
        walls.append(t)
        print(f"low_rank L={L:>4}: {t*1e3:6.1f} ms/Gram "
              f"({N*N/t/1e6:.1f}M entries/s), sym rel-err {sym:.1e}",
              flush=True)
    slope = np.polyfit(np.log(lengths), np.log(walls), 1)[0]
    print(f"empirical wall ~ L^{slope:.2f} (dense DP would be ~L^2)",
          flush=True)


def job_nuts():
    """BASELINE config 5 on-chip (VERDICT r2 #2): 16 vmapped NUTS chains
    over signature-GPR hyperparameters on the real device — wall time for
    warmup+sampling, ESS/s, and whether the iterative tree-doubling
    while-loops compile acceptably."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.data.synthetic import regression_sequences
    from gpsig_tpu.kernels.signature import SignatureRBF
    from gpsig_tpu.models.gpr import GPR
    from gpsig_tpu import params as pr
    from gpsig_tpu.parallel import mesh as meshlib
    from gpsig_tpu.parallel.chains import run_chains_sharded
    from gpsig_tpu.utils.metrics import effective_sample_size

    dtype = jnp.float32
    d, nl = 2, 3
    C, WARM, SAMP, DEPTH = 16, 100, 100, 6
    X, y = regression_sequences(seed=0, N=40, L=20, d=d)
    Xj, yj = jnp.asarray(X, dtype), jnp.asarray(y, dtype)

    def logp(theta):
        ell = jnp.exp(theta[:d])
        var = jnp.exp(theta[d : d + nl + 1])
        noise = jnp.exp(theta[-1])
        kern = SignatureRBF(d, nl, lengthscales=1.0, order=1,
                            normalization=True, dtype=dtype)
        kern = kern.replace(raw_lengthscales=pr.inv_positive(ell),
                            raw_variances=pr.inv_positive(var))
        m = GPR.create(kern, noise_variance=noise, dtype=dtype)
        return m.log_marginal_likelihood(Xj, yj) - 0.5 * jnp.sum(
            theta**2) / 4.0

    dim = d + nl + 2
    mesh = meshlib.make_mesh()
    theta0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (C, dim), dtype)

    # draws_per_dispatch: the monolithic 200-transition dispatch holds the
    # chip long enough to trip the relay's execution deadline (UNAVAILABLE
    # device error, observed 2026-08-20); the chunked host loop bounds each
    # dispatch to 25 transitions and is bit-identical (test_nuts.py).
    from gpsig_tpu.parallel.chains import make_chunked_sampler

    sampler = make_chunked_sampler(
        logp, mesh, num_warmup=WARM, num_samples=SAMP, max_depth=DEPTH,
        draws_per_dispatch=25,
    )
    t0 = time.time()
    samples, info = sampler(jax.random.PRNGKey(0), theta0)
    jax.block_until_ready(samples)
    t_compile_and_run = time.time() - t0
    # honest steady-state: rerun with a different key (same compiled fns)
    t0 = time.time()
    samples, info = sampler(jax.random.PRNGKey(7), theta0)
    s = np.asarray(samples)
    t_run = time.time() - t0
    ess = effective_sample_size(s)
    leaves = float(np.asarray(info["num_leaves"]).mean())
    print(f"nuts on-chip: chains={C} dim={dim} warmup={WARM} "
          f"samples={SAMP} max_depth={DEPTH}")
    print(f"  first call (compile+run) {t_compile_and_run:.1f} s; "
          f"steady-state {t_run:.1f} s "
          f"({C * SAMP / t_run:.1f} draws/s)")
    print(f"  mean accept {float(np.asarray(info['accept_prob']).mean()):.3f}"
          f"  divergent {float(np.asarray(info['diverging']).mean()):.3f}"
          f"  mean leaves/draw {leaves:.1f}")
    print(f"  ESS min/med/max {ess.min():.0f}/{np.median(ess):.0f}/"
          f"{ess.max():.0f}  -> min ESS/s {ess.min() / t_run:.2f}")




def job_ho_gram():
    """General fused Gram (order>=2) on-chip: parity + entries/s at N=256
    (VERDICT r3 #1 'Done' criteria)."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram_ho as fho

    N, L, d, nl = 256, 50, 2, 4
    R = 16
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    for order in (2, 3):
        got = np.asarray(
            fho.fused_gram_ho_levels(X, X, nl, order, "rbf", True,
                                     mxu="split"))
        want = np.asarray(fho._xla_reference_ho(X, X, nl, order, "rbf",
                                                True))
        err = np.max(np.abs(got - want) / (np.max(np.abs(want)) + 1e-6))
        print(f"ho_gram order={order} parity scaled-err {err:.2e}")

        @jax.jit
        def grams(X, seed, _order=order):
            eps = 1e-4 * (seed + jnp.arange(R, dtype=X.dtype))

            def body(c, e):
                out = fho.fused_gram_ho_levels(
                    X * (1.0 + e), X, nl, _order, "rbf", True,
                    mxu="split")
                return c, jnp.sum(out)

            _, s = jax.lax.scan(body, 0.0, eps)
            return s

        np.asarray(grams(X, jnp.float32(0)))
        t = _median_time(
            lambda i: np.asarray(grams(X, jnp.float32(i)))) / R
        print(f"ho_gram order={order} nl={nl} 'split' {t*1e3:.2f} ms/gram"
              f"  ({N*N/t/1e6:.1f}M entries/s)")


def job_ho_gram_n800():
    """N=800 order-2 Gram completing on one chip — the configuration that
    used to hit the 51 GB HBM wall through sig_gram's XLA-built increment
    tensor (VERDICT r3 #1)."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram_ho as fho

    N, L, d, nl, order = 800, 50, 2, 4, 2
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    f = jax.jit(lambda X: fho.fused_gram_ho_levels(
        X, X, nl, order, "rbf", True, mxu="split"))
    out = np.asarray(f(X))
    assert np.all(np.isfinite(out)), "non-finite entries"
    t_fetch = _median_time(lambda i: np.asarray(f(X * (1 + 1e-4 * i))))
    # compute-only wall: fetch a scalar reduction (the 12.8 MB full-levels
    # fetch through the axon relay costs ~0.5 s and is not kernel time)
    fsum = jax.jit(lambda X: jnp.sum(fho.fused_gram_ho_levels(
        X, X, nl, order, "rbf", True, mxu="split")))
    np.asarray(fsum(X))
    t = _median_time(lambda i: np.asarray(fsum(X * (1 + 1e-4 * i))))
    print(f"ho_gram_n800: order-2 [5, 800, 800] levels finite; "
          f"compute {t*1e3:.1f} ms/gram ({N*N/t/1e6:.1f}M entries/s); "
          f"incl. full 12.8MB host fetch {t_fetch*1e3:.1f} ms")


def job_ho_gram_grad():
    """Fused HO backward on-chip: parity vs XLA vjp + fwd+grad timing."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram_ho as fho

    N, L, d, nl, order = 256, 50, 2, 4, 2
    R = 8
    rng = np.random.default_rng(1)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    Y = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)

    def loss(X, Y):
        lv = fho.fused_gram_ho_levels(X, Y, nl, order, "rbf", True,
                                      mxu="split")
        return jnp.sum(lv * (1.0 + 0.1 * lv))

    gx, gy = jax.jit(jax.grad(loss, argnums=(0, 1)))(X, Y)
    gx, gy = np.asarray(gx), np.asarray(gy)

    def loss_x(X, Y):
        lv = fho._xla_reference_ho(X, Y, nl, order, "rbf", True)
        return jnp.sum(lv * (1.0 + 0.1 * lv))

    rx, ry = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(X, Y)
    ex = np.max(np.abs(gx - np.asarray(rx))) / (
        np.max(np.abs(np.asarray(rx))) + 1e-9)
    ey = np.max(np.abs(gy - np.asarray(ry))) / (
        np.max(np.abs(np.asarray(ry))) + 1e-9)
    print(f"ho_gram_grad parity Xbar {ex:.2e}  Ybar {ey:.2e}")

    @jax.jit
    def fwdgrad(X, Y, seed):
        eps = 1e-4 * (seed + jnp.arange(R, dtype=X.dtype))

        def body(c, e):
            v, (gx, gy) = jax.value_and_grad(loss, argnums=(0, 1))(
                X * (1.0 + e), Y)
            return c, v + jnp.sum(gx) + jnp.sum(gy)

        _, s = jax.lax.scan(body, 0.0, eps)
        return s

    np.asarray(fwdgrad(X, Y, jnp.float32(0)))
    t = _median_time(lambda i: np.asarray(fwdgrad(X, Y, jnp.float32(i)))) / R
    print(f"ho_gram_grad fwd+grad {t*1e3:.2f} ms/gram")


def job_posterior():
    """Cached-posterior prediction throughput at the flagship M=500
    (VERDICT r3 #5): SVGP.predict_f (chol + solves per batch) vs
    SVGP.posterior().predict_f (cached projections)."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu import likelihoods as liks
    from gpsig_tpu.inducing import make_inducing_tensors_from_data
    from gpsig_tpu.kernels.signature import SignatureRBF
    from gpsig_tpu.models.svgp import SVGP

    M, nl, C, B, L, d = 500, 5, 10, 100, 50, 2
    rng = np.random.default_rng(0)
    Xtr = jnp.asarray(
        (0.3 * rng.standard_normal((max(M, 64), L, d))).cumsum(1),
        jnp.float32)
    kern = SignatureRBF(d, nl, lengthscales=1.0, dtype=jnp.float32)
    feat = make_inducing_tensors_from_data(
        jax.random.PRNGKey(0), Xtr, num_tensors=M, num_levels=nl,
        num_features=d, increments=True)
    model = SVGP.create(kern, liks.MultiClass(num_classes=C), feat,
                        num_latent=C, dtype=jnp.float32)
    model = model.replace(q_mu=0.1 * jax.random.normal(
        jax.random.PRNGKey(1), model.q_mu.shape, jnp.float32))
    Xs = jnp.asarray(
        (0.3 * rng.standard_normal((B, L, d))).cumsum(1), jnp.float32)

    direct = jax.jit(lambda m, X: m.predict_f(X))
    m0, v0 = direct(model, Xs)
    np.asarray(m0)

    make_post = jax.jit(lambda m: m.posterior())
    post = jax.block_until_ready(make_post(model))
    cached = jax.jit(lambda p, X: p.predict_f(X))
    m1, v1 = cached(post, Xs)
    em = np.max(np.abs(np.asarray(m1) - np.asarray(m0)))
    ev = np.max(np.abs(np.asarray(v1) - np.asarray(v0)))
    print(f"posterior parity mean {em:.2e} var {ev:.2e}")

    # R batches per dispatch: the ~29 ms relay floor swamps a single
    # batch's compute (both paths measured ~30 ms/dispatch), so the real
    # per-batch cost needs amortization
    R = 16

    @jax.jit
    def direct_R(m, X, seed):
        eps = 1e-4 * (seed + jnp.arange(R, dtype=X.dtype))

        def body(c, e):
            fm, fv = m.predict_f(X * (1.0 + e))
            return c, jnp.sum(fm) + jnp.sum(fv)

        return jax.lax.scan(body, 0.0, eps)[1]

    @jax.jit
    def cached_R(p, X, seed):
        eps = 1e-4 * (seed + jnp.arange(R, dtype=X.dtype))

        def body(c, e):
            fm, fv = p.predict_f(X * (1.0 + e))
            return c, jnp.sum(fm) + jnp.sum(fv)

        return jax.lax.scan(body, 0.0, eps)[1]

    np.asarray(direct_R(model, Xs, jnp.float32(0)))
    t_direct = _median_time(
        lambda i: np.asarray(direct_R(model, Xs, jnp.float32(i)))) / R
    np.asarray(cached_R(post, Xs, jnp.float32(0)))
    t_cached = _median_time(
        lambda i: np.asarray(cached_R(post, Xs, jnp.float32(i)))) / R
    t_build = _median_time(lambda i: np.asarray(
        make_post(model.replace(q_mu=model.q_mu * (1 + 1e-4 * i))).proj_mean))
    print(f"predict_f direct {t_direct*1e3:.2f} ms/batch(B={B})  "
          f"cached {t_cached*1e3:.2f} ms/batch  "
          f"posterior build {t_build*1e3:.1f} ms (amortised once)")
    print(f"speedup per batch: {t_direct/t_cached:.2f}x; break-even at "
          f"{t_build/max(t_direct-t_cached,1e-9):.1f} batches")



def job_nuts_pallas():
    """VERDICT r3 #4: the fused Pallas engines inside the NUTS leapfrog on
    the real chip — logp/grad parity vs the XLA engine under vmap, then a
    short chunked NUTS run per engine. At config-5 scale (N>=100, 128
    chains) the XLA path is impossible anyway: vmapping it materialises
    [C, N^2, L, L] (~49 GB at C=128, N=100, L=50) where the fused kernel
    streams everything through VMEM."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu import params as pr
    from gpsig_tpu.data.synthetic import regression_sequences
    from gpsig_tpu.kernels.signature import SignatureRBF
    from gpsig_tpu.models.gpr import GPR
    from gpsig_tpu.parallel import mesh as meshlib
    from gpsig_tpu.parallel.chains import make_chunked_sampler

    dtype = jnp.float32
    d, nl = 2, 4
    N, L = 64, 50
    C, WARM, SAMP, DEPTH = 8, 40, 40, 5
    X, y = regression_sequences(seed=0, N=N, L=L, d=d)
    Xj, yj = jnp.asarray(X, dtype), jnp.asarray(y, dtype)

    def make_logp(engine):
        def logp(theta):
            ell = jnp.exp(theta[:d])
            var = jnp.exp(theta[d : d + nl + 1])
            noise = jnp.exp(theta[-1])
            kern = SignatureRBF(d, nl, lengthscales=1.0, order=1,
                                normalization=True, dtype=dtype,
                                engine=engine)
            kern = kern.replace(raw_lengthscales=pr.inv_positive(ell),
                                raw_variances=pr.inv_positive(var))
            m = GPR.create(kern, noise_variance=noise, dtype=dtype)
            return m.log_marginal_likelihood(Xj, yj) - 0.5 * jnp.sum(
                theta**2) / 4.0
        return logp

    dim = d + nl + 2
    thetas = 0.2 * jax.random.normal(jax.random.PRNGKey(2), (C, dim),
                                     dtype)
    vx = np.asarray(jax.jit(jax.vmap(make_logp("xla")))(thetas))
    vp = np.asarray(jax.jit(jax.vmap(make_logp("pallas")))(thetas))
    print(f"nuts_pallas logp parity (vmap x{C}): "
          f"max |d| {np.max(np.abs(vp - vx)):.2e} on |logp|~"
          f"{np.max(np.abs(vx)):.1f}")
    gx = np.asarray(jax.jit(jax.vmap(jax.grad(make_logp("xla"))))(thetas))
    gp = np.asarray(jax.jit(jax.vmap(jax.grad(make_logp("pallas"))))(
        thetas))
    rel = np.max(np.abs(gp - gx)) / (np.max(np.abs(gx)) + 1e-9)
    print(f"nuts_pallas grad parity (vmap): scaled-err {rel:.2e}")

    mesh = meshlib.make_mesh()
    theta0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (C, dim),
                                     dtype)
    for engine in ("pallas", "xla"):
        sampler = make_chunked_sampler(
            make_logp(engine), mesh, num_warmup=WARM, num_samples=SAMP,
            max_depth=DEPTH, draws_per_dispatch=20)
        t0 = time.time()
        samples, info = sampler(jax.random.PRNGKey(0), theta0)
        jax.block_until_ready(samples)
        t_first = time.time() - t0
        t0 = time.time()
        samples, info = sampler(jax.random.PRNGKey(7), theta0)
        t_run = time.time() - t0
        acc = float(np.asarray(info["accept_prob"]).mean())
        lv = float(np.asarray(info["num_leaves"]).mean())
        assert np.all(np.isfinite(np.asarray(samples)))
        print(f"nuts_pallas engine={engine}: N={N} L={L} nl={nl} "
              f"chains={C} warm+samp={WARM}+{SAMP}: first(compile+run) "
              f"{t_first:.1f}s steady {t_run:.1f}s "
              f"({C*SAMP/t_run:.1f} draws/s) accept {acc:.3f} "
              f"leaves/draw {lv:.1f}")


def job_flagship_scan():
    """Host-dispatch amortization at the flagship training shape
    (M=500 inducing tensors, nl=5, C=10, B=50): the per-step host loop
    pays the axon relay's ~29 ms round trip per step, so the recorded
    29.8 steps/s is dispatch-bound, not compute-bound. make_multi_step_fn
    scans k pre-batched steps inside ONE dispatch (identical math,
    test_multi_step_matches_single_steps) — this measures the machine's
    actual step rate."""
    import jax
    import jax.numpy as jnp
    import optax
    from gpsig_tpu import likelihoods as liks
    from gpsig_tpu.data.synthetic import classification_sequences
    from gpsig_tpu.inducing import make_inducing_tensors_from_data
    from gpsig_tpu.models.svgp import SVGP
    from gpsig_tpu.kernels.signature import SignatureRBF
    from gpsig_tpu.training.loop import (init_state, make_multi_step_fn,
                                         make_step_fn)

    dtype = jnp.float32
    N, L, d, nl, M, C, B = 840, 50, 2, 5, 500, 10, 50
    X, y = classification_sequences(seed=0, N=N, L=L, d=d, num_classes=C)
    Xj, yj = jnp.asarray(X, dtype), jnp.asarray(y)
    kern = SignatureRBF(d, nl, lengthscales=1.0, order=1,
                        normalization=True, dtype=dtype)
    feat = make_inducing_tensors_from_data(
        jax.random.PRNGKey(0), Xj, num_tensors=M, num_levels=nl,
        num_features=d, increments=True)
    model = SVGP.create(kern, liks.MultiClass(num_classes=C),
                        feat, num_latent=C, dtype=dtype)
    opt = optax.adam(2e-3)
    kw = dict(num_data=N, gamma=0.05, use_natgrad=True)
    rng = np.random.default_rng(0)

    def batches(k, seed):
        idx = np.stack([rng.choice(N, B, replace=False)
                        for _ in range(k)])
        Xb = jnp.stack([Xj[i] for i in idx])
        Yb = jnp.stack([yj[i] for i in idx])
        keys = jax.random.split(jax.random.PRNGKey(seed), k)
        return Xb, Yb, keys

    # host loop, synced EVERY step (float(elbo) per iteration): through
    # the relay a per-step sync materializes the dispatch's outputs, so
    # this is the worst case (a logging-per-step loop)
    step = make_step_fn(opt, **kw)
    st = init_state(model, opt)
    Xb, Yb, keys = batches(1, 0)
    st, e = step(st, Xb[0], Yb[0], keys[0])
    jax.block_until_ready(e)
    n1 = 10
    t0 = time.time()
    for i in range(n1):
        Xb, Yb, keys = batches(1, i + 1)
        st, e = step(st, Xb[0], Yb[0], keys[0])
        e = float(e)
    t_sync = time.time() - t0
    print(f"flagship host loop, sync each step: {n1/t_sync:.1f} steps/s "
          f"({t_sync/n1*1e3:.1f} ms/step)", flush=True)

    # host loop, async (fit()'s protocol: dispatch ahead, sync at the
    # end — the config-2 measurement mode)
    n2 = 30
    bs = [batches(1, 100 + i) for i in range(n2)]
    t0 = time.time()
    for Xb, Yb, keys in bs:
        st, e = step(st, Xb[0], Yb[0], keys[0])
    e = float(e)
    t_async = time.time() - t0
    print(f"flagship host loop, async (sync at end): "
          f"{n2/t_async:.1f} steps/s ({t_async/n2*1e3:.1f} ms/step)",
          flush=True)

    for k in (8, 32):
        multi = make_multi_step_fn(opt, **kw)
        st = init_state(model, opt)
        Xb, Yb, keys = batches(k, 100)
        st, es = multi(st, Xb, Yb, keys)
        jax.block_until_ready(es)
        ts = []
        for i in range(3):
            Xb, Yb, keys = batches(k, 200 + i)
            t0 = time.time()
            st, es = multi(st, Xb, Yb, keys)
            es = np.asarray(es)
            ts.append(time.time() - t0)
        assert np.all(np.isfinite(es))
        t_med = sorted(ts)[1]
        print(f"flagship scan k={k}: {k/t_med:.1f} steps/s "
              f"({t_med/k*1e3:.2f} ms/step device-side; last elbo "
              f"{es[-1]:.1f})", flush=True)


def job_pde_train():
    """SigGPDE end-to-end on-chip: SVGP classification with the
    UNTRUNCATED (Goursat PDE) kernel + inducing sequences, natgrad+Adam —
    the fork's flagship path as a full training loop on hardware (the
    kernel-level Goursat rows are in PERF.md; this is the missing
    steps/s row). Kuu routes through K_sym_psd (auto PSD floor), Kuf/Kdiag
    through the wavefront scan with adjoint-PDE gradients."""
    import jax
    import jax.numpy as jnp
    import optax
    from gpsig_tpu import likelihoods as liks
    from gpsig_tpu.data.synthetic import classification_sequences
    from gpsig_tpu.inducing import make_inducing_sequences_from_data
    from gpsig_tpu.kernels.pde import UntruncatedSignatureKernel
    from gpsig_tpu.models.svgp import SVGP
    from gpsig_tpu.training.loop import init_state, make_step_fn

    dtype = jnp.float32
    N, L, d, C, M, LZ, B = 200, 50, 2, 2, 32, 8, 50
    X, y = classification_sequences(seed=0, N=N, L=L, d=d,
                                    num_classes=C)
    Xj, yj = jnp.asarray(X, dtype), jnp.asarray(y)
    kern = UntruncatedSignatureKernel.create(
        d, lengthscales=1.5, normalization=True, dyadic_order=1,
        dtype=dtype)
    feat = make_inducing_sequences_from_data(
        jax.random.PRNGKey(0), Xj, M, LZ, d)
    model = SVGP.create(kern, liks.MultiClass(num_classes=C), feat,
                        num_latent=C, dtype=dtype)
    opt = optax.adam(2e-3)
    step = make_step_fn(opt, num_data=N, gamma=0.05, use_natgrad=True)
    state = init_state(model, opt)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    def one(state, i):
        idx = jnp.asarray(rng.choice(N, B, replace=False))
        k = jax.random.fold_in(key, i)
        state, elbo = step(state, Xj[idx], yj[idx], k)
        return state, float(elbo)

    t0 = time.time()
    state, e0 = one(state, 0)
    t_compile = time.time() - t0
    iters = 60
    t0 = time.time()
    es = []
    for i in range(1, iters + 1):
        state, e = one(state, i)
        es.append(e)
    t_run = time.time() - t0
    assert np.all(np.isfinite(es)), "non-finite ELBO in PDE training"
    print(f"pde_train: untruncated kernel (dyadic_order=1), N={N} L={L} "
          f"M={M} inducing sequences (LZ={LZ}), B={B}, C={C}: first step "
          f"(compile) {t_compile:.1f}s, then {iters} steps in "
          f"{t_run:.1f}s -> {iters/t_run:.1f} steps/s; ELBO "
          f"{e0:.1f} -> {es[-1]:.1f}")


def job_lags_pallas():
    """num_lags × fused engines on real hardware (VERDICT r3 #6 was
    interpret-only): SignatureRBF(num_lags=1) K + lag/gamma gradients,
    engine='pallas' vs 'xla' on-chip, order 1 (tuned kernel, d·2 channels)
    and order 2 (general kernel)."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.kernels.signature import SignatureRBF

    N, L, d = 128, 50, 2
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)

    for order in (1, 2):
        kx = SignatureRBF(d, 4, lengthscales=1.0, order=order,
                          normalization=True, num_lags=1,
                          dtype=jnp.float32, engine="xla")
        kp = kx.replace(engine="pallas")
        Kx = np.asarray(jax.jit(lambda k: k.K(X))(kx))
        Kp = np.asarray(jax.jit(lambda k: k.K(X))(kp))
        err = np.max(np.abs(Kp - Kx)) / (np.max(np.abs(Kx)) + 1e-9)

        def loss(kern):
            return jnp.sum(kern.K(X) ** 2)

        gx = jax.jit(jax.grad(loss))(kx)
        gp = jax.jit(jax.grad(loss))(kp)
        gerr = {}
        for name in ("raw_lags", "raw_gamma", "raw_lengthscales"):
            a = np.asarray(getattr(gx, name))
            b = np.asarray(getattr(gp, name))
            gerr[name] = float(
                np.max(np.abs(b - a)) / (np.max(np.abs(a)) + 1e-9))
        print(f"lags_pallas order={order}: K parity {err:.2e}; grad "
              f"parity {gerr}", flush=True)
        assert err < 5e-4 and all(v < 5e-3 for v in gerr.values())


def job_ho_gram_n800_grad():
    """Training-scale proof of the fused HO backward: jitted fwd+grad of
    an order-2 N=800 Gram on one chip — the configuration whose XLA-path
    vjp would materialise the [N², L, L] increments (51 GB, OOM). Finite
    gradients + compute wall; parity for this kernel is pinned at N=256
    (ho_gram_grad) and in interpret mode."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram_ho as fho

    N, L, d, nl, order = 800, 50, 2, 4, 2
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    Y = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)

    def loss(X, Y):
        lv = fho.fused_gram_ho_levels(X, Y, nl, order, "rbf", True,
                                      mxu="split")
        return jnp.sum(lv * (1.0 + 0.1 * lv))

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    gx, gy = g(X, Y)
    gx, gy = np.asarray(gx), np.asarray(gy)
    assert np.all(np.isfinite(gx)) and np.all(np.isfinite(gy))
    t = _median_time(
        lambda i: np.asarray(g(X * (1 + 1e-4 * i), Y)[0]))
    print(f"ho_gram_n800_grad: order-2 N=800 fwd+grad finite "
          f"(|X̄|max {np.max(np.abs(gx)):.3g}); {t*1e3:.1f} ms/call "
          f"incl. [800,50,2] fetch")


def job_ho_gram_kinds():
    """The general fused engine's full option surface on real hardware:
    Linear / Cosine / Poly (offset folded as a constant channel) base
    kernels and difference=False — parity vs the XLA reference + ms/gram
    at N=256 (interpret-mode parity already pins these on CPU; this run
    proves the Mosaic compilation path for each variant)."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram_ho as fho

    N, L, d, nl, order = 256, 50, 2, 4, 2
    R = 16
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    Y = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    ones = jnp.ones((N, L, 1), jnp.float32)
    Xp = jnp.concatenate([X, ones], -1)  # poly: x offset channel = 1
    Yp = jnp.concatenate([Y, 1.2 * ones], -1)  # y offset channel = offset

    for label, xa, ya, kind, diff in [
        ("linear diff=T", X, Y, "linear", True),
        ("cosine diff=T", X, Y, "cosine", True),
        ("poly3 diff=T", Xp, Yp, "poly3", True),
        ("rbf diff=F", X, Y, "rbf", False),
    ]:
        got = np.asarray(fho.fused_gram_ho_levels(
            xa, ya, nl, order, kind, diff, mxu="split"))
        want = np.asarray(fho._xla_reference_ho(
            xa, ya, nl, order, kind, diff))
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert np.all(np.isfinite(got))

        @jax.jit
        def grams(xv, seed, ya=ya, kind=kind, diff=diff):
            eps = 1e-4 * (seed + jnp.arange(R, dtype=xv.dtype))

            def body(c, e):
                out = fho.fused_gram_ho_levels(
                    xv * (1.0 + e), ya, nl, order, kind, diff,
                    mxu="split")
                return c, jnp.sum(out)

            return jax.lax.scan(body, 0.0, eps)[1]

        np.asarray(grams(xa, jnp.float32(0)))
        t = _median_time(
            lambda i, xa=xa: np.asarray(grams(xa, jnp.float32(i)))) / R
        print(f"ho_kinds {label} order={order}: parity {err:.2e}  "
              f"{t*1e3:.2f} ms/gram ({N*N/t/1e6:.1f}M entries/s)",
              flush=True)


def job_fused_pipeline():
    """A/B the software-pipelined fused-Gram column loop
    (GPSIG_FUSED_PIPELINE / _fused_fwd_impl(pipeline=)): DP matmuls for
    column j are issued before column j+2's base-kernel build so the VPU
    floor and the MXU passes can overlap instead of summing (PERF.md
    round-2 roofline: 1.74 ms VPU floor + ~0.71 ms/level 'split' passes
    add up today — perfect overlap would cap nl=4 at ~max(floor, passes)).
    Math identical; parity checked on-chip first."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import fused_gram as fg

    N, L, d = 256, 50, 2
    rng = np.random.default_rng(0)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    a = np.asarray(fg._fused_fwd_impl(X, X, 4, True, False, 8, "split",
                                      pipeline=True))
    b = np.asarray(fg._fused_fwd_impl(X, X, 4, True, False, 8, "split",
                                      pipeline=False))
    err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
    print(f"fused_pipeline parity (pipe vs plain, split): {err:.2e}",
          flush=True)

    R = 32
    for label, rbf, nl, mxu in [
        ("rbf nl=4 split", True, 4, "split"),
        ("rbf nl=1 split", True, 1, "split"),
        ("rbf nl=7 split", True, 7, "split"),
        ("rbf nl=4 default", True, 4, "default"),
    ]:
        row = []
        for pipe in (False, True):
            fn = jax.jit(
                lambda x, s, rbf=rbf, nl=nl, mxu=mxu, pipe=pipe:
                jax.lax.scan(
                    lambda c, e: (c, jnp.sum(fg._fused_fwd_impl(
                        x * (1 + e), x, nl, rbf, False, 8, mxu,
                        pipeline=pipe))),
                    0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
            np.asarray(fn(X, jnp.float32(0)))
            t = _median_time(
                lambda i, fn=fn: np.asarray(fn(X, jnp.float32(i))))
            row.append(t / R)
        print(f"pipeline {label}: plain {row[0]*1e3:.2f} ms -> pipelined "
              f"{row[1]*1e3:.2f} ms ({row[0]/row[1]:.2f}x, "
              f"{R*N*N/(row[1]*R)/1e6:.1f}M entries/s)", flush=True)


def job_nuts_scale():
    """VERDICT r3 #3: BASELINE config 5 at its prescribed scale on the
    chip — 128 chains, config-1-like data (N=100, L=50, d=2, nl=4),
    chunked dispatch, fused Pallas engines in the leapfrog. The XLA
    engine cannot run this configuration at all (PERF.md round-4: it
    faulted the TPU worker already at C=8, N=64 — vmapping it wants
    [C, N^2, L, L] ≈ 49 GB per leapfrog here). Reports draws/s from
    steady per-chunk walls, cross-chain ESS (Geyer/Vehtari) and min
    ESS/s, plus the measured 1x128 vmap-block utilization and its
    hypothetical (devices x chains/device) regroupings from the
    recorded leaf counts."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu import params as pr
    from gpsig_tpu.data.synthetic import regression_sequences
    from gpsig_tpu.kernels.signature import SignatureRBF
    from gpsig_tpu.models.gpr import GPR
    from gpsig_tpu.parallel import mesh as meshlib
    from gpsig_tpu.parallel.chains import make_chunked_sampler
    from gpsig_tpu.utils.metrics import effective_sample_size

    dtype = jnp.float32
    d, nl = 2, 4
    N, L = 100, 50
    C, WARM, SAMP, DEPTH, BLK = 128, 50, 50, 6, 2
    # optional argv: chain_blocks (sequential vmap blocks per device —
    # the worst-chain-serialization lever, A/B'd on-chip vs 1)
    GROUPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    X, y = regression_sequences(seed=0, N=N, L=L, d=d)
    Xj, yj = jnp.asarray(X, dtype), jnp.asarray(y, dtype)

    def logp(theta):
        ell = jnp.exp(theta[:d])
        var = jnp.exp(theta[d : d + nl + 1])
        noise = jnp.exp(theta[-1])
        kern = SignatureRBF(d, nl, lengthscales=1.0, order=1,
                            normalization=True, dtype=dtype,
                            engine="pallas")
        kern = kern.replace(raw_lengthscales=pr.inv_positive(ell),
                            raw_variances=pr.inv_positive(var))
        m = GPR.create(kern, noise_variance=noise, dtype=dtype)
        return m.log_marginal_likelihood(Xj, yj) - 0.5 * jnp.sum(
            theta**2) / 4.0

    dim = d + nl + 2
    mesh = meshlib.make_mesh()
    theta0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (C, dim),
                                     dtype)
    sampler = make_chunked_sampler(
        logp, mesh, num_warmup=WARM, num_samples=SAMP, max_depth=DEPTH,
        draws_per_dispatch=BLK, chain_blocks=GROUPS)
    walls = {"warmup": [], "sampling": []}
    last = [time.time()]

    def on_chunk(phase, pos, total):
        now = time.time()
        walls[phase].append(now - last[0])
        last[0] = now
        print(f"  {phase} {pos}/{total}: chunk wall "
              f"{walls[phase][-1]:.1f}s", flush=True)

    t0 = time.time()
    samples, info = sampler(jax.random.PRNGKey(0), theta0,
                            on_chunk=on_chunk)
    t_total = time.time() - t0
    s = np.asarray(samples)
    assert np.all(np.isfinite(s))

    # First chunk of each phase carries that phase's compile; steady =
    # median of the rest.
    med_samp = float(np.median(walls["sampling"][1:]))
    draws_s = C * BLK / med_samp
    ess = effective_sample_size(s)  # [dim]
    samp_steady = med_samp * len(walls["sampling"])
    acc = float(np.asarray(info["accept_prob"]).mean())
    div = float(np.asarray(info["diverging"]).mean())
    leaves = np.asarray(info["num_leaves"], np.float64)  # [C, SAMP]

    # Utilization of the on-device vmap block: useful/executed leapfrogs
    # per transition for the actual 1x128 run and every hypothetical
    # regrouping (leaf counts are grouping-independent).
    util = {}
    bsz = C
    while bsz >= 1:
        blocks = leaves.reshape(C // bsz, bsz, -1)
        useful = blocks.sum(axis=1)
        executed = bsz * blocks.max(axis=1)
        util[f"{C//bsz}dev_x{bsz}"] = round(
            float((useful / np.maximum(executed, 1)).mean()), 3)
        bsz //= 2

    print(f"nuts_scale: C={C} N={N} L={L} nl={nl} depth={DEPTH} "
          f"warm+samp={WARM}+{SAMP} blk={BLK} chain_blocks={GROUPS} "
          f"engine=pallas")
    print(f"  total wall {t_total:.1f}s; warmup chunks "
          f"first {walls['warmup'][0]:.1f}s "
          f"median {np.median(walls['warmup'][1:]):.1f}s; sampling "
          f"first {walls['sampling'][0]:.1f}s median {med_samp:.1f}s")
    print(f"  draws/s (steady) {draws_s:.1f}  accept {acc:.3f}  "
          f"divergent {div:.3f}  leaves/draw {leaves.mean():.1f} "
          f"(block max/transition {leaves.max(0).mean():.1f})")
    print(f"  cross-chain ESS ({C}x{SAMP} draws): min {ess.min():.0f} "
          f"med {np.median(ess):.0f} max {ess.max():.0f}; min ESS/s "
          f"{ess.min()/samp_steady:.2f}")
    print(f"  vmap-block utilization (measured leaves): {util}")


def job_nuts_production():
    """VERDICT r4 #6: config 5 at production length — the nuts_scale
    model (128 chains, N=100, L=50, nl=4, fused engines) run for >= 500
    warmup + >= 500 draws through the checkpointed chunked sampler at
    the measured chain_blocks optimum, so the ESS and min-ESS/s
    headline rest on production-length chains; adds split-R̂ (Vehtari
    < 1.01 bar). argv: [chain_blocks=8] [warm=500] [samp=500]
    [checkpoint_dir=/tmp/gpsig_nuts_prod] — rerun after a relay drop to
    resume from the last finished chunk."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu import params as pr
    from gpsig_tpu.data.synthetic import regression_sequences
    from gpsig_tpu.kernels.signature import SignatureRBF
    from gpsig_tpu.models.gpr import GPR
    from gpsig_tpu.parallel import mesh as meshlib
    from gpsig_tpu.parallel.chains import make_chunked_sampler
    from gpsig_tpu.utils.metrics import effective_sample_size, split_rhat

    dtype = jnp.float32
    d, nl = 2, 4
    N, L = 100, 50
    # BLK=2 as in nuts_scale: each transition of this logp costs ~100 ms
    # on-chip × 128 chains, so 25 transitions/dispatch is a ~270 s XLA
    # execution — measured to CRASH the TPU worker through the relay
    # ("TPU worker process crashed"); 2 transitions ≈ 20 s survives.
    C, DEPTH, BLK = 128, 6, 2
    GROUPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    WARM = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    SAMP = int(sys.argv[4]) if len(sys.argv) > 4 else 500
    cdir = sys.argv[5] if len(sys.argv) > 5 else "/tmp/gpsig_nuts_prod"
    X, y = regression_sequences(seed=0, N=N, L=L, d=d)
    Xj, yj = jnp.asarray(X, dtype), jnp.asarray(y, dtype)

    def logp(theta):
        ell = jnp.exp(theta[:d])
        var = jnp.exp(theta[d : d + nl + 1])
        noise = jnp.exp(theta[-1])
        kern = SignatureRBF(d, nl, lengthscales=1.0, order=1,
                            normalization=True, dtype=dtype,
                            engine="pallas")
        kern = kern.replace(raw_lengthscales=pr.inv_positive(ell),
                            raw_variances=pr.inv_positive(var))
        m = GPR.create(kern, noise_variance=noise, dtype=dtype)
        return m.log_marginal_likelihood(Xj, yj) - 0.5 * jnp.sum(
            theta**2) / 4.0

    dim = d + nl + 2
    mesh = meshlib.make_mesh()
    theta0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (C, dim),
                                     dtype)
    sampler = make_chunked_sampler(
        logp, mesh, num_warmup=WARM, num_samples=SAMP, max_depth=DEPTH,
        draws_per_dispatch=BLK, chain_blocks=GROUPS)
    walls = {"warmup": [], "sampling": []}
    last = [time.time()]

    def on_chunk(phase, pos, total):
        now = time.time()
        walls[phase].append(now - last[0])
        last[0] = now
        print(f"  {phase} {pos}/{total}: chunk wall "
              f"{walls[phase][-1]:.1f}s", flush=True)

    t0 = time.time()
    out = sampler(jax.random.PRNGKey(0), theta0, on_chunk=on_chunk,
                  checkpoint_dir=cdir)
    t_total = time.time() - t0
    samples, info = out
    s = np.asarray(samples)
    assert np.all(np.isfinite(s))

    med_samp = float(np.median(walls["sampling"][1:]))
    draws_s = C * BLK / med_samp
    ess = effective_sample_size(s)
    rhat = split_rhat(s)
    samp_steady = med_samp * max(len(walls["sampling"]), 1)
    acc = float(np.asarray(info["accept_prob"]).mean())
    div = float(np.asarray(info["diverging"]).mean())
    print(f"nuts_production: C={C} N={N} L={L} nl={nl} depth={DEPTH} "
          f"warm+samp={WARM}+{SAMP} blk={BLK} chain_blocks={GROUPS} "
          f"engine=pallas")
    print(f"  total wall {t_total:.1f}s (this slice); sampling chunk "
          f"median {med_samp:.1f}s -> {draws_s:.1f} draws/s steady")
    print(f"  accept {acc:.3f}  divergent {div:.4f}")
    print(f"  cross-chain ESS ({C}x{SAMP} draws): min {ess.min():.0f} "
          f"med {np.median(ess):.0f} max {ess.max():.0f}; min ESS/s "
          f"{ess.min()/samp_steady:.2f}")
    print(f"  split-Rhat: max {rhat.max():.4f} "
          f"(per-coord {[round(float(r), 4) for r in rhat]})")


def job_tsg_kuf():
    """General fused tens-vs-seq engine on hardware (VERDICT r4 #2): the
    flagship Kuf shape (M=500 inducing tensors, B=50, L=50, d=3, nl=5)
    at order=2 with increments — compiled parity vs the XLA path +
    amortized fwd and fwd+grad timing — plus compiled parity of every
    other base kind / difference=False at a smaller shape."""
    import jax
    import jax.numpy as jnp
    from gpsig_tpu.ops.pallas import tens_seq_general as tsg
    from gpsig_tpu.ops.signature import tensor_factor_count

    T, N, L, d, nl, R = 500, 50, 50, 3, 5, 16
    order = 2
    F = tensor_factor_count(nl)
    rng = np.random.default_rng(0)
    Z = jnp.asarray(0.3 * rng.standard_normal((T, F, 2, d)), jnp.float32)
    X = jnp.asarray((0.3 * rng.standard_normal((N, L, d))).cumsum(1),
                    jnp.float32)
    want = np.asarray(jax.jit(
        lambda z, x: tsg._xla_reference_tens_seq_general(
            z, x, nl, order, "rbf", True, True)
    )(Z, X))
    scale = np.abs(want).max(axis=(1, 2), keepdims=True) + 1e-30
    fn = jax.jit(lambda z, x: tsg.fused_tens_seq_general_levels(
        z, x, nl, order, "rbf", True, True, False, "split"))
    got = np.asarray(fn(Z, X))
    err = np.max(np.abs(got - want) / scale)
    rep = jax.jit(lambda z, x, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(tsg.fused_tens_seq_general_levels(
            z, x * (1.0 + e), nl, order, "rbf", True, True, False,
            "split"))),
        0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
    np.asarray(rep(Z, X, jnp.float32(0)))
    t = _median_time(lambda i: np.asarray(rep(Z, X, jnp.float32(i))))
    print(f"tsg_kuf order=2 rbf+increments: scaled err {err:.2e}  "
          f"{t/R*1e3:.2f} ms/Kuf ({R * T * N / t:.0f} entries/s)")

    # fwd+grad through the fused VMEM backward
    w = jnp.asarray(rng.standard_normal((nl + 1, T, N)), jnp.float32)
    gfn = jax.jit(jax.grad(lambda z, x: jnp.sum(
        w * tsg.fused_tens_seq_general_levels(
            z, x, nl, order, "rbf", True, True, False, "split")),
        argnums=(0, 1)))
    zb, xb = gfn(Z, X)
    assert np.all(np.isfinite(np.asarray(zb)))
    _, vjp = jax.vjp(lambda z, x: tsg._xla_reference_tens_seq_general(
        z, x, nl, order, "rbf", True, True), Z, X)
    zw, xw = vjp(w)
    gerr = max(
        float(jnp.max(jnp.abs(zb - zw)) / (jnp.max(jnp.abs(zw)) + 1e-30)),
        float(jnp.max(jnp.abs(xb - xw)) / (jnp.max(jnp.abs(xw)) + 1e-30)),
    )
    repg = jax.jit(lambda z, x, s: jax.lax.scan(
        lambda c, e: (c, sum(jnp.sum(v) for v in gfn(z, x * (1.0 + e)))),
        0.0, 1e-4 * (s + jnp.arange(4, dtype=x.dtype)))[1])
    np.asarray(repg(Z, X, jnp.float32(0)))
    tg = _median_time(lambda i: np.asarray(repg(Z, X, jnp.float32(i))))
    print(f"  fwd+grad: scaled err {gerr:.2e}  {tg/4*1e3:.2f} ms/step")

    # XLA-path timing at the same shape (the old engine's row)
    repx = jax.jit(lambda z, x, s: jax.lax.scan(
        lambda c, e: (c, jnp.sum(tsg._xla_reference_tens_seq_general(
            z, x * (1.0 + e), nl, order, "rbf", True, True))),
        0.0, 1e-4 * (s + jnp.arange(R, dtype=x.dtype)))[1])
    np.asarray(repx(Z, X, jnp.float32(0)))
    tx = _median_time(lambda i: np.asarray(repx(Z, X, jnp.float32(i))))
    print(f"  XLA path: {tx/R*1e3:.2f} ms/Kuf (fused {tx/t:.2f}x)")

    # every other variant: compiled parity at a smaller shape
    T2, nl2 = 256, 4
    F2 = tensor_factor_count(nl2)
    Z2 = jnp.asarray(0.3 * rng.standard_normal((T2, F2, d)), jnp.float32)
    for kind, o, diff in [("linear", 2, True), ("cosine", 2, True),
                          ("poly2", 2, True), ("rbf", 3, True),
                          ("rbf", 2, False), ("poly2", 1, False)]:
        f2 = jax.jit(lambda z, x, kind=kind, o=o, diff=diff:
                     tsg.fused_tens_seq_general_levels(
                         z, x, nl2, o, kind, False, diff, False, "split"))
        t0 = time.time()
        got = np.asarray(f2(Z2, X))
        tc = time.time() - t0
        want = np.asarray(jax.jit(
            lambda z, x, kind=kind, o=o, diff=diff:
            tsg._xla_reference_tens_seq_general(z, x, nl2, o, kind, False,
                                                diff))(Z2, X))
        sc = np.abs(want).max(axis=(1, 2), keepdims=True) + 1e-30
        err = np.max(np.abs(got - want) / sc)
        print(f"  {kind} o={o} diff={diff}: compile {tc:.1f}s "
              f"scaled err {err:.2e}")


def job_vosfpde_train():
    """The composed SigGPDE model on hardware (VERDICT r4 #1): VOSF
    orthogonal features under the untruncated PDE prior — Kuu = I, Kuf =
    rescaled signature coordinates, Knn = PDE diag — trained end-to-end
    with diagonal natgrad + Adam in float32."""
    import jax
    import jax.numpy as jnp
    import optax
    from gpsig_tpu import likelihoods as liks
    from gpsig_tpu.data.synthetic import classification_sequences
    from gpsig_tpu.kernels.pde import UntruncatedSignatureKernel
    from gpsig_tpu.kernels.vosf import OrthogonalSignatureFeatures
    from gpsig_tpu.models.svgp import SVGP
    from gpsig_tpu.training.loop import init_state, make_step_fn

    dtype = jnp.float32
    N, L, d, C, NL, B = 200, 50, 2, 2, 4, 50
    X, y = classification_sequences(seed=0, N=N, L=L, d=d, num_classes=C)
    Xj, yj = jnp.asarray(X, dtype), jnp.asarray(y)
    kern = UntruncatedSignatureKernel.create(
        d, lengthscales=1.5, normalization=True, dyadic_order=1,
        dtype=dtype)
    feat = OrthogonalSignatureFeatures.for_kernel(kern, num_levels=NL)
    model = SVGP.create(kern, liks.MultiClass(num_classes=C), feat,
                        num_latent=C, q_diag=True, dtype=dtype)
    opt = optax.adam(5e-3)
    step = make_step_fn(opt, num_data=N, gamma=0.1, use_natgrad=True)
    state = init_state(model, opt)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    def one(state, i):
        idx = jnp.asarray(rng.choice(N, B, replace=False))
        k = jax.random.fold_in(key, i)
        state, elbo = step(state, Xj[idx], yj[idx], k)
        return state, float(elbo)

    t0 = time.time()
    state, e0 = one(state, 0)
    t_compile = time.time() - t0
    iters = 60
    t0 = time.time()
    es = []
    for i in range(1, iters + 1):
        state, e = one(state, i)
        es.append(e)
    t_run = time.time() - t0
    assert np.all(np.isfinite(es)), "non-finite ELBO in VOSF-PDE training"
    # the cached posterior (the compat prediction path) stays finite
    post = state.model.posterior()
    pm, pv = jax.jit(lambda p, x: p.predict_y(x))(post, Xj)
    assert np.all(np.isfinite(np.asarray(pm)))
    assert np.all(np.isfinite(np.asarray(pv)))
    M = feat.num_inducing
    print(f"vosfpde_train: untruncated prior (dyadic_order=1) + VOSF "
          f"features (M={M}, levels {NL}), N={N} L={L} B={B} C={C}: "
          f"first step (compile) {t_compile:.1f}s, then {iters} steps in "
          f"{t_run:.1f}s -> {iters/t_run:.1f} steps/s; ELBO "
          f"{e0:.1f} -> {es[-1]:.1f}; posterior predict finite")


def job_flagship_o2():
    """Order-2 SVGP training at the flagship shape (VERDICT r4 #2 'done'
    criterion): M=500 inducing tensors, nl=5, order=2, B=50, C=10 — the
    Kuf goes through the general fused engine, the Kuu through the
    tensor algebra, gradients through the fused VMEM backward."""
    import jax
    import jax.numpy as jnp
    import optax
    from gpsig_tpu import likelihoods as liks
    from gpsig_tpu.data.synthetic import classification_sequences
    from gpsig_tpu.inducing import make_inducing_tensors_from_data
    from gpsig_tpu.kernels.signature import SignatureRBF
    from gpsig_tpu.models.svgp import SVGP
    from gpsig_tpu.training.loop import init_state, make_step_fn

    dtype = jnp.float32
    N, L, d, C, M, NL, B = 500, 50, 2, 10, 500, 5, 50
    X, y = classification_sequences(seed=0, N=N, L=L, d=d, num_classes=C)
    Xj, yj = jnp.asarray(X, dtype), jnp.asarray(y)
    kern = SignatureRBF(d, NL, lengthscales=1.0, order=2,
                        normalization=True, dtype=dtype, engine="pallas")
    feat = make_inducing_tensors_from_data(
        jax.random.PRNGKey(0), Xj, num_tensors=M, num_levels=NL,
        num_features=d, increments=True)
    model = SVGP.create(kern, liks.MultiClass(num_classes=C), feat,
                        num_latent=C, dtype=dtype)
    opt = optax.adam(1e-3)
    step = make_step_fn(opt, num_data=N, gamma=0.05, use_natgrad=True)
    state = init_state(model, opt)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    def one(state, i):
        idx = jnp.asarray(rng.choice(N, B, replace=False))
        k = jax.random.fold_in(key, i)
        state, elbo = step(state, Xj[idx], yj[idx], k)
        return state, float(elbo)

    t0 = time.time()
    state, e0 = one(state, 0)
    t_compile = time.time() - t0
    iters = 60
    t0 = time.time()
    es = []
    for i in range(1, iters + 1):
        state, e = one(state, i)
        es.append(e)
    t_run = time.time() - t0
    assert np.all(np.isfinite(es)), "non-finite ELBO at order-2 flagship"
    print(f"flagship_o2: M={M} nl={NL} order=2 B={B} C={C}: first step "
          f"(compile) {t_compile:.1f}s, then {iters} steps in "
          f"{t_run:.1f}s -> {iters/t_run:.1f} steps/s; ELBO "
          f"{e0:.1f} -> {es[-1]:.1f}")


if __name__ == "__main__":
    job = sys.argv[1] if len(sys.argv) > 1 else "fused_fwd"
    t0 = time.time()
    {"fused_fwd": job_fused_fwd,
     "fused_bwd": job_fused_bwd,
     "goursat": job_goursat,
     "goursat_sweep": job_goursat_sweep,
     "sig_gram_ho": job_sig_gram_ho,
     "fused_mxu": job_fused_mxu,
     "tens_seq": job_tens_seq,
     "goursat_fused": job_goursat_fused,
     "fused_breakdown": job_fused_breakdown,
     "fused_fwdgrad": job_fused_fwdgrad,
     "tens_seq_grad": job_tens_seq_grad,
     "sharded_step": job_sharded_step,
     "stable_chol": job_stable_chol,
     "low_rank": job_low_rank,
     "nuts": job_nuts,
     "ho_gram": job_ho_gram,
     "ho_gram_n800": job_ho_gram_n800,
     "ho_gram_grad": job_ho_gram_grad,
     "posterior": job_posterior,
     "nuts_pallas": job_nuts_pallas,
     "nuts_scale": job_nuts_scale,
     "fused_pipeline": job_fused_pipeline,
     "ho_gram_kinds": job_ho_gram_kinds,
     "ho_gram_n800_grad": job_ho_gram_n800_grad,
     "lags_pallas": job_lags_pallas,
     "pde_train": job_pde_train,
     "tsg_kuf": job_tsg_kuf,
     "nuts_production": job_nuts_production,
     "vosfpde_train": job_vosfpde_train,
     "flagship_o2": job_flagship_o2,
     "flagship_scan": job_flagship_scan}[job]()
    print(f"total {time.time()-t0:.1f} s")
