"""Accuracy-regression harness over the frozen synthetic UEA-like suite.

The reference's de-facto integration test is benchmark reproduction on UEA
archives (SURVEY.md §4 item 3). With no archives on this machine, this
harness makes that target falsifiable offline: it trains the standard
protocol (SVGP + inducing tensors, alternating NatGrad+Adam — SURVEY.md
§2.1 Benchmarks row) on the five frozen ``gpsig_tpu.data.uea_like``
datasets and checks test accuracy + NLPP against the committed windows in
``benchmarks/expected_windows.json`` (calibrated from float64 CPU runs).
Exit code 1 on any violation.

Recalibrate (only after an *intentional* change to the suite or protocol):
    python benchmarks/run_all.py --cpu --x64 --write-windows
Calibration runs the protocol once per seed in ``--calib-seeds`` (default
0 1 2) and sets acc_min = min-over-seeds − max(0.04, seed spread) and
nlpp_max = max-over-seeds·1.15 + 0.05, so a kernel bug costing a few
points on every dataset fails the harness while seed/f32 jitter passes
(VERDICT r2 #6). The checking run itself always uses seed 0.
Real UEA archives (when present under GPSIG_TPU_DATA_DIR) can be named via
``--datasets`` too; they are reported but never window-checked.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from benchmarks.common import (
    accuracy_and_nlpp,
    base_parser,
    get_classification_data,
    setup_jax,
)

WINDOWS_PATH = os.path.join(os.path.dirname(__file__),
                            "expected_windows.json")

# Frozen training protocol — changing any of these invalidates the windows.
PROTOCOL = dict(num_tensors=64, num_levels=4, batch=50, iters=2000,
                learning_rate=1e-2, gamma=0.1, seed=0)
# Variant protocols (VERDICT r3 #7: the VOSF and low-rank tracks carry
# their own frozen windows so a quality regression in ops/explicit.py or
# ops/low_rank.py fails this harness, not just unit tests). Suite entries
# are named "<dataset>@<variant>".
VOSF_PROTOCOL = dict(variant="vosf", num_levels=6, batch=50, iters=2000,
                     learning_rate=1e-2, gamma=0.0, seed=0)
LOWRANK_PROTOCOL = dict(variant="lowrank", num_components=64, num_levels=4,
                        num_sequences=64, seq_len=10, batch=50, iters=1500,
                        learning_rate=1e-2, gamma=0.1, seed=0)
# SigGPDE end-to-end guard (VERDICT r4 weak #3): untruncated (Goursat FD)
# kernel + inducing sequences with the JOINT-PSD batch covariance
# (InducingSequences.covariances_full — the round-5 Kuu/Kuf consistency
# fix), natgrad+Adam — a quality regression in the wavefront solver, the
# PSD projection, or the variance floor fails this window, not just unit
# tests. Honest scope note: the frozen synthetic stand-ins are far
# rougher than real UEA series (per-channel total variation 20–65 vs the
# smooth real archives), a regime where the untruncated kernel's
# classification accuracy is structurally weak even though the kernel
# itself is healthy (PDE-kernel 1-NN hits 0.64 on smoothed SynthLibras)
# — the window therefore pins the deterministic acc/nlpp of the whole
# pipeline rather than showcasing accuracy; the fork's own scaling
# answer (VOSF) is guarded by the @vosfpde window below.
PDE_PROTOCOL = dict(variant="pde", num_levels=0, dyadic_order=1,
                    num_sequences=32, seq_len=8, batch=50, iters=300,
                    learning_rate=2e-3, gamma=0.05, seed=0)
# The actual SigGPDE headline model (VERDICT r4 missing #1): VOSF
# orthogonal features UNDER the untruncated PDE prior — Kuu = I, Kuf =
# rescaled signature coordinates, Knn = PDE kernel diag; the truncation
# gap is real prior mass handled by the floored conditional. lr 2e-3 /
# gamma 0.05 measured stable to >= 1000 iters (1e-2/0.1 degrades the
# kernel hypers after ~100: acc 0.747 vs 0.573-majority-collapse).
VOSFPDE_PROTOCOL = dict(variant="vosfpde", num_levels=4, dyadic_order=1,
                        batch=50, iters=1000, learning_rate=2e-3,
                        gamma=0.05, seed=0)
# CharTraj for the low-rank guard: 300 test points give a usable floor
# (0.38 vs ~0.17 chance); BasicMotions' 40 points spread too wide (its
# window stays committed but out of the default suite).
VARIANT_SUITE = ["SynthGunPoint@vosf", "SynthCharTraj@lowrank",
                 "SynthERing@pde", "SynthGunPoint@vosfpde"]


def _build_model(name, variant, protocol, Xtr_j, d, C, dtype):
    import jax
    import jax.numpy as jnp

    from gpsig_tpu import likelihoods as liks
    from gpsig_tpu.models.svgp import SVGP

    nl = protocol["num_levels"]
    key = jax.random.PRNGKey(protocol["seed"])
    if variant == "vosf":
        from gpsig_tpu.kernels.vosf import (
            ExplicitSignatureKernel,
            OrthogonalSignatureFeatures,
        )

        kern = ExplicitSignatureKernel.create(
            d, nl, lengthscales=float(np.sqrt(d)), normalization=True,
            dtype=dtype)
        feat = OrthogonalSignatureFeatures.for_kernel(kern)
        return SVGP.create(kern, liks.MultiClass(num_classes=C), feat,
                           num_latent=C, q_diag=True, dtype=dtype)
    if variant == "pde":
        from gpsig_tpu.inducing import (
            InducingSequences,
            make_inducing_sequences_from_data,
        )
        from gpsig_tpu.kernels.pde import UntruncatedSignatureKernel

        kern = UntruncatedSignatureKernel.create(
            d, lengthscales=float(np.sqrt(d)), normalization=True,
            dyadic_order=protocol["dyadic_order"], dtype=dtype)
        base = make_inducing_sequences_from_data(
            key, Xtr_j, protocol["num_sequences"], protocol["seq_len"], d)
        feat = InducingSequences.create(base.raw_Z, joint_psd=True)
        return SVGP.create(kern, liks.MultiClass(num_classes=C), feat,
                           num_latent=C, dtype=dtype)
    if variant == "vosfpde":
        from gpsig_tpu.kernels.pde import UntruncatedSignatureKernel
        from gpsig_tpu.kernels.vosf import OrthogonalSignatureFeatures

        kern = UntruncatedSignatureKernel.create(
            d, lengthscales=float(np.sqrt(d)), normalization=True,
            dyadic_order=protocol["dyadic_order"], dtype=dtype)
        feat = OrthogonalSignatureFeatures.for_kernel(kern, num_levels=nl)
        return SVGP.create(kern, liks.MultiClass(num_classes=C), feat,
                           num_latent=C, q_diag=True, dtype=dtype)
    if variant == "lowrank":
        from gpsig_tpu.inducing import make_inducing_sequences_from_data
        from gpsig_tpu.kernels.low_rank import LowRankSignatureRBF

        # The sketch index sets and Nystrom landmarks are model
        # configuration, not a training seed: pin them so the calibration
        # seeds measure optimization variance only (a seed-dependent
        # sketch made the window floor useless: acc 0.30/0.60/0.475).
        k1 = jax.random.PRNGKey(20240820)
        k2 = key
        kern = LowRankSignatureRBF(
            k1, Xtr_j, d, nl,
            num_components=protocol["num_components"],
            lengthscales=float(np.sqrt(d)), normalization=True,
            dtype=dtype)
        feat = make_inducing_sequences_from_data(
            k2, Xtr_j, protocol["num_sequences"], protocol["seq_len"], d)
        return SVGP.create(kern, liks.MultiClass(num_classes=C), feat,
                           num_latent=C, dtype=dtype)
    from gpsig_tpu.inducing import make_inducing_tensors_from_data
    from gpsig_tpu.kernels.signature import SignatureRBF

    kern = SignatureRBF(d, nl, lengthscales=float(np.sqrt(d)), order=1,
                        normalization=True, dtype=dtype)
    feat = make_inducing_tensors_from_data(
        key, Xtr_j, num_tensors=protocol["num_tensors"], num_levels=nl,
        num_features=d, increments=True,
    )
    return SVGP.create(kern, liks.MultiClass(num_classes=C), feat,
                       num_latent=C, dtype=dtype)


def split_variant(name):
    """'SynthGunPoint@vosf' -> ('SynthGunPoint', 'vosf', its protocol)."""
    if "@" not in name:
        return name, "svgp", PROTOCOL
    base, variant = name.split("@", 1)
    proto = {"vosf": VOSF_PROTOCOL, "lowrank": LOWRANK_PROTOCOL,
             "pde": PDE_PROTOCOL, "vosfpde": VOSFPDE_PROTOCOL}[variant]
    return base, variant, proto


def run_dataset(name, args, protocol=None):
    import jax  # noqa: F401
    import jax.numpy as jnp

    from gpsig_tpu.training.loop import fit

    base, variant, default_proto = split_variant(name)
    protocol = protocol or default_proto
    Xtr, ytr, Xte, yte, _ = get_classification_data(base, protocol["seed"])
    dtype = jnp.float64 if args.x64 else jnp.float32
    d = Xtr.shape[-1]
    C = int(max(ytr.max(), yte.max())) + 1
    Xtr_j = jnp.asarray(Xtr, dtype)

    model = _build_model(base, variant, protocol, Xtr_j, d, C, dtype)
    iters = args.iters or protocol["iters"]
    t0 = time.time()
    model, hist = fit(
        model, Xtr_j, jnp.asarray(ytr), num_iters=iters,
        batch_size=min(protocol["batch"], len(ytr)),
        learning_rate=protocol["learning_rate"],
        gamma=protocol["gamma"], use_natgrad=protocol["gamma"] > 0,
        seed=protocol["seed"],
    )
    t_train = time.time() - t0
    acc, nlpp = accuracy_and_nlpp(model, jnp.asarray(Xte, dtype), yte)
    return dict(dataset=name, num_train=len(ytr), num_test=len(yte),
                num_classes=C, acc=acc, nlpp=nlpp,
                final_elbo=float(hist[-1][1]),
                train_time_s=round(t_train, 2))


def check_window(res, win):
    fails = []
    if res["acc"] < win["acc_min"]:
        fails.append(f"acc {res['acc']:.3f} < min {win['acc_min']:.3f}")
    if res["nlpp"] > win["nlpp_max"]:
        fails.append(f"nlpp {res['nlpp']:.3f} > max {win['nlpp_max']:.3f}")
    return fails


def main():
    p = base_parser(__doc__)
    p.add_argument("--datasets", nargs="*", default=None,
                   help="subset (default: the full frozen suite)")
    p.add_argument("--write-windows", action="store_true",
                   help="recalibrate expected_windows.json from this run "
                        "(requires --cpu --x64)")
    p.add_argument("--calib-seeds", type=int, nargs="*", default=[0, 1, 2],
                   help="training seeds used by --write-windows")
    args = p.parse_args()
    setup_jax(args)

    from gpsig_tpu.data import uea_like

    names = args.datasets or (
        uea_like.available_datasets() + VARIANT_SUITE
    )
    windows = {}
    if os.path.exists(WINDOWS_PATH):
        windows = json.load(open(WINDOWS_PATH))

    if args.write_windows and not (args.cpu and args.x64):
        p.error("--write-windows requires --cpu --x64 (windows are "
                "calibrated from the float64 CPU ground truth)")

    if args.write_windows:
        new = dict(windows)  # incremental: finished datasets land at once
        for name in names:
            base, variant, base_proto = split_variant(name)
            if base not in uea_like.available_datasets():
                continue
            fingerprint = uea_like.dataset_fingerprint(base)
            old = windows.get(name, {})
            # a seed measurement can be reused from the committed file iff
            # the dataset (fingerprint) and training protocol are unchanged
            # — the suite is deterministic per seed (verified: rerun
            # reproduces the committed values bit-for-bit)
            old_ok = (old.get("fingerprint") == fingerprint
                      and {k: v for k, v in old.get(
                          "protocol", {}).items() if k != "seed"}
                      == {k: v for k, v in base_proto.items()
                          if k != "seed"})
            old_meas = old.get("measured", {}) if old_ok else {}
            old_acc = dict(old_meas.get("acc_per_seed", {}))
            old_nlpp = dict(old_meas.get("nlpp_per_seed", {}))
            if old_ok and "acc" in old_meas:  # pre-r3 single-seed format
                s0 = str(old.get("protocol", {}).get("seed", 0))
                old_acc.setdefault(s0, old_meas["acc"])
                old_nlpp.setdefault(s0, old_meas["nlpp"])
            accs, nlpps = [], []
            for seed in args.calib_seeds:
                if str(seed) in old_acc:
                    accs.append(old_acc[str(seed)])
                    nlpps.append(old_nlpp[str(seed)])
                    print(f"{name:>18} seed={seed} "
                          f"acc={accs[-1]:.3f} nlpp={nlpps[-1]:.3f} "
                          f"(reused)", flush=True)
                    continue
                proto = dict(base_proto, seed=seed)
                res = run_dataset(name, args, protocol=proto)
                accs.append(res["acc"])
                nlpps.append(res["nlpp"])
                print(f"{name:>18} seed={seed} acc={res['acc']:.3f} "
                      f"nlpp={res['nlpp']:.3f} "
                      f"t={res['train_time_s']:.0f}s", flush=True)
            spread = max(accs) - min(accs)
            new[name] = dict(
                fingerprint=fingerprint,
                acc_min=round(max(0.0, min(accs) - max(0.04, spread)), 3),
                nlpp_max=round(max(nlpps) * 1.15 + 0.05, 3),
                measured=dict(acc_per_seed=dict(zip(
                    map(str, args.calib_seeds), accs)),
                    nlpp_per_seed=dict(zip(
                        map(str, args.calib_seeds), nlpps)),
                    acc_spread=round(spread, 4)),
                protocol=base_proto,
                calib_seeds=args.calib_seeds,
            )
            # atomic replace: a crash mid-dump must not truncate the
            # committed calibration file the seed-reuse logic reads back
            tmp = WINDOWS_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(new, f, indent=1, sort_keys=True)
            os.replace(tmp, WINDOWS_PATH)
            print(f"updated {WINDOWS_PATH} [{name}]", flush=True)
        return

    results, failures = [], []
    for name in names:
        res = run_dataset(name, args)
        base, _, _ = split_variant(name)
        frozen = base in uea_like.available_datasets()
        if frozen:
            res["fingerprint"] = uea_like.dataset_fingerprint(base)
        results.append(res)
        status = "—"
        if frozen and name in windows:
            win = windows[name]
            fails = check_window(res, win)
            if win.get("fingerprint") is not None and res[
                "fingerprint"
            ] != win["fingerprint"]:
                fails.append("dataset fingerprint changed — generator "
                             "drifted, windows invalid")
            if fails:
                failures.append((name, fails))
                status = "FAIL: " + "; ".join(fails)
            else:
                status = "ok"
        print(f"{res['dataset']:>18}  N={res['num_train']:>4}/"
              f"{res['num_test']:<4} C={res['num_classes']:<2} "
              f"acc={res['acc']:.3f} nlpp={res['nlpp']:.3f} "
              f"elbo={res['final_elbo']:.1f} "
              f"t={res['train_time_s']:.0f}s  {status}", flush=True)

    print(json.dumps({"suite": "uea_like", "n_datasets": len(results),
                      "mean_acc": round(float(np.mean([r["acc"] for r in
                                                       results])), 4),
                      "failures": len(failures)}))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
