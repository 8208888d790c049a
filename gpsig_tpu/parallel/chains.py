"""Multi-device NUTS: chains sharded over the mesh's ``data`` axis with
step-size adaptation statistics reduced via collectives (BASELINE config 5).

Each device runs a block of chains (vmap inside shard_map); during warmup
the dual-averaging acceptance statistic is ``pmean``-reduced over *all*
chains on *all* devices, so every chain adapts the same step size — the
cross-host collective rides ICI/DCN exactly like the SVI psum.

``draws_per_dispatch`` bounds how many NUTS transitions run inside one
device dispatch: the host loops over jitted chunks, carrying the full
adaptation state (NUTS state, dual-averaging, Welford mass, keys) between
them. This matters twice in production: (a) a single XLA execution holding
the chip for the entire warmup+sampling run can exceed an executor/relay
deadline (observed through the axon relay as ``UNAVAILABLE: TPU device
error`` on the monolithic dispatch); (b) the chunk boundary is a natural
checkpoint/progress point for long runs. The chunked path is bit-identical
to the monolithic one — ``make_warm_step`` keys the mass-matrix window on
the *absolute* warmup index, and key threading is unchanged — which
``tests/test_nuts.py::test_chunked_dispatch_matches_monolithic`` pins.
Use ``make_chunked_sampler`` directly to reuse the compiled chunk
functions across repeated sampling calls (one trace per chunk size).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from gpsig_tpu.mcmc.nuts import NutsState, nuts_kernel
from gpsig_tpu.mcmc.sample import (
    da_init,
    make_samp_step,
    make_warm_step,
    run_nuts,
    welford_init,
)
from gpsig_tpu.parallel.mesh import DATA_AXIS


def run_chains_sharded(
    key, logp_fn, theta0s, mesh, num_warmup=500, num_samples=500,
    max_depth=8, target_accept=0.8, init_step_size=0.1,
    shared_step_size=True, draws_per_dispatch=None,
):
    """theta0s: [C, D] with C divisible by the mesh data-axis size.

    draws_per_dispatch: if set, no single device dispatch runs more than
    this many NUTS transitions (host loop over jitted chunks; see module
    docstring). ``None`` keeps the monolithic single-dispatch path.

    Returns (samples [C, num_samples, D], info pytree)."""
    C = theta0s.shape[0]
    n_dev = mesh.shape[DATA_AXIS]
    if C % n_dev:
        raise ValueError(f"chains {C} not divisible by devices {n_dev}")

    if draws_per_dispatch is not None:
        sampler = make_chunked_sampler(
            logp_fn, mesh, num_warmup=num_warmup,
            num_samples=num_samples, max_depth=max_depth,
            target_accept=target_accept, init_step_size=init_step_size,
            shared_step_size=shared_step_size,
            draws_per_dispatch=draws_per_dispatch,
        )
        return sampler(key, theta0s)

    keys = jax.random.split(key, C)
    reduce = _make_reduce(shared_step_size)

    def local(keys_blk, thetas_blk):
        f = jax.vmap(
            lambda k, t: run_nuts(
                k, logp_fn, t, num_warmup=num_warmup,
                num_samples=num_samples, max_depth=max_depth,
                target_accept=target_accept,
                init_step_size=init_step_size,
                cross_chain_mean=reduce,
            ),
            axis_name="chain",
        )
        return f(keys_blk, thetas_blk)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_rep=False,
    )
    return jax.jit(fn)(keys, theta0s)


def _make_reduce(shared_step_size):
    if not shared_step_size:
        return None

    # mean over local vmap axis happens implicitly by vmapping the
    # *scalar* statistic through pmean: pmean over the mesh axis averages
    # across devices; the in-device chain average is taken by wrapping the
    # vmapped kernel's statistic.
    def reduce(acc):
        acc = lax.pmean(acc, "chain")  # across local chains
        return lax.pmean(acc, DATA_AXIS)  # across devices

    return reduce


def make_chunked_sampler(
    logp_fn, mesh, num_warmup=500, num_samples=500, max_depth=8,
    target_accept=0.8, init_step_size=0.1, shared_step_size=True,
    draws_per_dispatch=100,
):
    """Build ``sample(key, theta0s) -> (samples, info)`` that hosts-loops
    over jitted chunks of at most ``draws_per_dispatch`` NUTS transitions.

    The jitted chunk functions are built once and cached on the returned
    callable, so repeated calls (new keys / new starting points of the
    same shape) reuse the compiled executables — one trace per distinct
    chunk size. Exact key/adaptation threading of ``run_nuts``
    (mcmc/sample.py), so results are bit-identical to the monolithic
    dispatch."""
    blk_max = int(draws_per_dispatch)
    kernel = nuts_kernel(logp_fn, max_depth=max_depth)
    mass_start = int(0.1 * num_warmup)
    mass_end = int(0.9 * num_warmup)
    reduce = _make_reduce(shared_step_size)
    warm_step = make_warm_step(kernel, target_accept, mass_start,
                               mass_end, reduce)
    samp_step = make_samp_step(kernel)
    spec = P(DATA_AXIS)

    @jax.jit
    def init(keys, thetas):
        def one(k, t):
            logp0, grad0 = jax.value_and_grad(logp_fn)(t)
            k_samp, kw = jax.random.split(k)  # run_nuts: key, kw = split
            carry = (NutsState(t, logp0, grad0),
                     da_init(jnp.asarray(init_step_size, t.dtype)),
                     welford_init(t.shape[0], t.dtype),
                     jnp.ones(t.shape, t.dtype), kw)
            return carry, k_samp

        f = shard_map(jax.vmap(one), mesh=mesh, in_specs=(spec, spec),
                      out_specs=(spec, spec), check_rep=False)
        return f(keys, thetas)

    def make_warm_fn(blk):
        def local(carry, t0):
            f = jax.vmap(
                lambda c: lax.scan(warm_step, c, t0 + jnp.arange(blk)),
                axis_name="chain",
            )
            return f(carry)

        return jax.jit(shard_map(
            local, mesh=mesh, in_specs=(spec, P()),
            out_specs=(spec, spec), check_rep=False,
        ))

    def make_samp_fn(blk):
        def local(carry):
            f = jax.vmap(
                lambda c: lax.scan(samp_step, c, None, length=blk),
                axis_name="chain",
            )
            return f(carry)

        return jax.jit(shard_map(
            local, mesh=mesh, in_specs=(spec,), out_specs=(spec, spec),
            check_rep=False,
        ))

    fns = {}

    def sample(key, theta0s):
        C = theta0s.shape[0]
        n_dev = mesh.shape[DATA_AXIS]
        if C % n_dev:
            raise ValueError(
                f"chains {C} not divisible by devices {n_dev}")
        keys = jax.random.split(key, C)
        carry, samp_keys = init(keys, theta0s)
        warm_accs = []
        pos = 0
        while pos < num_warmup:
            blk = min(blk_max, num_warmup - pos)
            fn = fns.setdefault(("w", blk), make_warm_fn(blk))
            carry, acc = fn(carry, jnp.int32(pos))
            warm_accs.append(acc)
            pos += blk

        state, da, _, inv_mass, _ = carry
        eps = jnp.exp(da.log_eps_bar)
        carry = (state, samp_keys, eps, inv_mass)
        chunks = []
        pos = 0
        while pos < num_samples:
            blk = min(blk_max, num_samples - pos)
            fn = fns.setdefault(("s", blk), make_samp_fn(blk))
            carry, out = fn(carry)
            chunks.append(out)
            pos += blk

        draws = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=1), *chunks)
        info = {
            "step_size": eps,
            "inv_mass": inv_mass,
            "warmup_accept": (
                jnp.concatenate(warm_accs, axis=1) if warm_accs
                else jnp.zeros((C, 0), theta0s.dtype)
            ),
            "accept_prob": draws["accept_prob"],
            "diverging": draws["diverging"],
            "num_leaves": draws["num_leaves"],
            "logp": draws["logp"],
        }
        return draws["theta"], info

    return sample
