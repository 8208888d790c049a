"""Multi-device NUTS: chains sharded over the mesh's ``data`` axis with
step-size adaptation statistics reduced via collectives (BASELINE config 5).

Each device runs a block of chains (vmap inside shard_map); during warmup
the dual-averaging acceptance statistic is ``pmean``-reduced over *all*
chains on *all* devices, so every chain adapts the same step size — the
cross-host collective rides ICI/DCN exactly like the SVI psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from gpsig_tpu.mcmc.sample import run_nuts
from gpsig_tpu.parallel.mesh import DATA_AXIS


def run_chains_sharded(
    key, logp_fn, theta0s, mesh, num_warmup=500, num_samples=500,
    max_depth=8, target_accept=0.8, init_step_size=0.1,
    shared_step_size=True,
):
    """theta0s: [C, D] with C divisible by the mesh data-axis size.

    Returns (samples [C, num_samples, D], info pytree)."""
    C = theta0s.shape[0]
    n_dev = mesh.shape[DATA_AXIS]
    if C % n_dev:
        raise ValueError(f"chains {C} not divisible by devices {n_dev}")
    keys = jax.random.split(key, C)

    def local(keys_blk, thetas_blk):
        reduce = None
        if shared_step_size:
            # mean over local vmap axis happens implicitly by vmapping the
            # *scalar* statistic through pmean: pmean over the mesh axis
            # averages across devices; the in-device chain average is taken
            # by wrapping the vmapped kernel's statistic below.
            def reduce(acc):  # noqa: F811
                acc = jax.lax.pmean(acc, "chain")  # across local chains
                return jax.lax.pmean(acc, DATA_AXIS)  # across devices

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
