"""GPflow-1.x-style optimizer objects over the jitted functional core.

Reference protocol (SURVEY.md §3.1): a ``NatGradOptimizer(gamma)`` op on
``[(q_mu, q_sqrt)]`` grouped with an ``AdamOptimizer(lr)`` op on the
hyperparameters, both run once per iteration::

    adam = gpsig.training.AdamOptimizer(1e-3)
    nat  = gpsig.training.NatGradOptimizer(0.1)
    for _ in range(iters):           # the reference's sess.run(group(...))
        nat.minimize(model, maxiter=1)
        adam.minimize(model, maxiter=1, freeze_variational=True)

or in one call: ``gpsig.training.fit(model, maxiter=500)`` (alternating
natgrad + Adam, the benchmarks' default). Optimizer state (Adam moments)
persists across ``minimize`` calls, keyed per model instance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gpsig_tpu.training.natgrad import natgrad_step


class AdamOptimizer:
    def __init__(self, learning_rate=1e-3):
        self.learning_rate = learning_rate
        self._opt = optax.adam(learning_rate)
        self._state = {}  # id(model wrapper) -> optax state
        self._step = {}  # id(model wrapper) -> jitted step fn

    def _get_step(self, wrapper, freeze_variational):
        key = (id(wrapper), freeze_variational)
        if key not in self._step:

            @jax.jit
            def step(model, opt_state, X, Y, rkey):
                def loss_fn(m):
                    return -m.elbo(X, Y, num_data=wrapper.num_data, key=rkey)

                loss, grads = jax.value_and_grad(loss_fn)(model)
                if freeze_variational:
                    grads = grads.replace(
                        q_mu=jnp.zeros_like(grads.q_mu),
                        q_sqrt=jnp.zeros_like(grads.q_sqrt),
                    )
                updates, opt_state = self._opt.update(grads, opt_state,
                                                      model)
                return optax.apply_updates(model, updates), opt_state, -loss

            self._step[key] = step
        return self._step[key]

    def minimize(self, wrapper, maxiter=100, freeze_variational=False,
                 callback=None):
        model = wrapper.to_functional()
        if id(wrapper) not in self._state:
            self._state[id(wrapper)] = self._opt.init(model)
        opt_state = self._state[id(wrapper)]
        step = self._get_step(wrapper, freeze_variational)
        elbo = None
        for it in range(maxiter):
            xb, yb = wrapper.next_batch()
            model, opt_state, elbo = step(
                model, opt_state, jnp.asarray(xb), jnp.asarray(yb),
                wrapper._next_key(),
            )
            if callback is not None:
                callback(it, float(elbo))
        self._state[id(wrapper)] = opt_state
        wrapper.update_functional(model)
        return None if elbo is None else float(elbo)


class NatGradOptimizer:
    """Natural-gradient steps on (q_mu, q_sqrt) in expectation parameters
    (reference: ``gpflow.training.NatGradOptimizer`` — SURVEY.md §2.3)."""

    def __init__(self, gamma=0.1):
        self.gamma = gamma
        self._step = {}

    def _get_step(self, wrapper):
        if id(wrapper) not in self._step:

            @jax.jit
            def step(model, X, Y, rkey):
                return natgrad_step(model, self.gamma, X, Y,
                                    num_data=wrapper.num_data, key=rkey)

            self._step[id(wrapper)] = step
        return self._step[id(wrapper)]

    def minimize(self, wrapper, maxiter=1, var_list=None):
        # var_list accepted for signature parity; the update always targets
        # (q_mu, q_sqrt) — the only variational pair in the model.
        del var_list
        model = wrapper.to_functional()
        step = self._get_step(wrapper)
        for _ in range(maxiter):
            xb, yb = wrapper.next_batch()
            model = step(model, jnp.asarray(xb), jnp.asarray(yb),
                         wrapper._next_key())
        wrapper.update_functional(model)


def fit(wrapper, maxiter=500, learning_rate=1e-3, gamma=0.1,
        use_natgrad=True, callback=None):
    """Alternating natgrad + Adam, one jitted step per iteration (the
    reference benchmarks' training protocol)."""
    from gpsig_tpu.training import loop

    model = wrapper.to_functional()
    optimizer = optax.adam(learning_rate)
    step_fn = loop.make_step_fn(optimizer, wrapper.num_data, gamma,
                                use_natgrad)
    state = loop.init_state(model, optimizer)
    elbo = None
    for it in range(maxiter):
        xb, yb = wrapper.next_batch()
        state, elbo = step_fn(state, jnp.asarray(xb), jnp.asarray(yb),
                              wrapper._next_key())
        if callback is not None:
            callback(it, float(elbo))
    wrapper.update_functional(state.model)
    return None if elbo is None else float(elbo)
