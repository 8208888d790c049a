"""Checkpoint/resume via orbax (SURVEY.md §5.4).

The reference relies on GPflow's Saver / ad-hoc numpy dumps; here the whole
TrainState (model pytree incl. kernel hypers, inducing variables, q, plus
optimiser state and step) round-trips through orbax-checkpoint. Works for
sharded states too (orbax handles jax.sharding natively).
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path, state):
    """Save a pytree state (e.g. training.loop.TrainState) to ``path``."""
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def restore_checkpoint(path, template):
    """Restore a state saved by save_checkpoint; ``template`` is a pytree
    with the right structure/shapes/dtypes (e.g. a freshly built state)."""
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, template)
