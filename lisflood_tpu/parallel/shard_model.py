"""Sharding the real model step over a device mesh.

Spatial domain decomposition: the pixel axis of every state/parameter
array is sharded over the 1-D mesh axis "pixels"; routing schedules,
structure vectors and scalars are replicated. Under jit, the wavefront
scan's cross-shard gathers/scatters lower to XLA collectives over the
mesh (ICI on real slices); all column physics stays shard-local.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..models.step import build_step


def pixel_sharding(mesh, arr, num_pixels):
    """NamedSharding for an array whose trailing axis is the pixel axis."""
    if getattr(arr, "ndim", 0) == 0:
        return NamedSharding(mesh, PartitionSpec())
    if arr.shape[-1] == num_pixels:
        spec = [None] * (arr.ndim - 1) + ["pixels"]
        return NamedSharding(mesh, PartitionSpec(*spec))
    return NamedSharding(mesh, PartitionSpec())


def shard_tree(mesh, tree, num_pixels):
    return {k: jax.device_put(jnp.asarray(v), pixel_sharding(mesh, np.asarray(v), num_pixels))
            for k, v in tree.items()}


def build_sharded_model_step(mesh, nrows=16, ncols=16, dtype=jnp.float32, **synth_kwargs):
    """Full model step (synthetic catchment) jitted over the mesh with the
    pixel axis sharded. Returns (step, state, forcing)."""
    from ..models.synthetic import build_synthetic_model, synthetic_forcing

    cfg, params, state, aux = build_synthetic_model(nrows, ncols, **synth_kwargs)
    step_fn, p = build_step(cfg, params, aux, dtype=dtype)
    P = cfg.num_pixels
    state_sharded = shard_tree(mesh, state, P)
    forcing = synthetic_forcing(P)
    forcing_sharded = shard_tree(mesh, forcing, P)
    return step_fn, state_sharded, forcing_sharded, cfg
