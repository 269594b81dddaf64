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


def pixel_sharding(mesh, arr, num_pixels, p_pad=None):
    """NamedSharding for an array whose trailing axis is the pixel axis
    (natural P or, for pk$ packed routing state, the padded position
    space p_pad)."""
    if getattr(arr, "ndim", 0) == 0:
        return NamedSharding(mesh, PartitionSpec())
    if arr.shape[-1] == num_pixels or (p_pad and arr.shape[-1] == p_pad):
        spec = [None] * (arr.ndim - 1) + ["pixels"]
        return NamedSharding(mesh, PartitionSpec(*spec))
    return NamedSharding(mesh, PartitionSpec())


def shard_tree(mesh, tree, num_pixels, p_pad=None):
    return {k: jax.device_put(jnp.asarray(v),
                              pixel_sharding(mesh, np.asarray(v), num_pixels, p_pad))
            for k, v in tree.items()}


def shard_runner_step(runner, mesh):
    """Shard a real LisfloodRunner's step over a device mesh.

    Every param/state/forcing array whose trailing axis is the pixel axis
    is sharded over the 1-D "pixels" mesh axis (uneven trailing shard
    allowed — GSPMD pads); everything else is replicated. Returns
    (step, state) where `step(state, forcing)` runs the full jitted model
    step with those shardings; the routing sweeps' cross-shard
    gathers/scatters lower to XLA collectives.

    The correctness property this must satisfy is the analogue of the
    reference's mask-independence test (tests/test_subcatchments.py:32-118):
    sharded == unsharded state, gated by tests/test_sharding.py.

    The pixel axis (P) is generally NOT divisible by the mesh size, so the
    shardings are applied with `with_sharding_constraint` inside jit (GSPMD
    pads uneven trailing shards transparently) rather than `device_put`.
    """
    P = runner.config.num_pixels
    routers = getattr(runner.step_fn, "routers", None)
    p_pad = getattr(getattr(routers.get("kin"), "ps", None), "p_pad", None) \
        if isinstance(routers, dict) else None

    def constrain(tree):
        out = {}
        for k, v in tree.items():
            arr = jnp.asarray(v) if not isinstance(v, (int, float)) else v
            if getattr(arr, "ndim", 0) >= 1 and (
                    arr.shape[-1] == P or (p_pad and arr.shape[-1] == p_pad)):
                spec = [None] * (arr.ndim - 1) + ["pixels"]
                arr = jax.lax.with_sharding_constraint(
                    arr, NamedSharding(mesh, PartitionSpec(*spec)))
            out[k] = arr
        return out

    def sharded_impl(pa, s, f):
        return runner.step_fn.impl(constrain(pa), constrain(s), constrain(f))

    jitted = jax.jit(sharded_impl)
    pa = runner.step_fn.params_arrays

    def step(s, f):
        return jitted(pa, s, f)

    return step, dict(runner.state)


def build_sharded_model_step(mesh, nrows=16, ncols=16, dtype=jnp.float32,
                             routing_kernel=None, num_shards=None, **synth_kwargs):
    """Full model step (synthetic catchment) jitted over the mesh with the
    pixel axis sharded. Returns (step, state, forcing)."""
    import dataclasses
    from ..models.synthetic import build_synthetic_model, synthetic_forcing

    cfg, params, state, aux = build_synthetic_model(nrows, ncols, **synth_kwargs)
    if routing_kernel:
        cfg = dataclasses.replace(cfg, routing_kernel=routing_kernel,
                                  num_shards=num_shards or len(mesh.devices.flat))
    step_fn, p = build_step(cfg, params, aux, dtype=dtype)
    P = cfg.num_pixels
    # packed-router state contract (pk$ keys, p_pad-sized) — sharded over
    # the pixel mesh axis like the natural vectors
    state = step_fn.prepare_state(state)
    p_pad = getattr(getattr(step_fn.routers.get("kin"), "ps", None), "p_pad", None) \
        if isinstance(step_fn.routers, dict) else None
    state_sharded = shard_tree(mesh, state, P, p_pad)
    forcing = synthetic_forcing(P)
    forcing_sharded = shard_tree(mesh, forcing, P)
    return step_fn, state_sharded, forcing_sharded, cfg
