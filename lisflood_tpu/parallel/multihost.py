"""Multi-host (multi-process) execution path.

The reference is strictly single-node shared memory (SURVEY.md §2.6); the
TPU-native equivalent is `jax.distributed` + a global mesh over every
process's devices, with the pixel axis spatially sharded and the routing
sweep either left to GSPMD (packed kernel) or subcatchment-partitioned
with explicit cut-edge exchange (sharded kernel, ops/kinwave_sharded.py).

This module provides:
- `initialize(...)`: jax.distributed bring-up (works with N CPU processes
  for testing: each process pins the CPU backend and
  xla_force_host_platform_device_count local devices; collectives run
  over Gloo);
- `global_mesh()` and `make_global(...)`: host-local -> global arrays;
- `multihost_step(runner_or_stepfn, mesh)`: the jitted model step with
  pixel sharding over the global mesh;
- a CLI demo (`python -m lisflood_tpu.parallel.multihost --rank i
  --nprocs N`) running the full synthetic model for K steps and saving
  the final state — used by tests/test_multihost.py to prove an
  N-process run is BIT-IDENTICAL to the single-process run (the
  distributed analogue of the reference's subcatchment mask-independence
  gate, tests/test_subcatchments.py:32-118).

Determinism note: for a fixed logical shard/schedule structure the
computation graph is identical regardless of process/device count, and
every cross-shard reduction is a fixed-order windowed add — so process
count changes placement, not values.
"""
from __future__ import annotations

import os

import numpy as np


def initialize(coordinator="localhost:29500", num_processes=1, process_id=0,
               cpu_devices_per_process=None):
    """Bring up jax.distributed. For CPU test topologies pass
    `cpu_devices_per_process`; MUST be called before any other jax use."""
    if cpu_devices_per_process:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={cpu_devices_per_process}").strip()
    import jax
    if cpu_devices_per_process:
        jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes=num_processes,
                                   process_id=process_id)
    return jax


def global_mesh(axis_name="pixels"):
    """1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis_name,))


def make_global(mesh, arr, num_pixels, axis_name="pixels"):
    """Host array (replicated on every process) -> global device array with
    the trailing pixel axis sharded over the mesh. Each process materializes
    only its addressable shards."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    arr = np.asarray(arr)
    if arr.ndim >= 1 and arr.shape[-1] == num_pixels:
        spec = PartitionSpec(*([None] * (arr.ndim - 1) + [axis_name]))
    else:
        spec = PartitionSpec()
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


def shard_tree_global(mesh, tree, num_pixels):
    return {k: make_global(mesh, v, num_pixels) for k, v in tree.items()}


def multihost_step(step_fn, mesh, num_pixels):
    """Jit a LisfloodRunner-style step over the global mesh with pixel
    sharding constraints (same layout as parallel/shard_model.py)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    P = num_pixels

    def constrain(tree):
        out = {}
        for k, v in tree.items():
            arr = jnp.asarray(v) if not isinstance(v, (int, float)) else v
            if getattr(arr, "ndim", 0) >= 1 and arr.shape[-1] == P:
                spec = [None] * (arr.ndim - 1) + ["pixels"]
                arr = jax.lax.with_sharding_constraint(
                    arr, NamedSharding(mesh, PartitionSpec(*spec)))
            out[k] = arr
        return out

    def impl(pa, s, f):
        return step_fn.impl(constrain(pa), constrain(s), constrain(f))

    jitted = jax.jit(impl)
    pa_global = shard_tree_global(mesh, step_fn.params_arrays, P)

    def step(s, f):
        return jitted(pa_global, s, f)

    return step


def run_demo(rank, nprocs, steps=3, out=None, cpu_devices=4, coordinator=None,
             routing_kernel="sharded", num_shards=4):
    """Full synthetic model over the global mesh; rank 0 saves final state."""
    jax = initialize(coordinator or "localhost:29500",
                     num_processes=nprocs, process_id=rank,
                     cpu_devices_per_process=cpu_devices or None)
    import jax as _jax
    _jax.config.update("jax_enable_x64", True)

    from ..models.synthetic import build_synthetic_model, synthetic_forcing
    from ..models.step import build_step
    import jax.numpy as jnp
    import dataclasses

    cfg, params, state, aux = build_synthetic_model(16, 16)
    if routing_kernel == "sharded":
        cfg = dataclasses.replace(cfg, routing_kernel="sharded",
                                  num_shards=num_shards)
    step_fn, _ = build_step(cfg, params, aux, dtype=jnp.float64)
    P = cfg.num_pixels

    mesh = global_mesh()
    step = multihost_step(step_fn, mesh, P)
    s = shard_tree_global(mesh, state, P)
    f = shard_tree_global(mesh, synthetic_forcing(P), P)
    for _ in range(steps):
        s, diag = step(s, f)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, s)

    # gather the full state on every process for comparison
    from jax.experimental import multihost_utils
    gathered = {}
    for k, v in s.items():
        if nprocs > 1:
            gathered[k] = np.asarray(multihost_utils.process_allgather(v, tiled=True))
        else:
            gathered[k] = np.asarray(v)
    if out and rank == 0:
        np.savez(out, **gathered)
    return gathered


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--cpu-devices", type=int, default=4)
    ap.add_argument("--coordinator", type=str, default="localhost:29500")
    ap.add_argument("--kernel", type=str, default="sharded")
    ap.add_argument("--shards", type=int, default=4)
    a = ap.parse_args(argv)
    run_demo(a.rank, a.nprocs, a.steps, a.out, a.cpu_devices, a.coordinator,
             a.kernel, a.shards)
    print(f"multihost rank {a.rank}/{a.nprocs} done")


if __name__ == "__main__":
    main()
