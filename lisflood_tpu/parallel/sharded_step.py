"""Multi-device spatial domain decomposition.

LISFLOOD's parallel dimension is space: all vertical water-balance physics
is independent per pixel (perfect data parallelism), and only the drainage
network couples pixels. The sharding layout here:

- every (P,) / (3, P) state array is sharded over the trailing pixel axis
  on a 1-D device mesh (axis "pixels");
- the column physics (snow, frost, soil) runs fully local to each shard;
- the wavefront routing scan's cross-shard upstream accumulation is left
  to XLA: gathers/scatters on sharded operands lower to collectives over
  the mesh (the subcatchment-aware halo-exchange schedule that minimises
  this traffic is the planned optimisation; see SURVEY.md §5).

`build_sharded_demo_step` builds a tiny synthetic catchment and returns a
pjit-ted full step (column physics + routing) with real shardings — used
by the driver's multi-chip dry run and the sharding tests.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..models.config import ModelConfig
from ..ops import physics as ph
from ..ops.kinwave import _route_batched


def _synthetic_catchment(P, n_chunks=8, chunk=32, seed=0):
    rng = np.random.default_rng(seed)
    order = rng.permutation(P)
    downstream = np.full(P + 1, P, dtype=np.int32)
    for i in range(P - 1):
        if rng.random() < 0.7:
            downstream[order[i]] = order[i + 1]
    chunks = np.full((n_chunks, chunk), P, dtype=np.int32)
    flat = order[: n_chunks * chunk]
    for c in range(n_chunks):
        seg = flat[c * chunk:(c + 1) * chunk]
        chunks[c, : len(seg)] = seg
    return chunks, downstream


def build_sharded_demo_step(mesh: Mesh, n_devices: int, pixels_per_device=64):
    """A sharded one-step function over a synthetic catchment."""
    P = n_devices * pixels_per_device
    rng = np.random.default_rng(1)
    cfg = ModelConfig(num_pixels=P, no_rout_steps=2, dt_sec=86400.0)

    pix = NamedSharding(mesh, PartitionSpec("pixels"))
    veg_pix = NamedSharding(mesh, PartitionSpec(None, "pixels"))
    repl = NamedSharding(mesh, PartitionSpec())

    def dev(x, sharding):
        return jax.device_put(jnp.asarray(x), sharding)

    p = {
        "lat_rad": dev(np.full(P, 0.8), pix),
        "SnowSeason": dev(np.full(P, 0.5), pix),
        "SnowMeltCoef": dev(np.full(P, 4.0), pix),
        "TempSnow": dev(np.full(P, 1.0), pix),
        "TempMelt": dev(np.full(P, 0.0), pix),
        "SnowFactor": dev(np.full(P, 1.45), pix),
        "DeltaTSnow": dev(rng.uniform(0, 3, P), pix),
        "Kfrost": dev(np.full(P, 0.57), pix),
        "Afrost": dev(np.full(P, 0.97), pix),
        "FrostIndexThreshold": dev(np.full(P, 56.0), pix),
        "SnowWaterEquivalent": dev(np.full(P, 0.1), pix),
    }
    chunks, downstream = _synthetic_catchment(P)
    alpha = rng.uniform(0.5, 5.0, P)
    adx = dev(alpha[None] * 5000.0 / (cfg.dt_sec / cfg.no_rout_steps), None)
    chunks_d = dev(chunks, repl)
    down_d = dev(downstream, repl)

    state = {
        "SnowCoverS": dev(rng.uniform(0, 50, (3, P)), veg_pix),
        "FrostIndex": dev(np.zeros(P), pix),
        "TotalPrecipitation": dev(np.zeros(P), pix),
        "ChanQKin": dev(rng.uniform(0, 10, P), pix),
    }
    forcing = {
        "Precipitation": dev(rng.uniform(0, 10, P), pix),
        "Tavg": dev(rng.uniform(-5, 10, P), pix),
        "CalendarDay": jnp.asarray(180.0),
    }

    def step(s, f):
        d = dict(f)
        d["Precipitation"] = f["Precipitation"]
        d.update(ph.snow_step(cfg, p, s, d))
        d.update(ph.frost_step(cfg, p, s, d))
        # route snowmelt as lateral inflow through the drainage network
        lateral = (d["SnowMelt"] * 1e-3)[None]
        def substep(q, _):
            q = _route_batched(q, lateral, adx, chunks_d, down_d, 0.6)
            return q, None
        q, _ = jax.lax.scan(substep, s["ChanQKin"][None], jnp.arange(cfg.no_rout_steps))
        return {
            "SnowCoverS": d["SnowCoverS"],
            "FrostIndex": d["FrostIndex"],
            "TotalPrecipitation": d["TotalPrecipitation"],
            "ChanQKin": q[0],
        }

    step_jit = jax.jit(step)
    return lambda s, f: step_jit(s, f), state, forcing
