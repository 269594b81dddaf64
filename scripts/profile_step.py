"""Per-component TPU timing of the full model step (dev tool).

Times each physics kernel with real model state/forcing to locate the
step-time budget. Run on the real chip: `python scripts/profile_step.py`.
"""
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lisflood_tpu.config import load_settings
from lisflood_tpu.models.driver import LisfloodRunner
from lisflood_tpu.models.step import build_step

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


def profile_continental(nrows=1200, ncols=1000, no_rout_steps=24,
                        routing_kernel="packed", num_shards=1):
    """Per-phase device timing + roofline estimate on the continental-scale
    synthetic grid (the bench.py headline config)."""
    import dataclasses
    from lisflood_tpu.models.synthetic import build_synthetic_model, synthetic_forcing
    from lisflood_tpu.models.step import build_routers
    from lisflood_tpu.ops import physics as ph
    from lisflood_tpu.ops.routing_ops import channel_routing, surface_routing_step

    cfg, params, state, aux = build_synthetic_model(
        nrows=nrows, ncols=ncols, no_rout_steps=no_rout_steps, chunk_size=1024)
    if routing_kernel != "packed":
        cfg = dataclasses.replace(cfg, routing_kernel=routing_kernel,
                                  num_shards=num_shards)
    step, p = build_step(cfg, params, aux, dtype=jnp.float32)
    f32 = lambda v: jnp.asarray(v, jnp.float32 if np.asarray(v).dtype.kind == "f" else None)
    s = step.prepare_state({k: f32(v) for k, v in state.items()})
    f = {k: f32(v) for k, v in synthetic_forcing(cfg.num_pixels).items()}
    _, d0 = step(s, f)
    d0 = dict(d0)
    jax.block_until_ready(d0)
    routers = build_routers(cfg, aux)

    # param arrays must be jit ARGUMENTS, not closed-over constants —
    # embedded GB-scale constants blow up the compile payload (same reason
    # as models/step.py build_step)
    import jax as _jax
    pa = {k: v for k, v in p.items() if isinstance(v, _jax.Array)}
    p_sc = {k: v for k, v in p.items() if not isinstance(v, _jax.Array)}

    def phase_fn(fn):
        jitted = jax.jit(lambda pa_, s_, d_: fn({**p_sc, **pa_}, s_, d_))
        return lambda s_, d_: jitted(pa, s_, d_)

    phases = {}
    phases["full_step"] = timeit("full step", step, s, f, n=5)
    phases["channel_routing"] = timeit(
        "channel_routing", phase_fn(lambda p_, s_, d_: channel_routing(cfg, p_, s_, d_, routers)), s, d0, n=5)
    phases["surface_routing"] = timeit(
        "surface_routing", phase_fn(lambda p_, s_, d_: surface_routing_step(cfg, p_, s_, d_, routers)), s, d0, n=5)
    phases["soil_columns"] = timeit(
        "soil_columns", phase_fn(lambda p_, s_, d_: ph.soil_columns_step(cfg, p_, s_, d_)), s, d0, n=5)
    phases["canopy"] = timeit(
        "canopy", phase_fn(lambda p_, s_, d_: ph.canopy_step(cfg, p_, s_, d_)), s, d0, n=5)
    phases["snow_frost"] = timeit(
        "snow+frost", phase_fn(lambda p_, s_, d_: {**ph.snow_step(cfg, p_, s_, d_),
                                                   **ph.frost_step(cfg, p_, s_, d_)}), s, d0, n=5)
    phases["groundwater"] = timeit(
        "groundwater", phase_fn(lambda p_, s_, d_: ph.groundwater_step(cfg, p_, s_, d_)), s, d0, n=5)

    # roofline distance: bytes the step MUST move per model step (all f32
    # state + params once, routing carry once per substep) / HBM bandwidth
    P = cfg.num_pixels
    state_bytes = sum(np.asarray(v).nbytes for v in s.values())
    param_bytes = sum(np.asarray(v).nbytes for v in p.values()
                      if hasattr(v, "nbytes"))
    routing_carry = 4 * P * 4                  # ChanQ/ChanM3/Chan2Q/Chan2M3 f32
    min_bytes = (2 * state_bytes + param_bytes
                 + 2 * routing_carry * cfg.no_rout_steps)
    hbm = 8.0e11                               # ~0.8 TB/s (TPU v5e-class HBM)
    light = min_bytes / hbm
    print(f"\nP={P}  state={state_bytes/1e6:.0f}MB  params={param_bytes/1e6:.0f}MB")
    print(f"memory-bound speed of light ~= {light*1e3:.1f} ms/step "
          f"({min_bytes/1e9:.2f} GB @ {hbm/1e12:.1f} TB/s)")
    print(f"measured full step: {phases['full_step']*1e3:.1f} ms "
          f"-> {phases['full_step']/light:.1f}x off roofline")
    return phases, light


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "continental":
        kernel = sys.argv[2] if len(sys.argv) > 2 else "packed"
        shards = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        profile_continental(routing_kernel=kernel, num_shards=shards)
        return
    settings = load_settings(
        os.path.join(CASE, "settings", "base.xml"),
        opts_to_set=("SplitRouting", "simulateLakes", "simulateReservoirs",
                     "openwaterevapo", "drainedIrrigation"),
        opts_to_unset=("wateruse", "riceIrrigation", "groundwaterSmooth", "repMBTs"),
        vars_to_set={"CalendarDayStart": "01/01/1900 00:00",
                     "StepStart": "02/01/1951 06:00", "StepEnd": "31/01/1951 00:00",
                     "DtSec": "21600", "PathMeteo": "$(PathRoot)/meteo_1950",
                     "PathOut": "/tmp/lf_profile"})
    os.makedirs("/tmp/lf_profile", exist_ok=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = LisfloodRunner(settings, dtype=jnp.float32)
    cfg = r.config
    s = r.state
    f = r.forcing_for(0, r.dates[0])
    p = r.params

    from lisflood_tpu.ops import physics as ph
    from lisflood_tpu.ops.routing_ops import channel_routing, surface_routing_step

    # run a real step once to get a full diagnostics dict for sub-kernels
    step_fn = r.step_fn
    _, d0 = step_fn(s, f)
    d0 = dict(d0)
    jax.block_until_ready(d0)

    from lisflood_tpu.models.step import build_routers
    routers = build_routers(cfg, r.aux)

    timeit("full step", step_fn, s, f)
    timeit("snow", jax.jit(lambda s, d: ph.snow_step(cfg, p, s, d)), s, d0)
    timeit("frost", jax.jit(lambda s, d: ph.frost_step(cfg, p, s, d)), s, d0)
    timeit("canopy", jax.jit(lambda s, d: ph.canopy_step(cfg, p, s, d)), s, d0)
    timeit("soil_columns", jax.jit(lambda s, d: ph.soil_columns_step(cfg, p, s, d)), s, d0)
    timeit("opensealed", jax.jit(lambda s, d: ph.opensealed_step(cfg, p, s, d)), s, d0)
    timeit("soil_perpixel", jax.jit(lambda s, d: ph.soil_perpixel_step(cfg, p, s, d)), s, d0)
    timeit("groundwater", jax.jit(lambda s, d: ph.groundwater_step(cfg, p, s, d)), s, d0)
    timeit("evapowater", jax.jit(lambda s, d: ph.evapowater_step(cfg, p, s, d)), s, d0)
    timeit("surface_routing", jax.jit(lambda s, d: surface_routing_step(cfg, p, s, d, routers)), s, d0)
    timeit("channel_routing", jax.jit(lambda s, d: channel_routing(cfg, p, s, d, routers)), s, d0)


if __name__ == "__main__":
    main()
