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


def main():
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
