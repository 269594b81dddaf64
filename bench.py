"""Benchmark driver — prints ONE JSON line with the headline metric.

Two measurements, both full LISFLOOD steps (water balance + sub-stepped
channel routing, full option set) in float32 on the available accelerator:

- headline: a continental-scale synthetic catchment (1200x1000 = 1.2M
  pixels, daily step with 24 routing sub-steps — the EFAS whole-Europe
  configuration, SURVEY.md section 6) measured as grid-cells*model-steps/s;
- etrs89_*: the reference's LF_ETRS89 test catchment (P=2847, 6-hourly,
  6 sub-steps) for continuity with round-1 numbers.

vs_baseline divides by the reference CPU throughput estimate (BASELINE.md:
the reference publishes no cells/s; ~4 s/step with Numba on a workstation
CPU on the test catchment => ~2.1e4 cells*steps/s; 1e5 is kept as the
conservative CPU-reference figure).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"
BASELINE_CELLS_STEPS_PER_S = 1e5


def bench_etrs89(n_steps=20):
    import warnings
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lisflood_tpu.config import load_settings
    from lisflood_tpu.models.driver import LisfloodRunner
    from lisflood_tpu.models.step import build_multi_step

    outdir = "/tmp/lf_bench_out"
    os.makedirs(outdir, exist_ok=True)
    settings = load_settings(
        os.path.join(CASE, "settings", "base.xml"),
        opts_to_set=("SplitRouting", "simulateLakes", "simulateReservoirs",
                     "openwaterevapo", "drainedIrrigation"),
        opts_to_unset=("wateruse", "riceIrrigation", "groundwaterSmooth", "repMBTs"),
        vars_to_set={"CalendarDayStart": "01/01/1900 00:00",
                     "StepStart": "02/01/1951 06:00", "StepEnd": "31/01/1951 00:00",
                     "DtSec": "21600", "PathMeteo": "$(PathRoot)/meteo_1950",
                     "PathOut": outdir})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        # float32: the TPU production precision (passes the reference oracle
        # tolerances atol=1e-4/rtol=1e-3; float64 is kept for bit-parity runs)
        runner = LisfloodRunner(settings, dtype=jnp.float32)

    # scanned multi-step program: the production data path (chunked forcing
    # staged on device, lax.scan over steps, one fetch per chunk)
    multi, _ = build_multi_step(runner.config, runner.params_np, runner.aux,
                                output_keys=("ChanQAvg",), dtype=jnp.float32)
    state = runner.state
    fs = [runner.forcing_for(i, runner.dates[i]) for i in range(n_steps)]
    stack = {key: jnp.stack([f[key] for f in fs]) for key in fs[0]}
    state_w, outs = multi(state, stack)          # warmup / compile
    np.asarray(outs["ChanQAvg"])
    t0 = time.perf_counter()
    state2, outs = multi(state, stack)
    np.asarray(outs["ChanQAvg"])                 # force full sync
    elapsed = time.perf_counter() - t0
    return runner.config.num_pixels * n_steps / elapsed, elapsed / n_steps


def bench_continental(nrows=1200, ncols=1000, n_steps=5):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lisflood_tpu.models.synthetic import build_synthetic_model, synthetic_forcing
    from lisflood_tpu.models.step import build_step

    cfg, params, state, aux = build_synthetic_model(
        nrows=nrows, ncols=ncols, no_rout_steps=24, chunk_size=1024)
    step, _ = build_step(cfg, params, aux, dtype=jnp.float32)
    f32 = lambda v: jnp.asarray(v, jnp.float32 if np.asarray(v).dtype.kind == "f" else None)
    state = {k: f32(v) for k, v in state.items()}
    forcing = {k: f32(v) for k, v in synthetic_forcing(cfg.num_pixels).items()}
    s, d = step(state, forcing)                  # warmup / compile
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        s, d = step(s, forcing)
    jax.block_until_ready(s)
    elapsed = time.perf_counter() - t0
    return cfg.num_pixels * n_steps / elapsed, elapsed / n_steps


def main():
    import jax

    platform = jax.devices()[0].platform
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    big_value, big_per_step = bench_continental()
    small_value, small_per_step = bench_etrs89()
    print(json.dumps({
        "metric": "grid-cells*steps/s per chip (full lisflood step, 1.2M-pixel continental grid, 24 routing sub-steps)",
        "value": round(big_value, 1),
        "unit": "cells*steps/s",
        "vs_baseline": round(big_value / BASELINE_CELLS_STEPS_PER_S, 3),
        "platform": platform,
        "seconds_per_step": round(big_per_step, 5),
        "etrs89_value": round(small_value, 1),
        "etrs89_vs_baseline": round(small_value / BASELINE_CELLS_STEPS_PER_S, 3),
        "etrs89_seconds_per_step": round(small_per_step, 5),
    }))


if __name__ == "__main__":
    main()
