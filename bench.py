"""Benchmark driver — prints ONE JSON line with the headline metric.

Metric: grid-cells * model-steps / second for the full LISFLOOD step
(water balance + 6 routing sub-steps, full option set) on the ETRS89 test
catchment (P=2847), measured on the available accelerator. vs_baseline is
measured against the reference's CPU throughput estimate (see BASELINE.md:
the reference publishes no cells/s; 30 steps of the same catchment take
~4 s/step with Numba on a workstation CPU => ~2.1e4 cells*steps/s; we use
1e5 as a conservative CPU-reference figure).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"
BASELINE_CELLS_STEPS_PER_S = 1e5


def bench_model(n_steps=20, warmup=2):
    import warnings
    import numpy as np
    from lisflood_tpu.config import load_settings
    from lisflood_tpu.models.driver import LisfloodRunner

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
        runner = LisfloodRunner(settings)

    import jax
    import jax.numpy as jnp
    from lisflood_tpu.models.step import build_multi_step

    # scanned multi-step program: the production data path (chunked forcing
    # staged on device, lax.scan over steps, one fetch per chunk)
    multi, _ = build_multi_step(runner.config, runner.params_np, runner.aux,
                                output_keys=("ChanQAvg",))
    state = runner.state
    fs = [runner.forcing_for(i, runner.dates[i]) for i in range(n_steps)]
    stack = {key: jnp.stack([f[key] for f in fs]) for key in fs[0]}
    # warmup / compile
    state_w, outs = multi(state, stack)
    np.asarray(outs["ChanQAvg"])
    t0 = time.perf_counter()
    state2, outs = multi(state, stack)
    np.asarray(outs["ChanQAvg"])  # force full sync
    elapsed = time.perf_counter() - t0
    cells_steps_per_s = runner.config.num_pixels * n_steps / elapsed
    return cells_steps_per_s, elapsed / n_steps


def main():
    import jax

    platform = jax.devices()[0].platform
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    value, per_step = bench_model()
    print(json.dumps({
        "metric": "grid-cells*steps/s per chip (full lisflood step, ETRS89 catchment)",
        "value": round(value, 1),
        "unit": "cells*steps/s",
        "vs_baseline": round(value / BASELINE_CELLS_STEPS_PER_S, 3),
        "platform": platform,
        "seconds_per_step": round(per_step, 5),
    }))


if __name__ == "__main__":
    main()
