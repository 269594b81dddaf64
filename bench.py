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
# Measured in-environment anchor (2026-08-21): THIS framework's float64
# production step on the CPU backend (2-core host, same 1.2M-pixel
# continental configuration) runs 28.19 s/step = 42,575 cells*steps/s.
# The reference's Numba/PCRaster CPU path cannot run here (no pcraster);
# 1e5 remains the PRIMARY denominator as a deliberately generous estimate
# for it (it is 2.3x the measured same-machine figure).
MEASURED_CPU_F64_CELLS_STEPS_PER_S = 42575.0


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


def bench_continental(nrows=1200, ncols=1000, n_steps=5, chunk_size=512):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lisflood_tpu.models.synthetic import build_synthetic_model, synthetic_forcing
    from lisflood_tpu.models.step import build_step, build_multi_step

    # chunk_size=512 measured fastest on the real chip (see PERF.md):
    # the one-hot scatter matmul cost grows linearly in C while the scan
    # iteration overhead floors below C~512. The default RoutingPipeline
    # (auto) dispatches this full-option f32 TPU run to the fused Mosaic
    # sub-step kernel WITH the lake/reservoir chains (ops/kinwave_pallas.py).
    # Measured on the PRODUCTION data path (the scanned driver lisfloodexe
    # runs by default): steps scan on device, the routing state stays
    # schedule-packed across steps, and only the discharge output
    # materializes — exactly what a real run with discharge reporting pays.
    cfg, params, state, aux = build_synthetic_model(
        nrows=nrows, ncols=ncols, no_rout_steps=24, chunk_size=chunk_size)
    multi, _ = build_multi_step(cfg, params, aux, output_keys=("ChanQAvg",),
                                dtype=jnp.float32)
    f32 = lambda v: jnp.asarray(v, jnp.float32 if np.asarray(v).dtype.kind == "f" else None)
    state = multi.prepare_state({k: f32(v) for k, v in state.items()})
    forcing = {k: f32(v) for k, v in synthetic_forcing(cfg.num_pixels).items()}
    stack = {k: jnp.stack([v] * n_steps) for k, v in forcing.items()}
    s, outs = multi(state, stack)                # warmup / compile
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    s, outs = multi(s, stack)
    jax.block_until_ready(outs)
    elapsed = time.perf_counter() - t0
    # per-phase attribution: device time of the two dominant phases,
    # measured with param arrays passed as jit args (not constants); a
    # single full-diag step provides the diagnostics namespace
    from lisflood_tpu.models.step import build_routers, packed_routing_params
    from lisflood_tpu.ops.routing_ops import channel_routing
    from lisflood_tpu.ops.physics import soil_columns_step
    step, _ = build_step(cfg, params, aux, dtype=jnp.float32)
    s, d = step(s, forcing)
    jax.block_until_ready(s)
    routers = build_routers(cfg, aux)
    _, feeders_earlier, eva_ok = packed_routing_params(cfg, params, routers["kin"].ps)
    routers["kin"].struct_feeders_earlier = feeders_earlier
    routers["kin"].eva_window_ok = eva_ok
    p = step.params
    pa = {k: v for k, v in p.items() if isinstance(v, jax.Array)}
    p_sc = {k: v for k, v in p.items() if not isinstance(v, jax.Array)}
    d0 = dict(d)

    def timed(fn):
        jitted = jax.jit(lambda pa_, s_, d_: fn({**p_sc, **pa_}, s_, d_))
        out = jitted(pa, s, d0)
        jax.block_until_ready(out)
        t = time.perf_counter()
        for _ in range(3):
            out = jitted(pa, s, d0)
        jax.block_until_ready(out)
        return (time.perf_counter() - t) / 3

    phases = {
        "channel_routing_ms": round(1e3 * timed(
            lambda p_, s_, d_: channel_routing(cfg, p_, s_, d_, routers)), 2),
        "soil_columns_ms": round(1e3 * timed(
            lambda p_, s_, d_: soil_columns_step(cfg, p_, s_, d_)), 2),
    }

    # secondary: the sequential XLA sub-step loop (RoutingPipeline=substeps)
    # on the SAME full-option configuration and production data path —
    # the fallback path and the equivalence-gate partner of the Mosaic kernel
    import dataclasses
    cfg2 = dataclasses.replace(cfg, routing_pipeline="substeps")
    multi2, _ = build_multi_step(cfg2, params, aux, output_keys=("ChanQAvg",),
                                 dtype=jnp.float32)
    s2, outs2 = multi2(state, stack)
    jax.block_until_ready(outs2)
    t0 = time.perf_counter()
    s2, outs2 = multi2(s2, stack)
    jax.block_until_ready(outs2)
    substeps_per_step = (time.perf_counter() - t0) / n_steps
    phases["xla_substeps_seconds_per_step"] = round(substeps_per_step, 5)
    phases["pallas_vs_xla_speedup"] = round(substeps_per_step * n_steps / elapsed, 3)
    return cfg.num_pixels * n_steps / elapsed, elapsed / n_steps, phases


def bench_f64(nrows=1200, ncols=1000, n_steps=3, chunk_size=512):
    """Float64 continental headline — the reference-parity precision.

    Run in a subprocess with JAX_ENABLE_X64=1 (`bench.py --f64`): Mosaic
    has no f64, so RoutingPipeline=auto resolves to the diagonal XLA
    sub-step loop; everything else (packed state, scanned production
    driver) matches the f32 headline path. This is what a
    `Precision=double` user actually gets on TPU (f64 is
    software-emulated on the VPU)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lisflood_tpu.models.synthetic import build_synthetic_model, synthetic_forcing
    from lisflood_tpu.models.step import build_multi_step

    cfg, params, state, aux = build_synthetic_model(
        nrows=nrows, ncols=ncols, no_rout_steps=24, chunk_size=chunk_size)
    multi, _ = build_multi_step(cfg, params, aux, output_keys=("ChanQAvg",),
                                dtype=jnp.float64)
    f64 = lambda v: jnp.asarray(v, jnp.float64 if np.asarray(v).dtype.kind == "f" else None)
    state = multi.prepare_state({k: f64(v) for k, v in state.items()})
    forcing = {k: f64(v) for k, v in synthetic_forcing(cfg.num_pixels).items()}
    stack = {k: jnp.stack([v] * n_steps) for k, v in forcing.items()}
    s, outs = multi(state, stack)
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    s, outs = multi(s, stack)
    jax.block_until_ready(outs)
    elapsed = time.perf_counter() - t0
    return cfg.num_pixels * n_steps / elapsed, elapsed / n_steps


def bench_scaling(devices, nrows=800, ncols=800, n_steps=3):
    """Multi-device scaling on a virtual CPU mesh (or real devices when
    available): full model step with the subcatchment-sharded routing
    kernel, pixel axis sharded over an N-device mesh. Reports cells*steps/s
    at 1 and N devices and the parallel efficiency. Run via
    `bench.py --devices N` (sets the CPU device count before jax init)."""
    import time as _time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from lisflood_tpu.parallel.shard_model import build_sharded_model_step

    results = {}
    for n in (1, devices):
        mesh = Mesh(np.array(jax.devices()[:n]), ("pixels",))
        step, state, forcing, cfg = build_sharded_model_step(
            mesh, nrows=nrows, ncols=ncols, routing_kernel="sharded",
            num_shards=devices)     # fixed logical shards -> same numerics
        out = step(state, forcing)
        jax.block_until_ready(out)
        t0 = _time.perf_counter()
        for _ in range(n_steps):
            s, d = step(state, forcing)
        jax.block_until_ready(s)
        dt = (_time.perf_counter() - t0) / n_steps
        results[n] = cfg.num_pixels / dt

    # partition communication model: the virtual CPU mesh cannot measure
    # ICI, but the cut-edge stats give the real-slice projection on paper —
    # bytes exchanged per routing sub-step is what rides ICI on hardware
    from lisflood_tpu.models.synthetic import build_synthetic_model
    from lisflood_tpu.parallel.partition import catchment_partition
    cfg2, _, _, aux2 = build_synthetic_model(nrows=nrows, ncols=ncols)
    shard_of, stats = catchment_partition(aux2["graph_kin"], devices)
    n_cut = int(stats["cut_edges"].shape[0])
    lanes = 2            # split routing: (ChanQKin, Chan2QKin) per cut edge
    bytes_per_substep = n_cut * lanes * 4
    comm = {
        "cut_edges": n_cut,
        "cut_edge_fraction": round(n_cut / max(cfg2.num_pixels, 1), 6),
        "bytes_per_substep": bytes_per_substep,
        "shard_sizes": [int(x) for x in stats["shard_sizes"]],
        # v5e ICI ~45 GB/s per link: projected exchange time per sub-step,
        # to compare against the measured per-sub-step compute on hardware
        "projected_ici_us_per_substep": round(bytes_per_substep / 45e9 * 1e6, 3),
    }
    eff = results[devices] / (results[1] * devices)
    return results, eff, comm


def _subprocess_json(args, env_extra, timeout_s=900):
    """Run `bench.py <args>` in a subprocess and parse its JSON line;
    returns None on any failure (a bench sub-measurement must never sink
    the headline)."""
    import subprocess
    env = dict(os.environ)
    env.update(env_extra)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + list(args),
            capture_output=True, text=True, timeout=timeout_s, env=env)
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--f64":
        os.environ["JAX_ENABLE_X64"] = "1"
        import jax
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        value, per_step = bench_f64()
        print(json.dumps({
            "metric": "f64 continental (reference-parity precision, diagonal XLA pipeline)",
            "value": round(value, 1), "unit": "cells*steps/s",
            "vs_baseline": round(value / BASELINE_CELLS_STEPS_PER_S, 3),
            "seconds_per_step": round(per_step, 5),
            "platform": jax.devices()[0].platform,
        }))
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--devices":
        n = int(sys.argv[2])
        # virtual CPU mesh: the single-chip environment cannot host an
        # n-device TPU mesh, so scaling efficiency is measured on n CPU
        # devices (same GSPMD partitioning; set BENCH_SCALING_TPU=1 on a
        # real multi-chip slice)
        use_tpu = os.environ.get("BENCH_SCALING_TPU") == "1"
        flags = os.environ.get("XLA_FLAGS", "")
        if not use_tpu and "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}").strip()
        import jax
        if not use_tpu:
            os.environ["JAX_PLATFORMS"] = "cpu"
            jax.config.update("jax_platforms", "cpu")
        assert len(jax.devices()) >= n, (
            f"--devices {n} needs {n} devices, got {len(jax.devices())}")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache_jax"))
        results, eff, comm = bench_scaling(n)
        print(json.dumps({
            "metric": f"multi-device scaling (sharded routing kernel, {n}-device mesh)",
            "value": round(results[n], 1),
            "unit": "cells*steps/s",
            "vs_baseline": round(eff, 3),
            "single_device_value": round(results[1], 1),
            "scaling_efficiency": round(eff, 3),
            "devices": n,
            "partition_comm": comm,
            "platform": jax.devices()[0].platform,
            "note": ("virtual CPU mesh: per-op overhead dominates at CPU "
                     "speeds, so this under-reports ICI scaling; the "
                     "correctness property (N-process bit-equality) is "
                     "gated by tests/test_multihost.py"),
        }))
        return

    import jax

    platform = jax.devices()[0].platform
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    big_value, big_per_step, phases = bench_continental()
    small_value, small_per_step = bench_etrs89()

    # f64 (reference-parity precision) headline: subprocess, x64 enabled
    f64_res = _subprocess_json(["--f64"], {"JAX_ENABLE_X64": "1"})
    # multi-device scaling datapoint (virtual CPU mesh) + comm model:
    # recorded every round so the trend is visible (VERDICT r4 item 7)
    scal_res = None if os.environ.get("BENCH_SKIP_SCALING") else _subprocess_json(
        ["--devices", "8"], {"JAX_PLATFORMS": "cpu"})
    extras = {}
    if f64_res:
        extras["f64_value"] = f64_res["value"]
        extras["f64_seconds_per_step"] = f64_res["seconds_per_step"]
        extras["f64_vs_baseline"] = f64_res["vs_baseline"]
    if scal_res:
        extras["scaling"] = {
            "devices": scal_res["devices"],
            "scaling_efficiency": scal_res["scaling_efficiency"],
            "partition_comm": scal_res["partition_comm"],
            "note": scal_res.get("note", ""),
        }
    print(json.dumps({
        "metric": "grid-cells*steps/s per chip (full lisflood step, 1.2M-pixel continental grid, 24 routing sub-steps)",
        "value": round(big_value, 1),
        "unit": "cells*steps/s",
        "vs_baseline": round(big_value / BASELINE_CELLS_STEPS_PER_S, 3),
        # the denominator is an ESTIMATE: the reference cannot run in this
        # environment (no pcraster); BASELINE_CELLS_STEPS_PER_S=1e5 is a
        # deliberately generous figure for the reference's Numba/numexpr
        # CPU path (see module docstring)
        "baseline_estimated": True,
        # measured same-machine denominator (this framework, f64, CPU
        # backend, same configuration — see MEASURED_CPU_F64_...)
        "vs_measured_cpu_f64": round(big_value / MEASURED_CPU_F64_CELLS_STEPS_PER_S, 1),
        "platform": platform,
        "seconds_per_step": round(big_per_step, 5),
        "phase_breakdown_ms": phases,
        "etrs89_value": round(small_value, 1),
        "etrs89_vs_baseline": round(small_value / BASELINE_CELLS_STEPS_PER_S, 3),
        "etrs89_seconds_per_step": round(small_per_step, 5),
        **extras,
    }))


if __name__ == "__main__":
    main()
