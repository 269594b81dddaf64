"""Isolated A/B bench of the Mosaic routing sub-step kernel on the
continental shapes (the 53 ms of the 108 ms production step, per
scripts/profile_trace.py).

Builds the full-option continental synthetic model, extracts the REAL
chunk-major operands via ops/routing_ops.pallas_operands, and times just
`jit(run)(xs)` — the pallas_call plus its (zero-width at these shapes)
padding. PERF.md's in-graph-vs-isolated caveat applies to small XLA ops,
not to a single fused Mosaic program, and the measured isolated number
here (~53 ms) matches the in-graph trace attribution.

Usage: python scripts/bench_kernel.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(nrows=1200, ncols=1000, chunk_size=512):
    from lisflood_tpu.models.synthetic import build_synthetic_model, synthetic_forcing
    from lisflood_tpu.models.step import build_step, build_routers, packed_routing_params
    from lisflood_tpu.ops.routing_ops import pallas_operands

    cfg, params, state, aux = build_synthetic_model(
        nrows=nrows, ncols=ncols, no_rout_steps=24, chunk_size=chunk_size)
    step, _ = build_step(cfg, params, aux, dtype=jnp.float32)
    f32 = lambda v: jnp.asarray(v, jnp.float32 if np.asarray(v).dtype.kind == "f" else None)
    s = step.prepare_state({k: f32(v) for k, v in state.items()})
    forcing = {k: f32(v) for k, v in synthetic_forcing(cfg.num_pixels).items()}
    s, d = step(s, forcing)
    jax.block_until_ready(s)

    routers = build_routers(cfg, aux)
    _, feeders_earlier, eva_ok = packed_routing_params(cfg, params, routers["kin"].ps)
    routers["kin"].struct_feeders_earlier = feeders_earlier
    routers["kin"].eva_window_ok = eva_ok
    p = step.params
    xs, has = pallas_operands(cfg, p, s, d, routers)
    xs = {k: jax.block_until_ready(jnp.asarray(v)) for k, v in xs.items()}
    return cfg, routers["kin"].ps, float(p["Beta"]), has, xs


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lisflood_tpu.ops.kinwave_pallas import build_substep_pallas

    cfg, ps, beta, has, xs = build()
    print(f"n_chunks={ps.n_chunks} C={ps.chunk} W={ps.window} T={cfg.no_rout_steps} "
          f"has={sorted(k for k, v in has.items() if v)}")
    run = build_substep_pallas(cfg, ps, beta, has,
                               interpret=jax.devices()[0].platform != "tpu")
    jrun = jax.jit(run)
    t0 = time.perf_counter()
    ys = jrun(xs)
    jax.block_until_ready(ys)
    print(f"compile+1st: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    for _ in range(reps):
        ys = jrun(xs)
    jax.block_until_ready(ys)
    dt = (time.perf_counter() - t0) / reps
    print(f"kernel: {dt*1e3:.2f} ms/call  ({reps} reps)")
    # reference values for quick sanity during tuning
    q1 = np.asarray(ys["q1"])
    print(f"q1: sum={q1.sum():.6e} max={q1.max():.6e}")


if __name__ == "__main__":
    main()
