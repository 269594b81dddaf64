"""Device-trace profile of the PRODUCTION scanned continental step.

Captures a jax.profiler trace of the bench.py headline path (scanned
multi-step, packed state, Mosaic routing kernel) and aggregates device-op
durations from the exported Chrome trace. This is the ground-truth
attribution tool — isolated micro-timings are wildly misleading on this
platform (PERF.md round 4).

Usage: python scripts/profile_trace.py [n_steps] [top_k]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(n_steps=5, chunk_size=512):
    from lisflood_tpu.models.synthetic import build_synthetic_model, synthetic_forcing
    from lisflood_tpu.models.step import build_multi_step

    cfg, params, state, aux = build_synthetic_model(
        nrows=1200, ncols=1000, no_rout_steps=24, chunk_size=chunk_size)
    multi, _ = build_multi_step(cfg, params, aux, output_keys=("ChanQAvg",),
                                dtype=jnp.float32)
    f32 = lambda v: jnp.asarray(v, jnp.float32 if np.asarray(v).dtype.kind == "f" else None)
    state = multi.prepare_state({k: f32(v) for k, v in state.items()})
    forcing = {k: f32(v) for k, v in synthetic_forcing(cfg.num_pixels).items()}
    stack = {k: jnp.stack([v] * n_steps) for k, v in forcing.items()}
    return multi, state, stack


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    multi, state, stack = build(n_steps)
    s, outs = multi(state, stack)      # compile + warmup
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    s, outs = multi(s, stack)
    jax.block_until_ready(outs)
    wall = (time.perf_counter() - t0) / n_steps
    print(f"wall: {wall*1e3:.1f} ms/step ({n_steps} steps)")

    trace_dir = "/tmp/jax_trace_r5"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        s, outs = multi(s, stack)
        jax.block_until_ready(outs)

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[0]) as f:
        tr = json.load(f)
    events = [e for e in tr.get("traceEvents", []) if e.get("ph") == "X"]
    # device-op events live on pids whose track names mention TPU/device.
    pid_names = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower() or "Chip" in nm}
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        nm = e.get("name", "")
        if nm.startswith(("Thread", "process")):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[nm][0] += dur
        agg[nm][1] += 1
        total += dur
    print(f"device pids: { {p: pid_names.get(p) for p in dev_pids} }")
    print(f"total device op time: {total:.1f} ms over {n_steps} steps "
          f"= {total/n_steps:.1f} ms/step")
    print(f"{'ms/step':>9} {'count':>7}  name")
    for nm, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_k]:
        print(f"{dur/n_steps:9.3f} {cnt:7d}  {nm[:110]}")


if __name__ == "__main__":
    main()
