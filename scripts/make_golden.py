"""Generate the committed golden regression oracle for the ETRS89
1951-forcing full-option configuration.

The mounted environment cannot run the reference's 2016 oracle gate
(tests/test_results.py:30-181 — the 2016 meteo forcings are absent), so
this freezes THIS framework's own float64 sequential-pipeline outputs as
a pinned artifact: per-step first-gauge discharge plus the end state of
the prognostic fields over 40 six-hourly steps, full option set. All
kernels / pipelines / precisions are then gated against the artifact by
tests/test_golden.py, which converts "all paths agree with each other"
into "all paths agree with a pinned file" and protects later kernel
surgery.

Run on the CPU backend (the environment the test suite uses):

    JAX_PLATFORMS=cpu python scripts/make_golden.py

Writes tests/golden/etrs89_1951_fulloption.npz.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

N_STEPS = 40
STATE_KEYS = ("ChanQKin", "ChanM3Kin", "ChanQ", "Chan2QKin", "Chan2M3Kin",
              "W1a", "W1b", "W2", "UZ", "LZ", "SnowCoverS", "FrostIndex",
              "CumInterception", "DSLR",
              "LakeStorageM3CC", "LakeOutflowCC",
              "ReservoirStorageM3CC", "ReservoirFillCC")
# the full option set used by the round-3/4 equivalence gates
OPTS_ON = ("SplitRouting", "simulateLakes", "simulateReservoirs",
           "openwaterevapo", "drainedIrrigation", "repMBTs", "TransLoss")


def run_case(tmp, pipeline="substeps", dtype=None, n_steps=N_STEPS):
    """Run the golden configuration; returns (per-step gauge discharge,
    end state dict). Shared by this generator and tests/test_golden.py."""
    import warnings
    import jax.numpy as jnp
    from lisflood_tpu.config import load_settings
    from lisflood_tpu.models.driver import LisfloodRunner, GaugeSampler

    case = "/root/reference/tests/data/LF_ETRS89_UseCase"
    v = {
        "CalendarDayStart": "01/01/1900 00:00",
        "StepStart": "02/01/1951 06:00",
        "StepEnd": "31/01/1951 00:00",
        "DtSec": "21600",
        "PathMeteo": "$(PathRoot)/meteo_1950",
        "ReportSteps": "starttime..endtime",
        "PathOut": str(tmp),
        "RoutingPipeline": pipeline,
    }
    s = load_settings(os.path.join(case, "settings", "base.xml"),
                      opts_to_set=OPTS_ON,
                      opts_to_unset=("wateruse", "riceIrrigation", "groundwaterSmooth"),
                      vars_to_set=v)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = LisfloodRunner(s, dtype=dtype)
    sampler = GaugeSampler(r.aux["loader"].load("Gauges"))
    state = r.state
    dis = []
    for i in range(n_steps):
        f = r.forcing_for(i, r.dates[i])
        state, diag = r.step_fn(state, f)
        dis.append(sampler.sample(np.asarray(diag["ChanQAvg"], np.float64)))
    state = r.step_fn.natural_state(state)
    end = {k: np.asarray(state[k], np.float64) for k in STATE_KEYS if k in state}
    r.close()
    return np.asarray(dis), end


def main():
    import tempfile

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "tests", "golden", "etrs89_1951_fulloption.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        dis, end = run_case(tmp)
    payload = {"dis": dis, "n_steps": np.int64(N_STEPS)}
    payload.update({"state_" + k: v for k, v in end.items()})
    np.savez_compressed(out_path, **payload)
    print(f"golden written: {os.path.normpath(out_path)}")
    print(f"dis shape {dis.shape}, first/last gauge-0: {dis[0, 0]:.6f} / {dis[-1, 0]:.6f}")
    for k, v in end.items():
        print(f"  state {k}: shape {v.shape} mean {np.nanmean(v):.6g}")


if __name__ == "__main__":
    main()
