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

# --- second artifact: DAILY stepping (DtSec=86400 -> NoRoutSteps=24, the
# regime the continental bench runs) with the WATER-USE quarter ACTIVE
# (wateruse + indicator + riceIrrigation + groundwaterSmooth) — the
# reference's full-option oracle runs keep wateruse on
# (/root/reference/tests/test_results.py:40-99). 31 daily steps cover the
# whole span of the mounted 1951 forcings (1951-01-02 .. 1951-02-01,
# crossing a month end so the indicator reset path is inside the pin).
N_STEPS_DAILY = 31
OPTS_ON_WU = OPTS_ON + (
    "wateruse", "TransientWaterDemandChange", "useWaterDemandAveYear",
    "wateruseRegion", "indicator", "groundwaterSmooth", "riceIrrigation",
    "repWaterUse")
STATE_KEYS_WU = STATE_KEYS + (
    "IrriLossCUM", "wateruseCum", "cumulated_CH_withdrawal",
    "MonthDisM3", "MonthAbstractionRequiredAllSourcesM3")


def run_case(tmp, pipeline="substeps", dtype=None, n_steps=None, variant="6h"):
    """Run a golden configuration; returns (per-step gauge discharge,
    end state dict). Shared by this generator and tests/test_golden.py.

    variant='6h':       6-hourly, full structure/routing option set,
                        water-use quarter OFF (the round-3/4 artifact);
    variant='daily_wu': daily (NoRoutSteps=24), same options PLUS
                        wateruse + indicator + riceIrrigation +
                        groundwaterSmooth (round-5 artifact)."""
    import warnings
    import jax.numpy as jnp  # noqa: F401
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
    if variant == "daily_wu":
        v.update({"StepStart": "02/01/1951 00:00",
                  "StepEnd": "01/02/1951 00:00", "DtSec": "86400"})
        opts_on, opts_off = OPTS_ON_WU, ()
        state_keys = STATE_KEYS_WU
        if n_steps is None:
            n_steps = N_STEPS_DAILY
    else:
        opts_on = OPTS_ON
        opts_off = ("wateruse", "riceIrrigation", "groundwaterSmooth")
        state_keys = STATE_KEYS
        if n_steps is None:
            n_steps = N_STEPS
    s = load_settings(os.path.join(case, "settings", "base.xml"),
                      opts_to_set=opts_on, opts_to_unset=opts_off,
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
    end = {k: np.asarray(state[k], np.float64) for k in state_keys if k in state}
    r.close()
    return np.asarray(dis), end


def main():
    import tempfile

    golden_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", "tests", "golden")
    os.makedirs(golden_dir, exist_ok=True)
    only = sys.argv[1] if len(sys.argv) > 1 else None
    cases = {"etrs89_1951_fulloption.npz": ("6h", N_STEPS),
             "etrs89_1951_daily_wateruse.npz": ("daily_wu", N_STEPS_DAILY)}
    for fname, (variant, n) in cases.items():
        if only and only not in fname and only != variant:
            continue
        out_path = os.path.join(golden_dir, fname)
        with tempfile.TemporaryDirectory() as tmp:
            dis, end = run_case(tmp, variant=variant)
        payload = {"dis": dis, "n_steps": np.int64(n)}
        payload.update({"state_" + k: v for k, v in end.items()})
        np.savez_compressed(out_path, **payload)
        print(f"golden written: {os.path.normpath(out_path)}")
        print(f"dis shape {dis.shape}, first/last gauge-0: {dis[0, 0]:.6f} / {dis[-1, 0]:.6f}")
        for k, v in end.items():
            print(f"  state {k}: shape {v.shape} mean {np.nanmean(v):.6g}")


if __name__ == "__main__":
    main()
