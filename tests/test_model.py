"""End-to-end model tests on the ETRS89 catchment with the 1951 forcing set.

The mounted reference data lacks the 2016 meteo forcings used by the
committed oracle outputs, so the operative correctness gates here are the
reference's own self-consistency properties (see reference
tests/test_warmstart.py and the repMBTs monitors): mass-balance closure
across all modules, and warm-start state round-trips.
"""
import os
import shutil

import numpy as np
import pytest

from lisflood_tpu.config import load_settings

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"
FORC_1951 = os.path.join(CASE, "meteo_1950")

pytestmark = pytest.mark.skipif(not os.path.isdir(FORC_1951), reason="test data missing")

BASE_VARS = {
    "CalendarDayStart": "01/01/1900 00:00",
    "StepStart": "02/01/1951 06:00",
    "StepEnd": "31/01/1951 00:00",
    "DtSec": "21600",
    "PathMeteo": "$(PathRoot)/meteo_1950",
    "ReportSteps": "starttime..endtime",
}


def make_runner(tmp, opts_on=(), opts_off=(), vars_extra=None):
    from lisflood_tpu.models.driver import LisfloodRunner
    import warnings
    v = dict(BASE_VARS)
    v["PathOut"] = str(tmp)
    v.update(vars_extra or {})
    s = load_settings(os.path.join(CASE, "settings", "base.xml"),
                      opts_to_set=opts_on,
                      opts_to_unset=("wateruse", "riceIrrigation", "groundwaterSmooth") + tuple(opts_off),
                      vars_to_set=v)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return LisfloodRunner(s), s


@pytest.mark.slow
def test_mass_balance_minimal(tmp_path):
    """Internal water budget closes to ~1e-12 relative (every module)."""
    r, s = make_runner(tmp_path, opts_on=("repMBTs",),
                       opts_off=("SplitRouting", "simulateLakes", "simulateReservoirs",
                                 "openwaterevapo", "drainedIrrigation"))
    state = r.state
    for i in range(4):
        f = r.forcing_for(i, r.dates[i])
        state, diag = r.step_fn(state, f)
        mb = np.unique(np.asarray(diag["MBError"]))
        assert np.abs(mb).max() < 1.0, f"step {i}: MBError {mb}"


@pytest.mark.slow
def test_mass_balance_structures(tmp_path):
    """MB closure with lakes + reservoirs + split routing active."""
    r, s = make_runner(tmp_path,
                       opts_on=("repMBTs", "SplitRouting", "simulateLakes", "simulateReservoirs",
                                "openwaterevapo", "drainedIrrigation"),
                       opts_off=())
    state = r.state
    errs = []
    for i in range(6):
        f = r.forcing_for(i, r.dates[i])
        state, diag = r.step_fn(state, f)
        errs.append(float(np.abs(np.unique(np.asarray(diag["MBError"]))).max()))
    # cold-start transient allowed for the first steps (the reference's own
    # mbError shows the same behaviour: -1390 then -27 m3 at startup);
    # afterwards closure is machine-tight
    assert max(errs[3:]) < 1.0, errs


@pytest.mark.slow
def test_routing_kernels_equivalent_full_model(tmp_path):
    """The packed (schedule-order, scatter-free) routing path against the
    gather/scatter scan path on the real model with the full option set:
    all prognostic state equal to 1e-12 after several steps."""
    import warnings
    from lisflood_tpu.models.driver import LisfloodRunner

    opts_on = ("SplitRouting", "simulateLakes", "simulateReservoirs",
               "openwaterevapo", "drainedIrrigation", "repMBTs", "TransLoss")
    states = {}
    for kernel in ("packed", "scan", "sharded"):
        v = dict(BASE_VARS)
        v["PathOut"] = str(tmp_path / kernel)
        (tmp_path / kernel).mkdir()
        s = load_settings(os.path.join(CASE, "settings", "base.xml"),
                          opts_to_set=opts_on,
                          opts_to_unset=("wateruse", "riceIrrigation", "groundwaterSmooth"),
                          vars_to_set=v)
        s.binding["RoutingKernel"] = kernel
        # pin the sub-step pipeline so this test isolates the KERNEL
        # variable (pipeline equivalence is gated separately by
        # test_pipelined_routing_equivalent and test_pallas_routing)
        s.binding["RoutingPipeline"] = "substeps"
        if kernel == "sharded":
            s.binding["RoutingShards"] = "4"
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = LisfloodRunner(s)
        if kernel == "sharded":
            assert r.config.num_shards == 4
        state = r.state
        for i in range(3):
            f = r.forcing_for(i, r.dates[i])
            state, diag = r.step_fn(state, f)
        # the packed kernel holds routing state in schedule order (pk$ keys);
        # compare everything in the natural-space view
        states[kernel] = r.step_fn.natural_state(state)

    for key in states["scan"]:
        a = np.asarray(states["scan"][key])
        b = np.asarray(states["packed"][key])
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-12, err_msg=key)
    # sharded differs from packed only in upstream-summation grouping
    # (ulp-level per sweep; amplified slightly over 3x24 substeps)
    for key in states["packed"]:
        a = np.asarray(states["packed"][key])
        b = np.asarray(states["sharded"][key])
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-9, err_msg=key)


@pytest.mark.slow
def test_warmstart_roundtrip(tmp_path):
    """Cold 8-step run == 4-step run + warm restart for 4 steps
    (reference tests/test_warmstart.py:34-154)."""
    out_cold = tmp_path / "cold"
    out_warm = tmp_path / "warm"
    out_half = tmp_path / "half"
    for p in (out_cold, out_half, out_warm):
        p.mkdir()

    # full cold run of 8 steps, writing state maps every step
    end8 = "03/01/1951 18:00"   # 8 6-hourly steps from 02/01 06:00
    end4 = "02/01/1951 18:00"   # be careful: step 4 is 03/01 00:00? -> use date math below
    from lisflood_tpu.config.calendar import step_to_date, parse_date_or_step
    ref = parse_date_or_step(BASE_VARS["CalendarDayStart"])
    start_int, _ = __import__("lisflood_tpu.config.calendar", fromlist=["date_to_step"]).date_to_step(
        BASE_VARS["StepStart"], BASE_VARS["CalendarDayStart"], 21600)
    d4 = step_to_date(start_int + 3, ref, 21600)   # date of step 4
    d5 = step_to_date(start_int + 4, ref, 21600)
    d8 = step_to_date(start_int + 7, ref, 21600)
    fmt = lambda d: d.strftime("%d/%m/%Y %H:%M")

    r_cold, s_cold = make_runner(out_cold, opts_on=("repStateMaps",),
                                 opts_off=("SplitRouting", "simulateLakes", "simulateReservoirs",
                                           "openwaterevapo", "drainedIrrigation"),
                                 vars_extra={"StepEnd": fmt(d8)})
    r_cold.run()

    # first half
    r_half, s_half = make_runner(out_half, opts_on=("repStateMaps",),
                                 opts_off=("SplitRouting", "simulateLakes", "simulateReservoirs",
                                           "openwaterevapo", "drainedIrrigation"),
                                 vars_extra={"StepEnd": fmt(d4)})
    r_half.run()

    # warm start from the half-run state maps
    state_bindings = {
        "OFDirectInitValue": str(out_half / "ofdir"),
        "OFOtherInitValue": str(out_half / "ofoth"),
        "OFForestInitValue": str(out_half / "offor"),
        "SnowCoverAInitValue": str(out_half / "scova"),
        "SnowCoverBInitValue": str(out_half / "scovb"),
        "SnowCoverCInitValue": str(out_half / "scovc"),
        "FrostIndexInitValue": str(out_half / "frost"),
        "CumIntInitValue": str(out_half / "cum"),
        "CumIntForestInitValue": str(out_half / "cumf"),
        "CumIntIrrigationInitValue": str(out_half / "cumi"),
        "CumIntSealedInitValue": str(out_half / "cseal"),
        "UZInitValue": str(out_half / "uz"),
        "UZForestInitValue": str(out_half / "uzf"),
        "UZIrrigationInitValue": str(out_half / "uzi"),
        "DSLRInitValue": str(out_half / "dslr"),
        "DSLRForestInitValue": str(out_half / "dslf"),
        "DSLRIrrigationInitValue": str(out_half / "dsli"),
        "LZInitValue": str(out_half / "lz"),
        "ThetaInit1Value": str(out_half / "tha"),
        "ThetaInit2Value": str(out_half / "thb"),
        "ThetaInit3Value": str(out_half / "thc"),
        "ThetaForestInit1Value": str(out_half / "thfa"),
        "ThetaForestInit2Value": str(out_half / "thfb"),
        "ThetaForestInit3Value": str(out_half / "thfc"),
        "ThetaIrrigationInit1Value": str(out_half / "thia"),
        "ThetaIrrigationInit2Value": str(out_half / "thib"),
        "ThetaIrrigationInit3Value": str(out_half / "thic"),
        "TotalCrossSectionAreaInitValue": str(out_half / "chcro"),
        "PrevDischarge": str(out_half / "chanq"),
        "timestepInit": fmt(d4),
    }
    r_warm, s_warm = make_runner(out_warm, opts_on=("repStateMaps",),
                                 opts_off=("SplitRouting", "simulateLakes", "simulateReservoirs",
                                           "openwaterevapo", "drainedIrrigation"),
                                 vars_extra={"StepStart": fmt(d5), "StepEnd": fmt(d8), **state_bindings})
    warm_state = r_warm.run()

    cold_state = r_cold.state
    for key in ("W1a", "W1b", "W2", "UZ", "LZ", "SnowCoverS", "FrostIndex",
                "ChanQKin", "ChanM3Kin", "DSLR", "CumInterception"):
        a = np.asarray(cold_state[key])
        b = np.asarray(warm_state[key])
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-9, err_msg=key)


@pytest.mark.slow
def test_warmstart_full_options_exact(tmp_path):
    """Full-option warm-start exactness (reference tests/test_warmstart.py:
    34-154 gates TSS array_equal over the full option set): cold 8-step run
    with SplitRouting + lakes + reservoirs + TransLoss + openwaterevapo ==
    4-step run + warm restart, on the reported dis.tss rows (array_equal on
    the parsed values, the reference's TSSComparator gate) and on all
    prognostic state including the split-routing extra state
    (CrossSection2Area / Sideflow1Chan, routing.py:391-397)."""
    from lisflood_tpu.io.tss import read_tss
    from lisflood_tpu.config.calendar import step_to_date, parse_date_or_step, date_to_step

    out_cold = tmp_path / "cold"
    out_half = tmp_path / "half"
    out_warm = tmp_path / "warm"
    for p in (out_cold, out_half, out_warm):
        p.mkdir()

    opts_on = ("repStateMaps", "repDischargeTs", "SplitRouting", "simulateLakes",
               "simulateReservoirs", "openwaterevapo", "TransLoss", "drainedIrrigation")
    ref = parse_date_or_step(BASE_VARS["CalendarDayStart"])
    start_int, _ = date_to_step(BASE_VARS["StepStart"], BASE_VARS["CalendarDayStart"], 21600)
    fmt = lambda d: d.strftime("%d/%m/%Y %H:%M")
    d4 = step_to_date(start_int + 3, ref, 21600)
    d5 = step_to_date(start_int + 4, ref, 21600)
    d8 = step_to_date(start_int + 7, ref, 21600)

    r_cold, _ = make_runner(out_cold, opts_on=opts_on, opts_off=(),
                            vars_extra={"StepEnd": fmt(d8)})
    r_cold.run()
    r_half, _ = make_runner(out_half, opts_on=opts_on, opts_off=(),
                            vars_extra={"StepEnd": fmt(d4)})
    r_half.run()

    state_bindings = {
        "OFDirectInitValue": str(out_half / "ofdir"),
        "OFOtherInitValue": str(out_half / "ofoth"),
        "OFForestInitValue": str(out_half / "offor"),
        "SnowCoverAInitValue": str(out_half / "scova"),
        "SnowCoverBInitValue": str(out_half / "scovb"),
        "SnowCoverCInitValue": str(out_half / "scovc"),
        "FrostIndexInitValue": str(out_half / "frost"),
        "CumIntInitValue": str(out_half / "cum"),
        "CumIntForestInitValue": str(out_half / "cumf"),
        "CumIntIrrigationInitValue": str(out_half / "cumi"),
        "CumIntSealedInitValue": str(out_half / "cseal"),
        "UZInitValue": str(out_half / "uz"),
        "UZForestInitValue": str(out_half / "uzf"),
        "UZIrrigationInitValue": str(out_half / "uzi"),
        "DSLRInitValue": str(out_half / "dslr"),
        "DSLRForestInitValue": str(out_half / "dslf"),
        "DSLRIrrigationInitValue": str(out_half / "dsli"),
        "LZInitValue": str(out_half / "lz"),
        "ThetaInit1Value": str(out_half / "tha"),
        "ThetaInit2Value": str(out_half / "thb"),
        "ThetaInit3Value": str(out_half / "thc"),
        "ThetaForestInit1Value": str(out_half / "thfa"),
        "ThetaForestInit2Value": str(out_half / "thfb"),
        "ThetaForestInit3Value": str(out_half / "thfc"),
        "ThetaIrrigationInit1Value": str(out_half / "thia"),
        "ThetaIrrigationInit2Value": str(out_half / "thib"),
        "ThetaIrrigationInit3Value": str(out_half / "thic"),
        "TotalCrossSectionAreaInitValue": str(out_half / "chcro"),
        "PrevDischarge": str(out_half / "chanq"),
        # split-routing extra state (routing.py:391-397)
        "CrossSection2AreaInitValue": str(out_half / "ch2cr"),
        "PrevSideflowInitValue": str(out_half / "chside"),
        # structures state
        "LakeInitialLevelValue": str(out_half / "lakeh"),
        "LakePrevInflowValue": str(out_half / "lakeprevinq"),
        "LakePrevOutflowValue": str(out_half / "lakeprevoutq"),
        "ReservoirInitialFillValue": str(out_half / "rsfil"),
        "timestepInit": fmt(d4),
    }
    r_warm, _ = make_runner(out_warm, opts_on=opts_on, opts_off=(),
                            vars_extra={"StepStart": fmt(d5), "StepEnd": fmt(d8),
                                        **state_bindings})
    warm_state = r_warm.run()
    cold_state = r_cold.state

    # dis.tss: warm rows must equal the cold run's same-step rows exactly
    # at the reported precision (the reference's array_equal TSS gate)
    _, cold_rows, cold_steps = read_tss(os.path.join(out_cold, "dis.tss"))
    _, warm_rows, warm_steps = read_tss(os.path.join(out_warm, "dis.tss"))
    sel = np.isin(cold_steps, warm_steps)
    assert sel.sum() == len(warm_steps) == 4
    np.testing.assert_array_equal(warm_rows, cold_rows[sel])

    for key in ("W1a", "W1b", "W2", "UZ", "LZ", "SnowCoverS", "FrostIndex",
                "ChanQKin", "ChanM3Kin", "ChanQ", "DSLR", "CumInterception",
                "CumInterSealed", "Chan2QKin", "Chan2M3Kin",
                "CrossSection2Area", "Sideflow1Chan",
                "LakeStorageM3CC", "LakeInflowOldCC", "LakeOutflowCC",
                "ReservoirStorageM3CC", "ReservoirFillCC",
                "OFM3Direct", "OFM3Other", "OFM3Forest"):
        a = np.asarray(cold_state[key])
        b = np.asarray(warm_state[key])
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-9, err_msg=key)


@pytest.mark.slow
def test_pipelined_routing_equivalent(tmp_path):
    """The wavefront-pipelined sub-step loop (RoutingPipeline=diagonal,
    chunk-major with in-block sub-steps) against the sequential loop on the
    full option set: all prognostic state equal to ~1e-10 after 3 steps
    (identical per-pixel numerics; only window-summation grouping differs)."""
    import warnings
    from lisflood_tpu.models.driver import LisfloodRunner

    opts_on = ("SplitRouting", "simulateLakes", "simulateReservoirs",
               "openwaterevapo", "drainedIrrigation", "repMBTs", "TransLoss")
    states = {}
    for pipe in ("substeps", "diagonal"):
        v = dict(BASE_VARS)
        v["PathOut"] = str(tmp_path / pipe)
        (tmp_path / pipe).mkdir()
        s = load_settings(os.path.join(CASE, "settings", "base.xml"),
                          opts_to_set=opts_on,
                          opts_to_unset=("wateruse", "riceIrrigation", "groundwaterSmooth"),
                          vars_to_set=v)
        s.binding["RoutingPipeline"] = pipe
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = LisfloodRunner(s)
        if pipe == "diagonal":
            assert r.config.routing_pipeline == "diagonal"
        state = r.state
        for i in range(3):
            f = r.forcing_for(i, r.dates[i])
            state, diag = r.step_fn(state, f)
        states[pipe] = r.step_fn.natural_state(state)

    for key in states["substeps"]:
        a = np.asarray(states["substeps"][key])
        b = np.asarray(states["diagonal"][key])
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-9, err_msg=key)
