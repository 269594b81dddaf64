"""Runtime-surface wiring: pre-flight checkers, -c/-i/-n flags, TSS
operations, geographic output metadata, and settings-driven ensembles.

Reference behaviours mirrored: main.py:56-157 (lisfloodexe orchestration),
zusatz.py:49-113 (-c checkmap audit), add1.py:981-986 (-n nancheck),
output.py:566-574 (TSS operations), netcdf.py:494-530 (coordinate and
projection metadata), main.py:98-115 (MonteCarlo/EnKF from settings).
"""
import os
import warnings

import numpy as np
import pytest

from lisflood_tpu.config import load_settings
from lisflood_tpu.utils.errors import LisfloodError

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"
FORC_1951 = os.path.join(CASE, "meteo_1950")

pytestmark = pytest.mark.skipif(not os.path.isdir(FORC_1951), reason="test data missing")

BASE_VARS = {
    "CalendarDayStart": "01/01/1900 00:00",
    "StepStart": "02/01/1951 06:00",
    "StepEnd": "03/01/1951 06:00",     # 5 six-hourly steps
    "DtSec": "21600",
    "PathMeteo": "$(PathRoot)/meteo_1950",
    "ReportSteps": "starttime..endtime",
}

MINIMAL_OFF = ("wateruse", "riceIrrigation", "groundwaterSmooth", "SplitRouting",
               "simulateLakes", "simulateReservoirs", "openwaterevapo", "drainedIrrigation")


def make_settings(tmp, opts_on=(), opts_off=MINIMAL_OFF, vars_extra=None, sys_args=()):
    v = dict(BASE_VARS)
    v["PathOut"] = str(tmp)
    v.update(vars_extra or {})
    return load_settings(os.path.join(CASE, "settings", "base.xml"),
                         sys_args=sys_args, opts_to_set=opts_on,
                         opts_to_unset=opts_off, vars_to_set=v)


def test_checkers_reject_missing_input(tmp_path):
    """lisfloodexe runs the pre-flight checkers (reference main.py:67-68)."""
    from lisflood_tpu.models.driver import lisfloodexe

    s = make_settings(tmp_path)
    s.binding["Ldd"] = "/nonexistent/ldd"
    with pytest.raises(LisfloodError):
        lisfloodexe(s)


def test_checkfiles_flag_audits_without_running(tmp_path, capsys):
    """-c: per-map statistics table, no model run (zusatz.py:49-113)."""
    from lisflood_tpu.models.driver import lisfloodexe

    s = make_settings(tmp_path, sys_args=("-c", "-v"))
    assert s.flags["checkfiles"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        runner = lisfloodexe(s)
    rows = runner.aux["loader"].check_rows
    assert len(rows) > 20
    names = [r[0] for r in rows]
    assert "Ldd" in names
    # map rows carry (nonMV, missing, min, mean, max) statistics
    ldd_row = rows[names.index("Ldd")]
    assert ldd_row[2] > 0 and np.isfinite(ldd_row[4])
    # no time series got written: the time loop never ran
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tss")]


def test_initonly_flag_skips_time_loop(tmp_path):
    from lisflood_tpu.models.driver import lisfloodexe

    s = make_settings(tmp_path, sys_args=("-i", "-v"))
    assert s.flags["initonly"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        runner = lisfloodexe(s)
    assert float(np.asarray(runner.state["TimeSinceStart"])) == 0.0
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tss")]


@pytest.mark.slow
def test_tss_total_operation_upstream_average(tmp_path):
    """TSS 'total' operation: catchmenttotal(value*PixelArea)/UpArea before
    gauge sampling (reference output.py:571-573)."""
    from lisflood_tpu.models.driver import LisfloodRunner, GaugeSampler
    from lisflood_tpu.io.tss import read_tss

    s = make_settings(tmp_path, opts_on=("repStateUpsGauges",))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        runner = LisfloodRunner(s)
    runner.run()
    _, lz_ups, _ = read_tss(os.path.join(tmp_path, "lzUps.tss"))

    # independent recomputation from a fresh identical run
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r2 = LisfloodRunner(make_settings(tmp_path / "b", opts_on=("repStateUpsGauges",)))
    os.makedirs(tmp_path / "b", exist_ok=True)
    state = r2.state
    graph = r2.aux["graph_full"]
    pixarea = np.asarray(r2.params_np["PixelArea"], np.float64)
    inv_up = 1.0 / np.asarray(r2.params_np["UpArea"], np.float64)
    sampler = GaugeSampler(r2.aux["loader"].load("Gauges"))
    expected = []
    n = s.step_end_int - s.step_start_int + 1
    for i in range(n):
        f = r2.forcing_for(i, r2.dates[i])
        state, diag = r2.step_fn(state, f)
        lz = np.asarray(diag["LZ"], np.float64)
        expected.append(sampler.sample(graph.accuflux(lz * pixarea) * inv_up))
    # tss files carry ~7 significant digits (PCRaster text format)
    np.testing.assert_allclose(lz_ups, np.asarray(expected), rtol=1e-5)


def test_output_metadata_projected_vs_geographic(tmp_path):
    """Geographic grids get lon/lat dims; projected grids x/y (+ projection
    variable when the template carries one) — netcdf.py:494-530."""
    from lisflood_tpu.models.driver import TemplateMeta

    s = make_settings(tmp_path)
    meta = TemplateMeta(s)
    assert meta.dims == ("x", "y")

    latlon_xml = "/root/reference/tests/data/LF_lat_lon_UseCase/../../run_lat_lon.xml"
    latlon_xml = os.path.normpath(latlon_xml)
    if os.path.isfile(latlon_xml):
        s2 = load_settings(latlon_xml, vars_to_set={"PathOut": str(tmp_path)})
        meta2 = TemplateMeta(s2)
        assert meta2.dims == ("lon", "lat")
        assert meta2.attrs_for("lon")["units"] == "degrees_east"

    # a template that carries the CF projection variable propagates it
    class FakeSettings:
        binding = {"netCDFtemplate": os.path.join(CASE, "meteo_1950", "pr.nc")}
    meta3 = TemplateMeta(FakeSettings())
    assert meta3.proj is not None
    name, attrs = meta3.proj
    assert name == "lambert_azimuthal_equal_area"
    assert "grid_mapping_name" in attrs


@pytest.mark.slow
def test_ensemble_from_settings(tmp_path):
    """EnsMembers/FilterSteps drive the MonteCarlo/EnKF wrap
    (reference main.py:98-115)."""
    from lisflood_tpu.models.driver import lisfloodexe

    s = make_settings(tmp_path, opts_on=("MonteCarlo", "EnKF"), sys_args=("-v",))
    s.ens_members = 3
    s.filter_steps = [s.step_start_int + 2]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lisfloodexe(s)
    dumps = os.listdir(os.path.join(tmp_path, "stateVar"))
    assert len(dumps) == 3   # one npz per member at the filter step


def test_loud_and_debug_flags(tmp_path, capsys):
    """-l prints one 'step date discharge' line per step
    (Lisflood_dynamic.py:58-67 + output.py:557-563) and -d dumps the
    per-pixel channel state text files (Lisflood_initial.py:239-250,
    Lisflood_dynamic.py:252-262)."""
    from lisflood_tpu.models.driver import lisfloodexe

    s = make_settings(tmp_path, opts_on=("repDischargeTs",), sys_args=("-l", "-d"))
    assert s.flags["loud"] and s.flags["debug"]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        runner = lisfloodexe(s)
    out = capsys.readouterr().out
    start, end = s.step_start_int, s.step_end_int
    for step in range(start, end + 1):
        assert any(line.startswith("%-6i" % step) for line in out.splitlines()), \
            f"no loud line for step {step}"
    # a loud line carries the first-gauge discharge column
    line = next(l for l in out.splitlines() if l.startswith("%-6i" % start))
    assert len(line.split()) >= 3 and float(line.split()[-1]) >= 0
    # debug dumps: init + one per step, with pixel rows
    assert os.path.exists(tmp_path / f"Debug_init_{start}.txt")
    for step in range(start, end + 1):
        p = tmp_path / f"Debug_out_{step}.txt"
        assert p.exists(), f"missing {p}"
    rows = open(tmp_path / f"Debug_out_{start}.txt").read().splitlines()
    ncols = len(rows[0].split())
    assert ncols in (3, 5)   # i, TCSA, [C2A,] ChanM3 [, Chan2M3]
    assert len(rows) == runner.grid.num_pixels - 1   # reference's range(n-1) quirk


@pytest.mark.slow
def test_async_output_identical(tmp_path):
    """Async map writing (AsyncOutput default, reference output.py:449-480
    ThreadPool analogue) produces byte-identical netCDF outputs to the
    synchronous path."""
    from lisflood_tpu.models.driver import LisfloodRunner

    outs = {}
    for mode in ("True", "False"):
        out = tmp_path / mode
        out.mkdir()
        s = make_settings(out, opts_on=("repStateMaps", "repDischargeTs"),
                          vars_extra={"AsyncOutput": mode})
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = LisfloodRunner(s)
        assert r.outputs._async == (mode == "True")
        r.run()
        outs[mode] = out
    import h5py
    files = sorted(f for f in os.listdir(outs["True"]) if f.endswith(".nc"))
    assert files, "no map outputs produced"
    for fn in files:
        with h5py.File(outs["True"] / fn) as fa, h5py.File(outs["False"] / fn) as fb:
            keys = [k for k in fa.keys() if k not in ("time",)]
            for k in keys:
                np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                              err_msg=f"{fn}:{k}")
