"""Settings parser tests, modeled on the reference's test_dates_steps.py."""
import os
import pytest

from lisflood_tpu.config import load_settings
from lisflood_tpu.config.calendar import date_to_step, step_to_date, parse_date_or_step


def test_date_step_roundtrip():
    # reference test_dates_steps.py: steps are 1-based from CalendarDayStart
    step, s = date_to_step("02/01/2016 06:00", "02/01/2016 06:00", 86400)
    assert step == 1
    step, _ = date_to_step("02/07/2016 06:00", "02/01/2016 06:00", 86400)
    assert step == 183
    # 6-hourly
    step, _ = date_to_step("03/01/2016 06:00", "02/01/2016 06:00", 21600)
    assert step == 5


def test_pre_1970_dates():
    # reference test_dates_steps.py:18-31: 6-hourly steps from 1900 to 1951
    step, _ = date_to_step("01/01/1951 06:00", "01/01/1900 00:00", 21600)
    assert step == 74510
    step, _ = date_to_step("05/01/1951 06:00", "01/01/1900 00:00", 21600)
    assert step == 74526
    import datetime
    ref = parse_date_or_step("01/01/1900 00:00")
    assert step_to_date(74510 - 1, ref, 21600) == datetime.datetime(1951, 1, 1, 6, 0)


def test_load_settings_base(etrs89_case):
    xml = os.path.join(etrs89_case, "settings", "base.xml")
    s = load_settings(xml, vars_to_set={
        "StepStart": "02/01/2016 06:00", "StepEnd": "02/07/2016 06:00",
        "DtSec": "86400"})
    assert s.step_start_int >= 1
    assert s.step_end_int - s.step_start_int == 182
    assert s.binding["MaskMap"].endswith("maps/mask.map")
    assert os.path.isfile(s.binding["MaskMap"])
    # $(...) substitution resolved everywhere
    assert not any("$(" in v for v in s.binding.values() if isinstance(v, str))
    assert s.options["SplitRouting"] in (True, False)


def test_options_override(etrs89_case):
    xml = os.path.join(etrs89_case, "settings", "base.xml")
    s = load_settings(xml, opts_to_set=("wateruse",), opts_to_unset=("SplitRouting",))
    assert s.options["wateruse"] is True
    assert s.options["SplitRouting"] is False
    assert s.options["nonInit"] == (not s.options["InitLisflood"])


def test_report_registry_gating(etrs89_case):
    xml = os.path.join(etrs89_case, "settings", "base.xml")
    s = load_settings(xml, opts_to_set=("repDischargeMaps", "repDischargeTs"))
    assert "DischargeMaps" in s.report_maps_all
    assert "DisTS" in s.report_timeseries
    s2 = load_settings(xml, opts_to_unset=("repDischargeMaps",))
    assert "DischargeMaps" not in s2.report_maps_all


def test_report_steps_dsl(etrs89_case):
    xml = os.path.join(etrs89_case, "settings", "base.xml")
    s = load_settings(xml, vars_to_set={"ReportSteps": "10+5..30"})
    assert s.report_steps == [10, 15, 20, 25, 30]
