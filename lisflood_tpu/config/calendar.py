"""Date <-> step arithmetic.

Re-implements the calendar utilities of the reference
(lisflood/global_modules/settings.py:700-790): settings values may be either
step numbers or day-first date strings; steps are counted from
CalendarDayStart with step length DtSec, 1-based.

Calendars: the reference supports any CF calendar through cftime. cftime is
not available in this environment; proleptic_gregorian / standard / gregorian
are handled natively with datetime (identical for dates after 1582, and
python's datetime is proleptic-Gregorian so pre-1582 and pre-1970 dates also
work, covering the reference's 1950s meteo test set).
"""
from __future__ import annotations

import datetime

from pandas import to_datetime

from ..utils.errors import LisfloodError

_SUPPORTED_CALENDARS = {
    "proleptic_gregorian",
    "gregorian",
    "standard",
    "",
    None,
}


def parse_date_or_step(value, calendar_type="proleptic_gregorian"):
    """Parse a settings value: a number is a step count (float), otherwise a
    day-first date string -> datetime (reference settings.py:700-725)."""
    try:
        return float(value)
    except (ValueError, TypeError):
        pass
    if calendar_type not in _SUPPORTED_CALENDARS:
        # Non-real-world calendars (360_day, 365_day) would need a custom date
        # type; none of the reference test data uses them.
        raise LisfloodError(
            f"Calendar {calendar_type!r} not supported (only real-world calendars)"
        )
    try:
        return to_datetime(value, dayfirst=True).to_pydatetime()
    except (ValueError, TypeError):
        raise LisfloodError(
            f"Wrong step or date format in settings: {value!r}"
        )


def date_to_step(value, calendar_day_start, dt_sec, calendar_type="proleptic_gregorian"):
    """Number of DtSec steps from CalendarDayStart to `value`, 1-based
    (reference settings.py:728-763). Returns (int_step, display_string)."""
    parsed = parse_date_or_step(value, calendar_type)
    begin = parse_date_or_step(calendar_day_start, calendar_type)
    if isinstance(parsed, datetime.datetime):
        seconds = int((parsed - begin).total_seconds())
        step = int(seconds / float(dt_sec) + 1)
        return step, parsed.strftime("%d/%m/%Y %H:%M")
    return int(parsed), str(parsed)


def step_to_date(step, ref_date, dt_sec):
    """Date corresponding to `step` steps after `ref_date`
    (reference settings.py:766-790)."""
    dt_day = float(dt_sec) / 86400.0
    return ref_date + datetime.timedelta(days=step * dt_day)
