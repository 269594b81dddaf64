"""CF time-coordinate encoding/decoding (replaces netCDF4.num2date/date2num).

Supports real-world calendars (proleptic_gregorian / gregorian / standard)
with units "<seconds|minutes|hours|days> since <datetime>". This covers all
reference test data; exotic CF calendars (360_day, noleap) raise.
"""
from __future__ import annotations

import datetime
import re

from ..utils.errors import LisfloodError

_UNIT_SECONDS = {
    "second": 1.0,
    "seconds": 1.0,
    "sec": 1.0,
    "secs": 1.0,
    "minute": 60.0,
    "minutes": 60.0,
    "min": 60.0,
    "mins": 60.0,
    "hour": 3600.0,
    "hours": 3600.0,
    "hr": 3600.0,
    "hrs": 3600.0,
    "h": 3600.0,
    "day": 86400.0,
    "days": 86400.0,
    "d": 86400.0,
}

_REAL_CALENDARS = {"proleptic_gregorian", "gregorian", "standard", "", None}

_SINCE_RE = re.compile(
    r"^\s*(?P<unit>\w+)\s+since\s+(?P<date>[\d-]+)(?:[ T](?P<time>[\d:.]+))?", re.IGNORECASE
)


def parse_time_units(units: str):
    """Parse CF units string -> (seconds_per_unit, epoch datetime)."""
    if isinstance(units, bytes):
        units = units.decode()
    m = _SINCE_RE.match(units)
    if not m:
        raise LisfloodError(f"Cannot parse time units {units!r}")
    unit = m.group("unit").lower()
    if unit not in _UNIT_SECONDS:
        raise LisfloodError(f"Unsupported time unit {unit!r} in {units!r}")
    date_part = m.group("date")
    ymd = [int(x) for x in date_part.split("-")]
    hms = [0, 0, 0]
    micro = 0
    if m.group("time"):
        bits = m.group("time").split(":")
        for i, b in enumerate(bits[:3]):
            if "." in b:
                sec, frac = b.split(".")
                hms[i] = int(sec)
                micro = int(round(float("0." + frac) * 1e6)) if frac else 0
            else:
                hms[i] = int(b)
    epoch = datetime.datetime(ymd[0], ymd[1], ymd[2], hms[0], hms[1], hms[2], micro)
    return _UNIT_SECONDS[unit], epoch


def check_calendar(calendar):
    if isinstance(calendar, bytes):
        calendar = calendar.decode()
    if calendar not in _REAL_CALENDARS:
        raise LisfloodError(f"Calendar {calendar!r} not supported")


def num_to_date(value, units, calendar="proleptic_gregorian"):
    """Numeric time value -> datetime."""
    check_calendar(calendar)
    spu, epoch = parse_time_units(units)
    return epoch + datetime.timedelta(seconds=float(value) * spu)


def date_to_num(date, units, calendar="proleptic_gregorian"):
    """datetime -> numeric time value in `units`."""
    check_calendar(calendar)
    spu, epoch = parse_time_units(units)
    return (date - epoch).total_seconds() / spu
