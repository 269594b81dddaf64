"""Time-stacked netCDF forcing reader with date indexing and prefetch.

Replaces the reference's xarray/dask pipeline (netcdf.py:170-341) with a
direct h5py reader: the run's dates are mapped once to dataset time indices
(exact, 'ffill' latest-available, or climatology replaying an average
year), data is cropped to the clone window, masked/flattened to (P,), and
time chunks are loaded eagerly — per-step access then is an array lookup.
valid_min/valid_max screening and the NaN-inside-mask hard error follow
netcdf.py:24-39 and 267-291.
"""
from __future__ import annotations

import datetime

import numpy as np

from .ncdf import NcFile
from .nctime import num_to_date
from ..utils.errors import LisfloodError


def run_dates(settings):
    """All model-step dates [StepStart .. StepEnd] inclusive."""
    dt = datetime.timedelta(seconds=float(settings.binding["DtSec"]))
    n = settings.step_end_int - settings.step_start_int + 1
    return [settings.step_start_dt + i * dt for i in range(n)]


class ForcingReader:
    """Reads one forcing stack; `reader[step_offset]` -> (P,) array."""

    def __init__(self, path, grid, dates, indexer=None, climatology=False,
                 skip_valid_replace=False, dtype=np.float64):
        self.grid = grid
        self.dtype = dtype
        self.nc = NcFile(path)
        nc = self.nc
        self.varname = nc.main_variable()
        xd, yd = nc.spatial_dims
        x = nc.coord(xd)
        y = nc.coord(yd)
        self.flip_y = len(y) > 1 and y[0] < y[-1]
        self.flip_x = len(x) > 1 and x[0] > x[-1]
        x_sorted = np.sort(x)
        y_sorted = np.sort(y)[::-1]
        self.cut = grid.cut_window(x_sorted, y_sorted)

        t_vals = nc.time_values()
        units = nc.time_units()
        cal = nc.time_calendar()
        file_dates = [num_to_date(v, units, cal) for v in t_vals]
        self.index_map = _map_dates_index(dates, file_dates, indexer, climatology)

        attrs = nc.attrs(self.varname)
        self.fill = nc.fill_value(self.varname)
        self.valid_min = None
        self.valid_max = None
        if not skip_valid_replace:
            scale = float(attrs.get("scale_factor", 1.0))
            offset = float(attrs.get("add_offset", 0.0))
            if "valid_min" in attrs:
                self.valid_min = float(np.asarray(attrs["valid_min"]).ravel()[0]) * scale + offset
            if "valid_max" in attrs:
                self.valid_max = float(np.asarray(attrs["valid_max"]).ravel()[0]) * scale + offset
        self._cache = {}

    def _load_index(self, idx):
        if idx not in self._cache:
            data = np.asarray(self.nc._f[self.varname][idx], dtype=np.float64)
            if self.fill is not None and not np.isnan(self.fill):
                data = np.where(data == self.fill, np.nan, data)
            if self.flip_y:
                data = np.flipud(data)
            if self.flip_x:
                data = np.fliplr(data)
            c0, c1, c2, c3 = self.cut
            data = data[c2:c3, c0:c1]
            if self.valid_min is not None:
                data = np.where(data < self.valid_min, np.nan, data)
            if self.valid_max is not None:
                data = np.where(data > self.valid_max, np.nan, data)
            vec = self.grid.compress(data).astype(self.dtype)
            if np.isnan(vec).any():
                raise LisfloodError(
                    f'Data in var "{self.varname}" contains NaN values or values '
                    f"out of valid range inside mask map for index {idx}")
            self._cache[idx] = vec
        return self._cache[idx]

    def __getitem__(self, step_offset):
        return self._load_index(self.index_map[step_offset])

    def close(self):
        self.nc.close()


def _map_dates_index(dates, file_dates, indexer, climatology):
    """Model-step date -> file time index (reference netcdf.py:153-167)."""
    if climatology:
        # replace years with a leap reference year (2020) on both sides
        def norm(d):
            try:
                return d.replace(year=2020)
            except ValueError:
                return d.replace(day=28, year=2020)
        lookup_dates = [norm(d) for d in dates]
        keys = [norm(d) for d in file_dates]
    else:
        lookup_dates = dates
        keys = file_dates
    key_index = {d: i for i, d in enumerate(keys)}
    sorted_keys = sorted(key_index)
    out = []
    for d in lookup_dates:
        if d in key_index:
            out.append(key_index[d])
        elif indexer == "ffill":
            # latest file date <= d
            import bisect
            pos = bisect.bisect_right(sorted_keys, d)
            if pos == 0:
                raise LisfloodError(f"No forcing data at or before {d}")
            out.append(key_index[sorted_keys[pos - 1]])
        else:
            raise LisfloodError(f"Date {d} not found in forcing file")
    return out
