"""netCDF-4 access built directly on h5py.

netCDF-4 files are HDF5 files following the dimension-scale convention; the
environment has no netCDF4/xarray, so this module provides the subset the
framework needs (the reference uses the netCDF4 C library through
global_modules/add1.py and netcdf.py):

- `NcFile`: read access — locate the single data variable, decode fill
  values, expose x/y (or lon/lat) coordinates and the time coordinate;
- `create_nc` / `NcVariable`: CF-1.6 compliant writing with dimension scales
  so standard tools (xarray, netCDF4, cdo) read the outputs.
"""
from __future__ import annotations

import datetime

import h5py
import numpy as np

from .nctime import date_to_num, num_to_date, parse_time_units
from ..utils.errors import LisfloodError, LisfloodFileError

_COORD_NAMES = ("x", "y", "lon", "lat", "time", "string1", "wgs_1984", "crs")
_PROJ_HINTS = ("lambert_azimuthal_equal_area", "laea", "wgs_1984", "crs", "spatial_ref")


def _decode(v):
    return v.decode() if isinstance(v, bytes) else v


class NcFile:
    """Read-only view of a netCDF-4 (HDF5) file."""

    def __init__(self, path):
        if not str(path).endswith(".nc"):
            path = str(path) + ".nc"
        # bounded-retry open for flaky network filesystems
        # (reference iterOpenNetcdf, zusatz.py:407-410)
        from ..utils.retry import remote_input_access
        try:
            self._f = remote_input_access(
                lambda p: h5py.File(p, "r"), path)
        except (IOError, OSError) as e:
            raise LisfloodFileError(path, str(e))
        self.path = path

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @property
    def variables(self):
        return list(self._f.keys())

    def has(self, name):
        return name in self._f

    def attrs(self, name=None):
        obj = self._f if name is None else self._f[name]
        return {k: _decode(v) for k, v in obj.attrs.items()}

    # -- coordinates ------------------------------------------------------
    @property
    def spatial_dims(self):
        """('x', 'y') or ('lon', 'lat')."""
        if "x" in self._f:
            return ("x", "y")
        if "lon" in self._f:
            return ("lon", "lat")
        raise LisfloodError(f"{self.path}: no x/y or lon/lat coordinates")

    def coord(self, name):
        return np.asarray(self._f[name][:])

    # -- data variable ----------------------------------------------------
    def main_variable(self):
        """The single data variable: 3-D if a time dim exists, else 2-D
        (reference add1.py:403-404)."""
        num_dims = 3 if "time" in self._f else 2
        for name, ds in self._f.items():
            if isinstance(ds, h5py.Dataset) and ds.ndim == num_dims and name not in _COORD_NAMES:
                if any(h in name.lower() for h in _PROJ_HINTS):
                    continue
                return name
        # fall back: accept coordinate-named vars only if nothing else matches
        for name, ds in self._f.items():
            if isinstance(ds, h5py.Dataset) and ds.ndim == num_dims:
                return name
        raise LisfloodError(f"{self.path}: no {num_dims}-D data variable found")

    def fill_value(self, name):
        at = self._f[name].attrs
        for key in ("_FillValue", "missing_value"):
            if key in at:
                v = at[key]
                return np.asarray(v).ravel()[0]
        return None

    def read(self, name=None, index=None):
        """Read the variable (or a time slice of it), fill values -> NaN."""
        name = name or self.main_variable()
        ds = self._f[name]
        data = np.asarray(ds[index] if index is not None else ds[:], dtype=None)
        if np.issubdtype(data.dtype, np.floating):
            fv = self.fill_value(name)
            if fv is not None and not np.isnan(fv):
                data = np.where(data == fv, np.nan, data)
        return data

    # -- time -------------------------------------------------------------
    @property
    def has_time(self):
        return "time" in self._f

    def time_values(self):
        return np.asarray(self._f["time"][:])

    def time_units(self):
        return _decode(self._f["time"].attrs.get("units", b""))

    def time_calendar(self):
        return _decode(self._f["time"].attrs.get("calendar", b"proleptic_gregorian"))

    def time_dates(self):
        units, cal = self.time_units(), self.time_calendar()
        return [num_to_date(v, units, cal) for v in self.time_values()]

    def date_to_index(self, date):
        return date_to_num(date, self.time_units(), self.time_calendar())


# ---------------------------------------------------------------------------
# writing


def create_nc(path):
    return h5py.File(path, "w")


def add_dimension(f, name, values, attrs=None):
    """Create a coordinate variable and register it as a netCDF dimension
    scale (h5py's make_scale writes the attributes netCDF-4 expects)."""
    ds = f.create_dataset(name, data=np.asarray(values))
    ds.make_scale(name)
    for k, v in (attrs or {}).items():
        ds.attrs[k] = v
    return ds


def add_unlimited_time(f, units, calendar="proleptic_gregorian", attrs=None):
    ds = f.create_dataset("time", shape=(0,), maxshape=(None,), dtype="f8")
    ds.make_scale("time")
    ds.attrs["units"] = units
    ds.attrs["calendar"] = calendar
    ds.attrs["standard_name"] = "time"
    for k, v in (attrs or {}).items():
        ds.attrs[k] = v
    return ds


def add_variable(f, name, dims, dtype, fill_value=None, chunks=None, attrs=None,
                 compression=4):
    """Create a data variable attached to existing dimension scales. If the
    first dim is the unlimited time dim, the variable grows with it."""
    shape = tuple(f[d].shape[0] for d in dims)
    maxshape = tuple(None if d == "time" else f[d].shape[0] for d in dims)
    kwargs = {}
    if compression and chunks:
        kwargs.update(compression="gzip", compression_opts=compression, shuffle=True)
    ds = f.create_dataset(
        name, shape=shape, maxshape=maxshape, dtype=dtype,
        chunks=chunks, fillvalue=fill_value, **kwargs,
    )
    if fill_value is not None:
        ds.attrs["_FillValue"] = np.array([fill_value], dtype=dtype)
    for i, d in enumerate(dims):
        ds.dims[i].attach_scale(f[d])
    for k, v in (attrs or {}).items():
        ds.attrs[k] = v
    return ds


def append_time_step(f, varname, date, data2d):
    """Append one time slice to an unlimited-time variable."""
    time_ds = f["time"]
    n = time_ds.shape[0]
    time_ds.resize((n + 1,))
    time_ds[n] = date_to_num(date, _decode(time_ds.attrs["units"]),
                             _decode(time_ds.attrs.get("calendar", "proleptic_gregorian")))
    var = f[varname]
    var.resize(n + 1, axis=0)
    var[n] = data2d
