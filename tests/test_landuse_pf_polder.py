"""Tests for TransientLandUseChange, simulatePF, and the polder module.

Reference behaviours covered:
- landusechange.py:94-148 — yearly fraction stacks re-read per step,
  next-step delta folded into the mass-balance WaterInit
  (waterbalance.py:186-271)
- soilloop.py:673-704 — suctionUnsaturatedSoilPF diagnostics
- polder.py:43-70 — initial() storage from the area lookup table
"""
import os

import numpy as np
import pytest

from lisflood_tpu.config import load_settings

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"
FORC_1951 = os.path.join(CASE, "meteo_1950")
LANDUSE = os.path.join(CASE, "maps", "landuse2006")

pytestmark = pytest.mark.skipif(not os.path.isdir(FORC_1951), reason="test data missing")

BASE_VARS = {
    "CalendarDayStart": "01/01/1900 00:00",
    "StepStart": "02/01/1951 06:00",
    "StepEnd": "08/01/1951 00:00",
    "DtSec": "21600",
    "PathMeteo": "$(PathRoot)/meteo_1950",
    "ReportSteps": "starttime..endtime",
}

OFF = ("wateruse", "riceIrrigation", "groundwaterSmooth", "SplitRouting",
       "simulateLakes", "simulateReservoirs", "openwaterevapo", "drainedIrrigation")


def make_runner(tmp, opts_on=(), opts_off=(), vars_extra=None):
    from lisflood_tpu.models.driver import LisfloodRunner
    import warnings
    v = dict(BASE_VARS)
    v["PathOut"] = str(tmp)
    v.update(vars_extra or {})
    s = load_settings(os.path.join(CASE, "settings", "base.xml"),
                      opts_to_set=opts_on,
                      opts_to_unset=OFF + tuple(opts_off),
                      vars_to_set=v)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return LisfloodRunner(s), s


def _write_stack(src_nc, dst_path, dates, deltas):
    """Write a time-stacked fraction nc: the source 2-D raster plus `delta`
    added (clipped to [0,1]) per time slice."""
    import h5py
    from lisflood_tpu.io.ncdf import (create_nc, add_dimension,
                                      add_unlimited_time, add_variable,
                                      append_time_step)
    with h5py.File(src_nc, "r") as f:
        var = [k for k in f.keys() if k not in ("x", "y")][0]
        x = np.asarray(f["x"])
        y = np.asarray(f["y"])
        data = np.asarray(f[var], dtype=np.float64)
        fill = f[var].attrs.get("_FillValue")
        if fill is not None:
            data = np.where(data == np.asarray(fill).ravel()[0], np.nan, data)
    out = create_nc(dst_path)
    add_dimension(out, "x", x)
    add_dimension(out, "y", y)
    add_unlimited_time(out, "days since 1900-01-01 00:00:00")
    add_variable(out, var, ("time", "y", "x"), "f8", fill_value=np.nan)
    for date, delta in zip(dates, deltas):
        append_time_step(out, var, date, np.clip(data + delta, 0.0, 1.0))
    out.close()
    return data


@pytest.mark.slow
def test_simulate_pf(tmp_path):
    """pF diagnostics: finite, in [-1, log10(HeadMax)], and monotone with
    drying (lower moisture => higher suction)."""
    r, s = make_runner(tmp_path, opts_on=("simulatePF",))
    f = r.forcing_for(0, r.dates[0])
    state, diag = r.step_fn(r.state, f)
    head_max = float(np.asarray(s.binding["HeadMax"], dtype=np.float64))
    for key in ("pF0", "pF1", "pF2"):
        pf = np.asarray(diag[key])
        assert pf.shape == (3, r.grid.num_pixels)
        assert np.isfinite(pf).all()
        assert (pf >= -1.0 - 1e-12).all()
        assert (pf <= np.log10(head_max) + 1e-9).all()
    # drier soil must not have lower suction: recompute with halved W
    import jax.numpy as jnp
    from lisflood_tpu.ops.physics import pf_step
    p = r.step_fn.params
    d_wet = {k: jnp.asarray(diag[k]) for k in ("W1a", "W1b", "W2")}
    d_dry = {k: p["WRes1a" if k == "W1a" else "WRes1b" if k == "W1b" else "WRes2"]
             + 0.5 * (d_wet[k] - p["WRes1a" if k == "W1a" else "WRes1b" if k == "W1b" else "WRes2"])
             for k in d_wet}
    pf_wet = pf_step(r.config, p, d_wet)
    pf_dry = pf_step(r.config, p, d_dry)
    for key in ("pF0", "pF1", "pF2"):
        assert (np.asarray(pf_dry[key]) >= np.asarray(pf_wet[key]) - 1e-9).all()


@pytest.mark.slow
def test_transient_landuse(tmp_path):
    """Fractions switch mid-run following the stack dates; mass balance
    stays closed across the land-cover change because WaterInit is
    re-priced with the next step's fractions."""
    import datetime
    d0 = datetime.datetime(1951, 1, 1)
    d1 = datetime.datetime(1951, 1, 5)
    stack_dir = tmp_path / "stacks"
    stack_dir.mkdir()
    # move 10% of 'other' into forest at the switch date
    specs = {
        "ForestFractionMaps": ("fracforest.nc", [0.0, +0.05]),
        "DirectRunoffFractionMaps": ("fracsealed.nc", [0.0, 0.0]),
        "WaterFractionMaps": ("fracwater.nc", [0.0, 0.0]),
        "IrrigationFractionMaps": ("fracirrigated.nc", [0.0, 0.0]),
        "RiceFractionMaps": ("fracrice.nc", [0.0, 0.0]),
        "OtherFractionMaps": ("fracother.nc", [0.0, -0.05]),
    }
    vars_extra = {}
    for key, (src, deltas) in specs.items():
        dst = str(stack_dir / src)
        _write_stack(os.path.join(LANDUSE, src), dst, [d0, d1], deltas)
        vars_extra[key] = dst
    r, s = make_runner(tmp_path, opts_on=("TransientLandUseChange", "repMBTs"),
                       vars_extra=vars_extra)
    state = r.state
    forests = []
    for i in range(14):
        f = r.forcing_for(i, r.dates[i])
        state, diag = r.step_fn(state, f)
        forests.append(np.asarray(f["ForestFraction_t"]).mean())
        mb = np.abs(np.unique(np.asarray(diag["MBError"])))
        # A land-cover change leaves a transient MB residual: overland-lane
        # storage is not part of the balance (the reference's OverlandM3
        # term is commented out, waterbalance.py:180), so the lanes'
        # re-equilibration shows up as error for a few steps — identical to
        # the reference. Gate on relative error vs catchment storage.
        rel = mb.max() / np.asarray(diag["WaterInit"]).max()
        assert rel < 1e-8, f"step {i}: MBError {mb.max()} (rel {rel})"
    forests = np.array(forests)
    # 'closest' (closest-LEFT floor) indexing: steps before Jan 5 00:00 use
    # slice 0, Jan 5 onwards slice 1 (reference takeClosest, add1.py:544-565)
    assert forests.max() > forests.min() + 0.04, "fractions never switched"
    assert forests[0] == forests[1] and forests[-1] == forests[-2]


@pytest.mark.slow
def test_polder_initial(tmp_path):
    """Polder storage initialised from the sites map + area table and
    carried unchanged (reference dynamic is a skeleton)."""
    import h5py
    from lisflood_tpu.io.ncdf import create_nc, add_dimension, add_variable
    # pick a channel cell from the channel mask raster
    with h5py.File(os.path.join(CASE, "maps", "chan.nc"), "r") as f:
        var = [k for k in f.keys() if k not in ("x", "y")][0]
        x = np.asarray(f["x"]); y = np.asarray(f["y"])
        chan = np.asarray(f[var], dtype=np.float64)
    # the channel raster covers more than the land mask — pick a channel
    # cell that is actually inside it
    from lisflood_tpu.config import load_settings as _ls
    from lisflood_tpu.io.grid import build_grid
    grid = build_grid(os.path.join(CASE, "maps", "mask.map"))
    in_mask = np.zeros(chan.shape, bool)
    in_mask.reshape(-1)[grid.land_flat] = True
    rows, cols = np.nonzero((chan == 1) & in_mask)
    sites = np.full(chan.shape, np.nan)
    sites[rows[10], cols[10]] = 1.0
    sites_path = str(tmp_path / "polders.nc")
    out = create_nc(sites_path)
    add_dimension(out, "x", x); add_dimension(out, "y", y)
    ds = add_variable(out, "polders", ("y", "x"), "f8", fill_value=np.nan)
    ds[...] = sites
    out.close()
    table_path = str(tmp_path / "poldarea.txt")
    with open(table_path, "w") as fh:
        fh.write("1 250000\n")
    r, s = make_runner(
        tmp_path, opts_on=("simulatePolders",),
        vars_extra={"PolderSites": sites_path, "TabPolderArea": table_path,
                    "PolderInitialLevelValue": "2.0"})
    p = r.params_np
    assert p["IsPolder"].sum() == 1
    assert np.isclose(p["PolderStorageIniM3"].sum(), 2.0 * 250000)
    state = r.state
    f = r.forcing_for(0, r.dates[0])
    state, diag = r.step_fn(state, f)
    assert np.isclose(np.asarray(state["PolderStorageM3"]).sum(), 2.0 * 250000)
    lvl = np.asarray(diag["PolderLevel"])
    assert np.isclose(lvl[np.asarray(p["IsPolder"])][0], 2.0)
