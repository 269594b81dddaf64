"""Inflow self-consistency test (reference analogue: tests/test_inflow.py).

The reference feeds a pre-generated hydrograph at the intercatchment
inflow point and regression-checks dis.tss. The 2016 forcings its oracle
needs are absent here, so this is the equivalent *self-consistency* chain
on the 1951 set: run the full domain, record the discharge crossing the
single LDD edge that enters the intercatchment mask, feed it back as the
inflow hydrograph of a masked run, and require the masked run to
reproduce the full run's discharge inside the subdomain.
"""
import os

import numpy as np
import pytest

from lisflood_tpu.config import load_settings

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"
FORC_1951 = os.path.join(CASE, "meteo_1950")

pytestmark = pytest.mark.skipif(not os.path.isdir(FORC_1951), reason="test data missing")

BASE_VARS = {
    "CalendarDayStart": "01/01/1900 00:00",
    "StepStart": "02/01/1951 06:00",
    "StepEnd": "24/01/1951 00:00",
    "DtSec": "21600",
    "PathMeteo": "$(PathRoot)/meteo_1950",
    "ReportSteps": "starttime..endtime",
}

OFF = ("wateruse", "riceIrrigation", "groundwaterSmooth", "SplitRouting",
       "simulateLakes", "simulateReservoirs", "openwaterevapo",
       "drainedIrrigation")


def make_runner(tmp, opts_on=(), vars_extra=None, settings_name="base.xml"):
    import warnings
    from lisflood_tpu.models.driver import LisfloodRunner
    v = dict(BASE_VARS)
    v["PathOut"] = str(tmp)
    v.update(vars_extra or {})
    s = load_settings(os.path.join(CASE, "settings", settings_name),
                      opts_to_set=opts_on, opts_to_unset=OFF, vars_to_set=v)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return LisfloodRunner(s), s


@pytest.mark.slow
def test_inflow_self_consistency(tmp_path):
    """full-domain run -> hydrograph at the boundary edge -> masked run
    with `inflow` reproduces the sub-domain discharge
    (reference tests/test_inflow.py + inflow.py:98-147 semantics)."""
    from lisflood_tpu.io.csf import read_map
    from lisflood_tpu.io.tss import TssWriter, read_tss

    full_out = tmp_path / "full"
    sub_out = tmp_path / "sub"
    full_out.mkdir()
    sub_out.mkdir()

    # ---- full-domain run, recording the cross-edge discharge ----
    r_full, s_full = make_runner(full_out)
    grid = r_full.grid
    ic2d = read_map(os.path.join(CASE, "maps", "intercatchment_mask.map")).data == 1
    flat = np.flatnonzero(grid.land_flat)
    rows, cols = np.divmod(flat, grid.ncols)
    in_ic = ic2d[rows, cols]
    down = np.asarray(r_full.params_np["downstruct"])
    valid = down < grid.num_pixels
    crossing = valid & (~in_ic) & in_ic[np.where(valid, down, 0)]
    assert crossing.sum() == 1, "expected exactly one edge into the mask"
    src_pix = int(np.flatnonzero(crossing)[0])

    n_steps = len(r_full.dates)
    state = r_full.state
    series = []
    for i in range(n_steps):
        f = r_full.forcing_for(i, r_full.dates[i])
        state, diag = r_full.step_fn(state, f)
        series.append(float(np.asarray(diag["ChanQ"])[src_pix]))
    state_full = r_full.step_fn.natural_state(state)

    # ---- write the inflow hydrograph (id 1 = inflow_point_1.nc) ----
    tss_path = tmp_path / "inflow.tss"
    w = TssWriter(tss_path, [1], settings_path="selfconsistency")
    start = s_full.step_start_int
    for i, q in enumerate(series):
        w.sample(start + i, [q])
    w.flush()
    ids, data, steps = read_tss(str(tss_path))
    assert ids == [1] and len(steps) == n_steps

    # ---- masked run fed by the hydrograph ----
    r_sub, _ = make_runner(
        sub_out, opts_on=("inflow",),
        vars_extra={
            "MaskMap": "$(PathRoot)/maps/intercatchment_mask.map",
            "InflowPoints": "$(PathRoot)/maps/inflow_point_1.nc",
            "QInTS": str(tss_path),
        })
    assert r_sub.config.inflow
    state_sub = r_sub.run()

    # ---- compare inside the subdomain ----
    sub_grid = r_sub.grid
    r0 = int(round((grid.north - sub_grid.north) / grid.cell))
    c0 = int(round((sub_grid.west - grid.west) / grid.cell))
    q_full2d = grid.decompress(np.asarray(state_full["ChanQ"]))
    q_sub2d = sub_grid.decompress(np.asarray(state_sub["ChanQ"]))
    win = q_full2d[r0:r0 + sub_grid.nrows, c0:c0 + sub_grid.ncols]
    sel = ~np.isnan(q_sub2d)
    a, b = q_sub2d[sel], win[sel]
    # the hydrograph is injected with the reference's linear QDelta ramp
    # across routing substeps (inflow.py:109-147), an approximation of the
    # true sub-step inflow — tolerance reflects that, not a looser model
    denom = np.maximum(np.abs(b), 1e-3)
    rel = np.abs(a - b) / denom
    assert np.median(rel) < 1e-3, f"median rel err {np.median(rel)}"
    assert rel.max() < 0.05, f"max rel err {rel.max()}"
    # non-channel state never touched by inflow must match exactly
    for key in ("LZ", "W1a", "UZ", "FrostIndex"):
        a2 = sub_grid.decompress(np.asarray(state_sub[key]))
        b2 = grid.decompress(np.asarray(state_full[key]))[..., r0:r0 + sub_grid.nrows, c0:c0 + sub_grid.ncols]
        s2 = ~np.isnan(a2)
        np.testing.assert_allclose(a2[s2], b2[s2], rtol=1e-9, atol=1e-12, err_msg=key)
