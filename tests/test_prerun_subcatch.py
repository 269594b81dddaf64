"""Prerun (InitLisflood) and subcatchment mask-independence tests
(reference analogues: test_results.test_init_*, test_subcatchments)."""
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
    "StepEnd": "20/01/1951 00:00",
    "DtSec": "21600",
    "PathMeteo": "$(PathRoot)/meteo_1950",
    "ReportSteps": "starttime..endtime",
}


def make_runner(tmp, opts_on=(), opts_off=(), vars_extra=None, settings_name="base.xml"):
    import warnings
    from lisflood_tpu.models.driver import LisfloodRunner
    v = dict(BASE_VARS)
    v["PathOut"] = str(tmp)
    v.update(vars_extra or {})
    s = load_settings(os.path.join(CASE, "settings", settings_name),
                      opts_to_set=opts_on,
                      opts_to_unset=("wateruse", "riceIrrigation", "groundwaterSmooth") + tuple(opts_off),
                      vars_to_set=v)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return LisfloodRunner(s), s


@pytest.mark.slow
def test_prerun_initlisflood(tmp_path):
    """InitLisflood run: 1 routing substep, no structures, produces the
    avgdis / lzavin end maps consumed by cold runs (routing.py:78-81,
    groundwater.py:75-98, Lisflood_dynamic.py:224-227)."""
    r, s = make_runner(tmp_path, opts_on=("InitLisflood", "repEndMaps"),
                       opts_off=("SplitRouting", "simulateLakes", "simulateReservoirs",
                                 "openwaterevapo", "drainedIrrigation"))
    assert r.config.no_rout_steps == 1
    state = r.run(max_steps=12)
    avgdis = np.asarray(state["avgdis"])
    assert np.isfinite(avgdis).all() and (avgdis >= 0).all()
    # avgdis must equal mean of final-substep discharge over the steps run
    assert np.asarray(state["CumQ"]).max() > 0
    from lisflood_tpu.io import NcFile
    # AvgDis / LZAvInflowMap end maps written
    for name in ("AvgDis", "LZAvInflowMap"):
        path = s.binding[name]
        # prerun settings write these as end maps when InitLisflood is on
        if os.path.exists(os.path.splitext(path)[0] + ".nc"):
            with NcFile(path) as nc:
                data = nc.read()
                assert np.isfinite(data[~np.isnan(data)]).all()


@pytest.mark.slow
def test_subcatchment_mask_independence(tmp_path):
    """Running a subcatchment mask reproduces the full-domain run inside
    the subdomain (reference test_subcatchments.py:32-118)."""
    full_out = tmp_path / "full"
    sub_out = tmp_path / "sub"
    full_out.mkdir()
    sub_out.mkdir()
    opts_off = ("SplitRouting", "simulateLakes", "simulateReservoirs",
                "openwaterevapo", "drainedIrrigation")
    r_full, _ = make_runner(full_out, opts_off=opts_off)
    state_full = r_full.run(max_steps=20)

    sub_mask = os.path.join(CASE, "maps", "subcatchment_mask.map")
    r_sub, _ = make_runner(sub_out, opts_off=opts_off, vars_extra={"MaskMap": sub_mask})
    state_sub = r_sub.run(max_steps=20)

    # compare on the subdomain pixels (the subcatchment clone is a smaller
    # window; align by geometry)
    full_grid = r_full.grid
    sub_grid = r_sub.grid
    r0 = int(round((full_grid.north - sub_grid.north) / full_grid.cell))
    c0 = int(round((sub_grid.west - full_grid.west) / full_grid.cell))
    for key in ("ChanQKin", "LZ", "FrostIndex", "W1a", "UZ"):
        a2d = full_grid.decompress(np.asarray(state_full[key]))
        b2d = sub_grid.decompress(np.asarray(state_sub[key]))
        a_win = a2d[..., r0:r0 + sub_grid.nrows, c0:c0 + sub_grid.ncols]
        sel = ~np.isnan(b2d)
        np.testing.assert_allclose(b2d[sel], a_win[sel], rtol=1e-9, atol=1e-10, err_msg=key)


@pytest.mark.slow
def test_subcatchment_groundwater_smooth_breaks_equality(tmp_path):
    """groundwaterSmooth is mask-DEPENDENT: its windowtotal sees different
    neighbourhoods near the mask edge, so a subcatchment run must NOT
    reproduce the full run (the reference asserts exactly this,
    test_subcatchments.py:55-62)."""
    full_out = tmp_path / "full"
    sub_out = tmp_path / "sub"
    full_out.mkdir()
    sub_out.mkdir()
    opts_on = ("wateruse", "TransientWaterDemandChange", "useWaterDemandAveYear",
               "wateruseRegion", "groundwaterSmooth")
    opts_off = ("SplitRouting", "simulateLakes", "simulateReservoirs",
                "openwaterevapo", "drainedIrrigation")

    def runner(out, extra=None):
        import warnings
        from lisflood_tpu.models.driver import LisfloodRunner
        v = dict(BASE_VARS)
        v["PathOut"] = str(out)
        v.update(extra or {})
        s = load_settings(os.path.join(CASE, "settings", "base.xml"),
                          opts_to_set=opts_on,
                          opts_to_unset=("riceIrrigation",) + opts_off,
                          vars_to_set=v)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return LisfloodRunner(s)

    r_full = runner(full_out)
    state_full = r_full.run(max_steps=10)
    sub_mask = os.path.join(CASE, "maps", "subcatchment_mask.map")
    r_sub = runner(sub_out, {"MaskMap": sub_mask})
    state_sub = r_sub.run(max_steps=10)

    full_grid, sub_grid = r_full.grid, r_sub.grid
    r0 = int(round((full_grid.north - sub_grid.north) / full_grid.cell))
    c0 = int(round((sub_grid.west - full_grid.west) / full_grid.cell))
    a2d = full_grid.decompress(np.asarray(state_full["LZ"]))
    b2d = sub_grid.decompress(np.asarray(state_sub["LZ"]))
    a_win = a2d[r0:r0 + sub_grid.nrows, c0:c0 + sub_grid.ncols]
    sel = ~np.isnan(b2d)
    assert not np.allclose(b2d[sel], a_win[sel], rtol=1e-9, atol=1e-10), \
        "groundwaterSmooth should break subcatchment equality (it is mask-dependent)"
