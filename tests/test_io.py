"""I/O layer tests against the reference test data."""
import os

import numpy as np
import pytest

from lisflood_tpu.config import load_settings
from lisflood_tpu.io import build_grid, MapLoader, NcFile, csf


@pytest.fixture(scope="module")
def settings(etrs89_case):
    return load_settings(os.path.join(etrs89_case, "settings", "base.xml"),
                         vars_to_set={"StepStart": "02/01/2016 06:00",
                                      "StepEnd": "02/07/2016 06:00",
                                      "DtSec": "86400"})


def test_csf_roundtrip(tmp_path, etrs89_case):
    m = csf.read_map(os.path.join(etrs89_case, "maps", "mask.map"))
    assert (m.nrows, m.ncols) == (57, 80)
    assert m.cell_size == 5000.0
    assert m.west == 4050000.0 and m.north == 2615000.0
    out = tmp_path / "out.map"
    data = np.where(m.mv_mask, np.nan, m.data.astype(np.float32))
    csf.write_map(out, data, m.west, m.north, m.cell_size)
    m2 = csf.read_map(out)
    assert np.array_equal(m2.mv_mask, m.mv_mask)
    assert np.allclose(m2.data[~m2.mv_mask], m.data[~m.mv_mask])


def test_grid_from_mask_and_ldd(settings):
    grid0 = build_grid(settings.binding["MaskMap"])
    loader = MapLoader(settings, grid0)
    ldd2d = loader.load_2d("Ldd")
    grid = build_grid(settings.binding["MaskMap"], ldd2d=ldd2d)
    assert grid.num_pixels > 0
    assert grid.num_pixels <= grid0.num_pixels
    # compress/decompress roundtrip
    vec = np.arange(grid.num_pixels, dtype=float)
    rast = grid.decompress(vec)
    assert rast.shape == (57, 80)
    vec2 = grid.compress(rast)
    assert np.array_equal(vec, vec2)


def test_loadmap_static_and_scalar(settings):
    grid0 = build_grid(settings.binding["MaskMap"])
    loader = MapLoader(settings, grid0)
    grid = build_grid(settings.binding["MaskMap"], ldd2d=loader.load_2d("Ldd"))
    loader = MapLoader(settings, grid)
    elvstd = loader.load("ElevationStD")
    assert elvstd.shape == (grid.num_pixels,)
    assert np.isfinite(elvstd).all()
    # scalar binding
    val = loader.load("AvWaterRateThreshold")
    assert val == 5.0


def test_oracle_dis_readable(etrs89_case):
    with NcFile(os.path.join(etrs89_case, "reference", "output_reference_daily", "dis.nc")) as nc:
        assert nc.main_variable() == "dis"
        d = nc.read("dis", index=0)
        assert d.shape == (57, 80)
        dates = nc.time_dates()
        assert len(dates) == 183
        assert dates[0].year == 2016


def test_forcing_reader_bounded_cache_and_prefetch(etrs89_case):
    """The decoded-step cache is LRU-bounded and prefetch fills it ahead of
    the cursor (reference bounds memory via dask time chunks,
    netcdf.py:170-232)."""
    import datetime
    import time
    from lisflood_tpu.io.forcing import ForcingReader
    s = load_settings(os.path.join(etrs89_case, "settings", "base.xml"),
                      vars_to_set={"CalendarDayStart": "01/01/1900 00:00",
                                   "StepStart": "02/01/1951 06:00",
                                   "StepEnd": "31/01/1951 00:00",
                                   "DtSec": "21600",
                                   "PathMeteo": "$(PathRoot)/meteo_1950"})
    grid = build_grid(s.binding["MaskMap"])
    from lisflood_tpu.io.forcing import run_dates
    dates = run_dates(s)
    r = ForcingReader(s.binding["PrecipitationMaps"], grid, dates,
                      cache_steps=4, prefetch=2)
    try:
        seq = [r[i] for i in range(10)]
        assert all(v.shape == (grid.num_pixels,) for v in seq)
        assert len(r._cache) <= 4
        # re-read: values identical (cache eviction must not corrupt)
        again = r[3]
        np.testing.assert_array_equal(again, seq[3])
        # prefetch eventually populates the next index without a get
        deadline = time.time() + 5.0
        want_idx = r.index_map[11]
        while time.time() < deadline and want_idx not in r._cache:
            time.sleep(0.02)
        assert want_idx in r._cache, "prefetch thread never filled step 11"
    finally:
        r.close()


def test_forcing_reader_closest_indexer(tmp_path, etrs89_case):
    """'closest' date indexing is a clamped floor lookup (closest LEFT),
    matching reference takeClosest (add1.py:544-565) whose nearest-after
    branch is commented out: a stack only takes effect once the model date
    reaches it; dates before the first stack entry clamp to it."""
    import datetime
    from lisflood_tpu.io.forcing import _map_dates_index
    f0 = datetime.datetime(1951, 1, 1)
    f1 = datetime.datetime(1951, 1, 5)
    dates = ([datetime.datetime(1950, 12, 31)]    # before stack -> clamp to first
             + [datetime.datetime(1951, 1, 2, 6) + datetime.timedelta(hours=18 * i)
                for i in range(5)])               # Jan2 06:00 .. Jan5 06:00
    idx = _map_dates_index(dates, [f0, f1], "closest", False)
    # floor semantics: past the midpoint (Jan 3) still slice 0; Jan 5+ -> 1
    assert idx == [0, 0, 0, 0, 0, 1]
