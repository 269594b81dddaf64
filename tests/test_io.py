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
