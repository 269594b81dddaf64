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


@pytest.mark.slow
def test_latlon_prerun_chain_oracle():
    """Gate the prerun -> cold oracle chain (reference test_latlon.py:13-53):
    a reduced (10-year) InitLisflood prerun writes CSF avgdis.map/lzavin.map
    compared against the committed reference maps, then the cold run
    consumes OUR OWN prerun outputs and must still hit the dis_short.tss
    envelope.

    Committed tolerances (tightened round 4 after the e0 sensitivity
    sweep pinned the synthesized forcing: a 10-year prerun at the
    committed e0=3.0+/-2.0 measures lzavin corr=0.633 / mass ratio=1.043
    and avgdis wrel=0.085; e0=2.4 already drives the recharge ratio to
    1.56 and e0=1.6 to 4.31, so these gates WOULD catch a recharge-chain
    regression of that size):
    - avgdis: corr > 0.999 and discharge-weighted rel < 0.12;
    - lzavin: corr > 0.55 and mass ratio within [0.85, 1.25];
    - cold chain: first step within 0.5%, max 10%, corr > 0.95 vs the
      committed dis_short.tss (same envelope as the committed-init run).
    """
    if not os.path.isdir(CASE):
        pytest.skip("reference lat-lon case not available")
    import re
    env = dict(os.environ)
    env["LATLON_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, os.path.join(REPO, "scripts", "run_latlon.py"),
                        "chain", "3650"],
                       capture_output=True, text=True, timeout=560, env=env)
    out = r.stdout
    assert "PRERUN PASS" in out, out[-3000:] + r.stderr[-2000:]
    assert "CHAIN PASS" in out, out[-3000:] + r.stderr[-2000:]

    stats = {}
    for line in out.splitlines():
        m = re.match(r"(avgdis|lzavin): .*corr=([\d.]+) wrel=([\d.]+) ratio=([\d.]+)", line)
        if m:
            stats[m.group(1)] = (float(m.group(2)), float(m.group(3)), float(m.group(4)))
    assert set(stats) == {"avgdis", "lzavin"}, out[-2000:]
    corr, wrel, _ = stats["avgdis"]
    assert corr > 0.999, f"avgdis corr {corr}"
    assert wrel < 0.12, f"avgdis weighted rel {wrel}"
    corr, _, ratio = stats["lzavin"]
    assert corr > 0.55, f"lzavin corr {corr}"
    assert 0.85 < ratio < 1.25, f"lzavin mass ratio {ratio}"

    m = re.search(r"vs dis_short.tss: first_rel=([\d.]+) max_rel=([\d.]+) corr=([\d.]+)", out)
    assert m, out[-2000:]
    first_rel, max_rel, corr = map(float, m.groups())
    assert first_rel < 5e-3, f"chain first-step rel {first_rel}"
    assert max_rel < 0.10, f"chain max rel {max_rel}"
    assert corr > 0.95, f"chain corr {corr}"
