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
    # tightened round 5 after the calibrated forcing pinned the envelope:
    # measured max_rel=0.0563 / corr=0.9875 (2026-08-22, TPU, auto
    # stencil) — a sideflow-scale regression of ~2% now trips the gate
    # (the round-4 10% gate would have passed an ~8% one)
    assert rel.max() < 0.07, f"max relative error {rel.max():.2%}"
    assert np.corrcoef(ours, ref)[0, 1] > 0.97


@pytest.mark.slow
def test_latlon_long_drift_envelope():
    """32-year endurance run vs the committed dis_long.tss (reference
    tests/test_latlon.py TestLatLonLong: 02/01/1986 -> 01/01/2018). The
    only multi-decade state-drift check available in this environment:
    with synthesized (calibrated) ta/e0 the day-scale peaks cannot match,
    so the gates are monthly-mean envelope + long-term and final-year
    bias — a slow LZ/lake/channel state drift (the class of bug nothing
    shorter exercises) shows up as a growing final-year bias.

    Pinned from the 2026-08-22 measurement (TPU, auto stencil):
    monthly p95=0.0788, corr=0.9495, bias=-0.0406, final_year=-0.0564.

    ~25 min wall on the tunnel-attached TPU (mostly forcing I/O), hours
    on CPU — run only where an accelerator is available or when
    LATLON_LONG=1 forces it.
    """
    import jax
    if jax.default_backend() == "cpu" and not os.environ.get("LATLON_LONG"):
        pytest.skip("32-year run needs an accelerator (set LATLON_LONG=1 to force)")
    if not os.path.isdir(CASE):
        pytest.skip("reference lat-lon case not available")
    import re
    r = subprocess.run([sys.executable, os.path.join(REPO, "scripts", "run_latlon.py"),
                        "long"],
                       capture_output=True, text=True, timeout=3600)
    assert "LONG PASS" in r.stdout, r.stdout[-3000:] + r.stderr[-2000:]
    m = re.search(r"long: n=(\d+) monthly max_rel=([\d.]+) p95=([\d.]+) "
                  r"mean=([\d.]+) corr=([\d.]+) bias=([+-][\d.]+) "
                  r"final_year_bias=([+-][\d.]+)", r.stdout)
    assert m, r.stdout[-2000:]
    n, max_rel, p95, mean_rel, corr, bias, final_bias = (
        int(m.group(1)),) + tuple(map(float, m.groups()[1:]))
    assert n >= 11680, f"run truncated at {n} steps"
    assert p95 < 0.12, f"monthly p95 rel {p95}"
    assert corr > 0.93, f"monthly corr {corr}"
    assert abs(bias) < 0.08, f"long-term bias {bias}"
    assert abs(final_bias) < 0.10, f"final-year bias {final_bias}"


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
