"""Ensemble (MonteCarlo / EnKF) tests on the real catchment."""
import os

import numpy as np
import pytest

from lisflood_tpu.config import load_settings

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(CASE, "meteo_1950")), reason="test data missing")


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    import warnings
    from lisflood_tpu.models.driver import LisfloodRunner
    out = tmp_path_factory.mktemp("ens_out")
    s = load_settings(os.path.join(CASE, "settings", "base.xml"),
                      opts_to_unset=("wateruse", "riceIrrigation", "groundwaterSmooth",
                                     "SplitRouting", "simulateLakes", "simulateReservoirs",
                                     "openwaterevapo", "drainedIrrigation"),
                      vars_to_set={"CalendarDayStart": "01/01/1900 00:00",
                                   "StepStart": "02/01/1951 06:00",
                                   "StepEnd": "10/01/1951 00:00",
                                   "DtSec": "21600",
                                   "PathMeteo": "$(PathRoot)/meteo_1950",
                                   "PathOut": str(out)})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return LisfloodRunner(s)


@pytest.mark.slow
def test_montecarlo_vmapped(runner, tmp_path):
    from lisflood_tpu.models.ensemble import EnsembleRunner

    ens = EnsembleRunner(runner, n_members=4, seed=7)
    state, diag = ens.advance(range(3))
    q = np.asarray(state.get("ChanQKin", state.get("pk$ChanQKin")))
    assert q.shape[0] == 4
    assert np.isfinite(q).all()
    # members diverge (perturbed initial storages)
    assert np.abs(q[0] - q[1]).max() > 0
    # state dump/restore round trip (stateVar analogue)
    ens.dump_states(str(tmp_path), step=3)
    before = np.asarray(ens.state["LZ"])
    ens.load_states(str(tmp_path), step=3)
    np.testing.assert_array_equal(np.asarray(ens.state["LZ"]), before)


@pytest.mark.slow
def test_montecarlo_per_member_outputs(tmp_path):
    """Each ensemble member reports its own dis.tss + end maps into the
    numbered per-sample directory (reference MonteCarloFramework layout,
    main.py:98-115, Lisflood_monteCarlo.py:24-44), and the member series
    differ (perturbed initial storages)."""
    import warnings
    from lisflood_tpu.models.driver import LisfloodRunner
    from lisflood_tpu.models.ensemble import run_montecarlo
    from lisflood_tpu.io.tss import read_tss

    out = tmp_path / "mc"
    out.mkdir()
    s = load_settings(os.path.join(CASE, "settings", "base.xml"),
                      opts_to_set=("repDischargeTs",),
                      opts_to_unset=("wateruse", "riceIrrigation", "groundwaterSmooth",
                                     "SplitRouting", "simulateLakes", "simulateReservoirs",
                                     "openwaterevapo", "drainedIrrigation"),
                      vars_to_set={"CalendarDayStart": "01/01/1900 00:00",
                                   "StepStart": "02/01/1951 06:00",
                                   "StepEnd": "04/01/1951 00:00",
                                   "DtSec": "21600",
                                   "PathMeteo": "$(PathRoot)/meteo_1950",
                                   "ReportSteps": "starttime..endtime",
                                   "PathOut": str(out)})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = LisfloodRunner(s)
    run_montecarlo(r, n_members=2, seed=5, with_outputs=True)
    series = []
    for m in (1, 2):
        tss = out / str(m) / "dis.tss"
        assert tss.exists(), f"member {m} dis.tss missing"
        ids, data, steps = read_tss(str(tss))
        assert data.shape[0] >= 1 and np.isfinite(data).all()
        series.append(data)
    assert np.abs(series[0] - series[1]).max() > 0, "member series must differ"


@pytest.mark.slow
def test_enkf_analysis_pulls_towards_observations(runner):
    from lisflood_tpu.models.ensemble import EnsembleRunner

    ens = EnsembleRunner(runner, n_members=8, seed=3, sigma=0.2)
    ens.advance(range(2))
    P = runner.config.num_pixels
    q = ens._gauge_discharge(np.arange(P))
    # observe discharge at the 3 largest-flow pixels, with a target 20% above
    # the ensemble mean; the analysis must move the ensemble mean toward it
    obs_pix = np.argsort(q.mean(0))[-3:]
    target = q.mean(0)[obs_pix] * 1.2
    before = q.mean(0)[obs_pix]
    ens.enkf_analysis(target, obs_pix, obs_sigma=0.05 * target)
    after = np.asarray(runner.step_fn.natural_state(
        dict(ens.state))["ChanQKin"]).mean(0)[obs_pix]
    assert np.all(np.abs(after - target) < np.abs(before - target) + 1e-9)
