"""MapsCaching and robust-I/O tests (reference analogues:
tests/test_caching.py, zusatz.py:407-451)."""
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
    "StepEnd": "08/01/1951 00:00",
    "DtSec": "21600",
    "PathMeteo": "$(PathRoot)/meteo_1950",
    "ReportSteps": "starttime..endtime",
}

OFF = ("wateruse", "riceIrrigation", "groundwaterSmooth", "SplitRouting",
       "simulateLakes", "simulateReservoirs", "openwaterevapo", "drainedIrrigation")


def build(tmp, maps_caching):
    import warnings
    from lisflood_tpu.models.driver import LisfloodRunner
    v = dict(BASE_VARS)
    v["PathOut"] = str(tmp)
    v["MapsCaching"] = "True" if maps_caching else "False"
    s = load_settings(os.path.join(CASE, "settings", "base.xml"),
                      opts_to_unset=OFF, vars_to_set=v)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return LisfloodRunner(s)


@pytest.mark.slow
def test_maps_caching_roundtrip(tmp_path):
    """Second model build with MapsCaching=True reads every static map
    from the in-memory cache and produces bit-identical state
    (reference tests/test_caching.py:16-163)."""
    from lisflood_tpu.io.loadmap import MapsCache

    MapsCache.clear()
    r1 = build(tmp_path / "a", maps_caching=True)
    n_cached = MapsCache.size()
    assert n_cached > 20, f"expected static maps cached, got {n_cached}"
    first_hits = MapsCache.values_found()

    r2 = build(tmp_path / "b", maps_caching=True)
    assert MapsCache.size() == n_cached, "second build must add no cache entries"
    assert MapsCache.values_found() > first_hits, "second build must hit the cache"

    for k in r1.state:
        np.testing.assert_array_equal(np.asarray(r1.state[k]), np.asarray(r2.state[k]),
                                      err_msg=k)

    # extract / apply / clear (decorators.py:86-103)
    snapshot = MapsCache.extract()
    MapsCache.clear()
    assert MapsCache.size() == 0 and MapsCache.values_found() == 0
    MapsCache.apply(snapshot)
    assert MapsCache.size() == n_cached
    r3 = build(tmp_path / "c", maps_caching=True)
    assert MapsCache.values_found() > 0
    for k in r1.state:
        np.testing.assert_array_equal(np.asarray(r1.state[k]), np.asarray(r3.state[k]),
                                      err_msg=k)
    MapsCache.clear()


def test_maps_caching_off_by_default(tmp_path):
    """Without the binding, nothing is cached."""
    from lisflood_tpu.io.loadmap import MapsCache
    MapsCache.clear()
    build(tmp_path, maps_caching=False)
    assert MapsCache.size() == 0


def test_remote_input_access_retries(tmp_path, monkeypatch):
    """Transient I/O errors are retried with a pause; missing files under a
    reachable root fail fast (zusatz.py:423-451 semantics)."""
    from lisflood_tpu.utils import retry
    from lisflood_tpu.utils.errors import LisfloodFileError

    target = tmp_path / "data.bin"
    target.write_bytes(b"ok")
    calls = {"n": 0}

    import errno

    def flaky(path):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError(errno.ENETDOWN, "transient network error")
        return open(path, "rb").read()

    monkeypatch.setattr(retry, "READ_PAUSE", 0.001)
    assert retry.remote_input_access(flaky, str(target)) == b"ok"
    assert calls["n"] == 3

    # missing file with reachable root -> immediate LisfloodFileError
    with pytest.raises(LisfloodFileError):
        retry.remote_input_access(lambda p: open(p, "rb"), str(tmp_path / "nope.bin"))

    # persistent transient failure on an existing file -> bounded attempts
    # then IOError chained from the original error
    monkeypatch.setattr(retry, "MAX_READ_TRIALS", 3)
    calls["n"] = 0

    def always_fails(path):
        calls["n"] += 1
        raise OSError(errno.ESTALE, "still down")

    with pytest.raises(IOError) as excinfo:
        retry.remote_input_access(always_fails, str(target))
    assert calls["n"] == 3
    assert isinstance(excinfo.value.__cause__, OSError)

    # NON-transient error on an existing file (e.g. h5py on a truncated
    # file raises an errno-less OSError) -> the original error re-raises
    # immediately instead of 100 retries behind a network message
    calls["n"] = 0

    def corrupt(path):
        calls["n"] += 1
        raise OSError("unable to open file (truncated file)")

    with pytest.raises(OSError, match="truncated"):
        retry.remote_input_access(corrupt, str(target))
    assert calls["n"] == 1
