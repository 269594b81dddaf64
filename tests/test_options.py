"""Option gating matrix (reference analogues: tests/test_options.py:37-194,
test_reported_maps.py / test_reported_tss.py).

Two properties, data-driven from the declarative registries:
- each physics option loads its declared inputs, and ONLY option-owned
  inputs appear when it is switched on (the reference asserts this with
  mocker.patch of each module's loadmap);
- each report option triggers exactly the declared output files, predicted
  independently from registry.json with the reference's activation rule
  (settings.py:666-680).
"""
import json
import os
import warnings

import numpy as np
import pytest

from lisflood_tpu.config import load_settings

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"
FORC_1951 = os.path.join(CASE, "meteo_1950")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not os.path.isdir(FORC_1951), reason="test data missing")

BASE_VARS = {
    "CalendarDayStart": "01/01/1900 00:00",
    "StepStart": "02/01/1951 06:00",
    "StepEnd": "02/01/1951 18:00",     # 3 six-hourly steps
    "DtSec": "21600",
    "PathMeteo": "$(PathRoot)/meteo_1950",
    "ReportSteps": "starttime..endtime",
}

ALL_PHYSICS = ("wateruse", "riceIrrigation", "groundwaterSmooth", "SplitRouting",
               "simulateLakes", "simulateReservoirs", "openwaterevapo",
               "drainedIrrigation", "TransLoss", "simulatePolders", "inflow",
               "varfractionwater", "simulatePF", "TransientWaterDemandChange",
               "useWaterDemandAveYear", "wateruseRegion", "indicator", "repWaterUse")


def _settings(tmp, opts_on=(), vars_extra=None):
    v = dict(BASE_VARS)
    v["PathOut"] = str(tmp)
    v.update(vars_extra or {})
    return load_settings(os.path.join(CASE, "settings", "base.xml"),
                         opts_to_set=opts_on,
                         opts_to_unset=tuple(set(ALL_PHYSICS) - set(opts_on)),
                         vars_to_set=v)


def _loads_for(tmp, opts_on):
    """Binding names MapLoader.load sees during model build."""
    from lisflood_tpu.io import loadmap as lm
    from lisflood_tpu.models.initial import build_model
    calls = set()
    orig = lm.MapLoader.load

    def spy(self, name, *a, **k):
        calls.add(name)
        return orig(self, name, *a, **k)

    lm.MapLoader.load = spy
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            build_model(_settings(tmp, opts_on))
    finally:
        lm.MapLoader.load = orig
    return calls


# (option, co-options required, signature keys that MUST be loaded with it)
OPTION_INPUT_MATRIX = [
    ("simulateLakes", (), {"LakeSites", "LakeMultiplier", "LakeInitialLevelValue"}),
    ("simulateReservoirs", (), {"ReservoirSites", "adjust_Normal_Flood",
                                "ReservoirInitialFillValue"}),
    ("openwaterevapo", (), {"LakeMask", "maxNoEva"}),
    ("TransLoss", (), {"TransArea", "TransSub", "TransPower1"}),
    # simulatePolders is omitted: the ETRS89 dataset ships no polders.nc
    # (tests/test_landuse_pf_polder.py synthesizes one instead)
    ("SplitRouting", (), {"CrossSection2AreaInitValue", "PrevSideflowInitValue",
                          "CalChanMan2", "QSplitMult"}),
    ("wateruse", (), {"WUseRegion", "GroundwaterBodies", "EFlowThreshold",
                      "FractionGroundwaterUsed"}),
    ("riceIrrigation", ("wateruse",), {"RicePlantingDay1", "RiceHarvestDay1"}),
    ("groundwaterSmooth", ("wateruse",), {"LZSmoothRange"}),
    # QInTS is consumed by the tss reader, not loadmap — only the map key
    ("inflow", (), {"InflowPoints"}),
]

#: keys a module genuinely loads under an option but the REFERENCE's own
#: input_files_keys declaration table omits (e.g. routing.py:43-47 lists
#: only 3 SplitRouting keys while routing.py:361-397 also reads
#: QSplitMult and the prerun AvgDis) — mirrored here, not silently padded
#: into input_keys.json, so the declaration table stays a faithful extract
UNDECLARED_BUT_LEGITIMATE = {
    "SplitRouting": {"QSplitMult", "AvgDis"},
}


@pytest.mark.slow
@pytest.mark.parametrize("option,co_opts,signature",
                         [m for m in OPTION_INPUT_MATRIX],
                         ids=[m[0] for m in OPTION_INPUT_MATRIX])
def test_option_gates_input_loads(tmp_path, option, co_opts, signature):
    input_keys = json.load(open(os.path.join(
        REPO, "lisflood_tpu", "config", "input_keys.json")))
    declared = {k for mod in input_keys.values() if isinstance(mod, dict)
                for k in mod.get(option, [])}
    vars_extra = {}
    if option == "inflow":
        vars_extra = {"InflowPoints": "$(PathRoot)/maps/inflow_point_1.nc",
                      "QInTS": os.path.join(CASE, "reference", "inflow_daily", "inflow.tss")}
    (tmp_path / "off").mkdir()
    (tmp_path / "on").mkdir()
    base = _loads_for(tmp_path / "off", co_opts) if not vars_extra else \
        _loads_for(tmp_path / "off", co_opts)
    on = _loads_for(tmp_path / "on", (option,) + co_opts) if not vars_extra else None
    if vars_extra:
        from lisflood_tpu.models.initial import build_model
        from lisflood_tpu.io import loadmap as lm
        calls = set()
        orig = lm.MapLoader.load

        def spy(self, name, *a, **k):
            calls.add(name)
            return orig(self, name, *a, **k)

        lm.MapLoader.load = spy
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                build_model(_settings(tmp_path / "on", (option,) + co_opts, vars_extra))
        finally:
            lm.MapLoader.load = orig
        on = calls
    extra = on - base
    missing = signature - on
    assert not missing, f"{option}: signature inputs never loaded: {missing}"
    assert signature & extra, f"{option}: no signature input was option-gated"
    leaked = signature & base
    assert not leaked, f"{option}: inputs loaded with the option OFF: {leaked}"
    # everything newly loaded must be declared for this option (or one of
    # its co-activated helper keys)
    undeclared = extra - declared
    # keys shared between the option and always-on modules are tolerated
    # only if the declaration table lists them under any option
    all_declared = {k for mod in input_keys.values() if isinstance(mod, dict)
                    for ks in mod.values() for k in ks}
    all_declared |= UNDECLARED_BUT_LEGITIMATE.get(option, set())
    rogue = {k for k in undeclared if k not in all_declared}
    assert not rogue, f"{option}: loads undeclared inputs {rogue}"


# ---------------------------------------------------------------------------
# report options -> exactly the declared output files


def _expected_outputs(settings):
    """Predict the output basenames from registry.json with the reference
    activation rule (settings.py:666-680), independently of
    config/settings.py's own report dicts."""
    reg = json.load(open(os.path.join(
        REPO, "lisflood_tpu", "config", "registry.json")))
    opts = settings.options
    expected = set()

    def active(repoptions, restrict):
        allow = any(opts.get(o) for o in repoptions)
        if allow and restrict:
            allow = all(opts.get(o) for o in restrict)
        return allow

    for name, e in reg["reported_maps"].items():
        if active(e.get("steps", []) + e.get("all", []) + e.get("end", []),
                  e.get("restrictoption", [])):
            path = settings.binding.get(name)
            if path:
                expected.add(os.path.basename(os.path.normpath(path)))
    for name, e in reg["timeseries"].items():
        if active(e.get("repoption", []), e.get("restrictoption", [])):
            path = settings.binding.get(name)
            if path:
                base = os.path.basename(os.path.normpath(path))
                expected.add(base if base.endswith(".tss") else base + ".tss")
    return expected


OUTPUT_MATRIX = [
    ("repDischargeTs",),
    ("repStateMaps",),
    ("repDischargeTs", "repStateMaps", "repEndMaps"),
]


@pytest.mark.slow
@pytest.mark.parametrize("rep_opts", OUTPUT_MATRIX,
                         ids=["+".join(m) for m in OUTPUT_MATRIX])
def test_report_options_produce_declared_outputs(tmp_path, rep_opts):
    from lisflood_tpu.models.driver import LisfloodRunner

    s = _settings(tmp_path, rep_opts)
    # turn every OTHER rep option off so the file set is exactly ours
    for name, val in list(s.options.items()):
        if name.startswith("rep") and name not in rep_opts and val:
            s.options[name] = False
    from lisflood_tpu.config.settings import _build_report_dicts
    _build_report_dicts(s)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = LisfloodRunner(s)
    r.run()

    produced = {f[:-3] if f.endswith(".nc") else f
                for f in os.listdir(tmp_path) if not f.startswith("Debug")}
    expected = _expected_outputs(s)
    unexpected = produced - expected
    assert not unexpected, f"undeclared outputs produced: {unexpected}"
    missing = expected - produced
    assert not missing, f"declared outputs never produced: {missing}"
