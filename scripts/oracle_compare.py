"""Oracle end-to-end comparison vs the reference's committed outputs.

Mirrors reference tests/test_results.py:30-101 (TestCatch.run): full-option
daily / 6-hourly run on LF_ETRS89_UseCase, compared against
reference/output_reference_{daily,6h} at atol=1e-4 rtol=1e-3
(docs/4_annex_tests/index.md:27-30).

Usage: python scripts/oracle_compare.py [daily|6h] [max_steps]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"

MODULES_TO_SET = (
    "SplitRouting", "simulateReservoirs", "simulateLakes", "drainedIrrigation",
    "openwaterevapo", "riceIrrigation", "wateruse", "useWaterDemandAveYear",
    "wateruseRegion", "TransientWaterDemandChange",
)
OPTS_TO_UNSET = (
    "repStateSites", "repRateSites", "repStateUpsGauges", "repRateUpsGauges",
    "repMeteoUpsGauges", "repsimulateLakes", "repStateMaps",
    "repsimulateReservoirs", "repSnowMaps", "repPFMaps", "repLZMaps",
    "repUZMaps", "repGwPercUZLZMaps", "repRWS", "repTotalWUse", "repWIndex",
    "repSurfaceRunoffMaps", "repRainMaps", "repSnowCoverMaps",
    "repSnowMeltMaps", "repPFForestMaps",
)
OPTS_TO_SET = (
    "repDischargeTs", "repDischargeMaps", "repThetaMaps", "repThetaForestMaps",
    "repThetaIrrigationMaps", "repE2O2", "repTotalWaterStorageMaps",
) + MODULES_TO_SET


def run_case(dt_sec, out_dir, max_steps=None):
    from lisflood_tpu.config import load_settings
    from lisflood_tpu.models.driver import LisfloodRunner

    os.makedirs(out_dir, exist_ok=True)
    settings = load_settings(
        os.path.join(CASE, "settings", "base.xml"),
        opts_to_set=OPTS_TO_SET,
        opts_to_unset=OPTS_TO_UNSET,
        vars_to_set={
            "StepStart": "02/01/2016 06:00",
            "StepEnd": "02/07/2016 06:00",
            "DtSec": str(dt_sec),
            "PathOut": out_dir,
        },
    )
    runner = LisfloodRunner(settings)
    runner.run(progress=True, max_steps=max_steps)
    return runner


def read_nc_var(path):
    import h5py
    with h5py.File(path, "r") as f:
        names = [k for k in f.keys()
                 if k not in ("time", "x", "y", "lon", "lat", "laea",
                              "lambert_azimuthal_equal_area", "crs", "wgs_1984")]
        v = f[names[0]][...]
        fill = f[names[0]].attrs.get("_FillValue", None)
        v = np.asarray(v, dtype=np.float64)
        if fill is not None:
            v[v == fill] = np.nan
    return v


def read_tss(path):
    rows = []
    with open(path) as f:
        lines = f.readlines()
    ncols = int(lines[1].strip())
    data_lines = lines[2 + ncols:]
    for line in data_lines:
        parts = line.split()
        if not parts:
            continue
        rows.append([float(x) for x in parts[1:]])
    return np.array(rows)


def compare_map(name, out_dir, ref_dir, nsteps=None, atol=1e-4, rtol=1e-3):
    ours = read_nc_var(os.path.join(out_dir, name + ".nc"))
    ref = read_nc_var(os.path.join(ref_dir, name + ".nc"))
    n = ours.shape[0] if nsteps is None else min(nsteps, ours.shape[0])
    ref = ref[:n]
    ours = ours[:n]
    both = np.isfinite(ours) & np.isfinite(ref)
    diff = np.abs(ours[both] - ref[both])
    tol = atol + rtol * np.abs(ref[both])
    bad = diff > tol
    frac = bad.mean() if bad.size else 0.0
    maxrel = (diff / (np.abs(ref[both]) + 1e-12)).max() if diff.size else 0.0
    status = "OK " if frac == 0 else "FAIL"
    print(f"  {status} map {name:6s}: {bad.sum()}/{bad.size} out-of-tol "
          f"({100*frac:.3f}%), max|rel|={maxrel:.3e}, max|abs|={diff.max() if diff.size else 0:.3e}")
    return frac == 0


def compare_tss(name, out_dir, ref_dir, nsteps=None, atol=1e-4, rtol=1e-3):
    ours = read_tss(os.path.join(out_dir, name + ".tss"))
    ref = read_tss(os.path.join(ref_dir, name + ".tss"))
    n = ours.shape[0] if nsteps is None else min(nsteps, ours.shape[0])
    ours, ref = ours[:n], ref[:n]
    diff = np.abs(ours - ref)
    tol = atol + rtol * np.abs(ref)
    bad = diff > tol
    frac = bad.mean()
    maxrel = (diff / (np.abs(ref) + 1e-12)).max()
    status = "OK " if frac == 0 else "FAIL"
    print(f"  {status} tss {name:6s}: {bad.sum()}/{bad.size} out-of-tol "
          f"({100*frac:.3f}%), max|rel|={maxrel:.3e}")
    return frac == 0


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "daily"
    max_steps = int(sys.argv[2]) if len(sys.argv) > 2 else None
    dt = 86400 if which == "daily" else 21600
    ref_dir = os.path.join(CASE, "reference",
                           "output_reference_daily" if which == "daily" else "output_reference_6h")
    out_dir = f"/tmp/lf_oracle_{which}"
    run_case(dt, out_dir, max_steps=max_steps)
    print(f"--- comparing vs {ref_dir} (first {max_steps or 'all'} steps)")
    ok = True
    for name in ("dis", "chanq", "thia", "thic", "thfa", "thfc", "tha", "thc", "lz", "tws"):
        p = os.path.join(out_dir, name + ".nc")
        if os.path.exists(p):
            ok &= compare_map(name, out_dir, ref_dir, nsteps=max_steps)
        else:
            print(f"  MISSING map {name}.nc")
            ok = False
    for name in ("dis", "chanq"):
        p = os.path.join(out_dir, name + ".tss")
        if os.path.exists(p):
            ok &= compare_tss(name, out_dir, ref_dir, nsteps=max_steps)
        else:
            print(f"  MISSING tss {name}.tss")
            ok = False
    print("ORACLE", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
