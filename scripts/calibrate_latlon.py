"""Calibrate the synthesized lat-lon ta/e0 seasonal parameters against the
committed reference/dis_prerun.tss (which was produced with the REAL ta/e0
the checkout does not ship; tp.nc is real).

For each candidate (e0_mean, e0_amp, ta_mean), run a reduced InitLisflood
prerun and score our dis_prerun.tss against the first N steps of the
committed one (mean |rel| + bias). The long-term discharge is P - ET
integrated over the catchment, so the e0 magnitude is well identified;
ta mostly shifts snow/ET seasonality (secondary here).

Usage: python scripts/calibrate_latlon.py [n_steps] — prints a ranked
table; commit the winner into run_latlon.py (TA_/E0_ constants).
"""
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_latlon import CASE, synth_meteo  # noqa: E402


def run_prerun(n_steps, meteo_dir, out_dir):
    import datetime
    import warnings
    from lisflood_tpu.config import load_settings
    from lisflood_tpu.models.driver import LisfloodRunner

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    start = datetime.datetime(1986, 1, 2)
    v = {"PathMeteo": meteo_dir, "PathOut": out_dir,
         "StepEnd": (start + datetime.timedelta(days=n_steps - 1)).strftime("%d/%m/%Y %H:%M")}
    settings = load_settings(os.path.join(CASE, "prerun_lat_lon.xml"),
                             opts_to_unset=("writeNetcdf", "writeNetcdfStack"),
                             vars_to_set=v)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        runner = LisfloodRunner(settings)
    runner.run_scanned(chunk_steps=64)


def read_tss_col(path, n=None):
    with open(path) as f:
        lines = f.readlines()
    ncols = int(lines[1].strip())
    vals = [float(l.split()[1]) for l in lines[2 + ncols:] if l.split()]
    return np.asarray(vals if n is None else vals[:n])


def score(ours, ref):
    rel = np.abs(ours - ref) / np.abs(ref)
    bias = float(ours.mean() / ref.mean() - 1.0)
    return float(rel.mean()), bias, float(np.corrcoef(ours, ref)[0, 1])


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 730
    ref = read_tss_col(os.path.join(CASE, "reference", "dis_prerun.tss"), n_steps)
    candidates = []
    for e0_mean in (1.2, 1.6, 2.0, 2.4):
        candidates.append((12.0, 10.0, e0_mean, min(2.0, e0_mean - 0.1)))
    rows = []
    for ta_mean, ta_amp, e0_mean, e0_amp in candidates:
        meteo = f"/tmp/latlon_cal_meteo"
        synth_meteo(ta_mean, ta_amp, e0_mean, e0_amp, meteo_dir=meteo)
        out = "/tmp/latlon_cal_out"
        run_prerun(n_steps, meteo, out)
        ours = read_tss_col(os.path.join(out, "dis_prerun.tss"), n_steps)
        mrel, bias, corr = score(ours, ref)
        rows.append((mrel, bias, corr, ta_mean, ta_amp, e0_mean, e0_amp))
        print(f"ta={ta_mean}+/-{ta_amp} e0={e0_mean}+/-{e0_amp}: "
              f"mean_rel={mrel:.4f} bias={bias:+.4f} corr={corr:.4f}", flush=True)
    rows.sort()
    best = rows[0]
    print(f"\nBEST: ta={best[3]}+/-{best[4]} e0={best[5]}+/-{best[6]} "
          f"(mean_rel={best[0]:.4f} bias={best[1]:+.4f} corr={best[2]:.4f})")


if __name__ == "__main__":
    main()
