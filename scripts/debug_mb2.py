import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import warnings
import numpy as np
from lisflood_tpu.config import load_settings
from lisflood_tpu.models.driver import LisfloodRunner

case = "/root/reference/tests/data/LF_ETRS89_UseCase"
outdir = "/tmp/lf_out"; os.makedirs(outdir, exist_ok=True)

def one(opts_on, opts_off, label):
    s = load_settings(os.path.join(case, "settings", "base.xml"),
                      opts_to_set=('repMBTs',)+opts_on,
                      opts_to_unset=('wateruse','riceIrrigation','groundwaterSmooth')+opts_off,
                      vars_to_set={"CalendarDayStart":"01/01/1900 00:00",
                                   "StepStart":"02/01/1951 06:00","StepEnd":"31/01/1951 00:00","DtSec":"21600",
                                   "PathMeteo":"$(PathRoot)/meteo_1950","PathOut": outdir})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = LisfloodRunner(s)
    f = r.forcing_for(0, r.dates[0])
    state, diag = r.step_fn(r.state, f)
    print(label)
    for k in ("MB_WaterInit","MB_WaterIn","MB_WaterStored","MB_ChannelStored","MB_HillslopeStored","MB_WaterOut","MB_DisStructures","MBError"):
        print(f"  {k:20s}", np.unique(np.asarray(diag[k]))[:3])
    return r, diag

one(('simulateLakes','simulateReservoirs'), ('SplitRouting','openwaterevapo','drainedIrrigation'), "lakes+res")
one(('simulateLakes','simulateReservoirs','SplitRouting'), ('openwaterevapo','drainedIrrigation'), "lakes+res+split")
