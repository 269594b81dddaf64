"""MB-closure bisect harness (debug tool)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import warnings, time
import numpy as np
from lisflood_tpu.config import load_settings
from lisflood_tpu.models.driver import LisfloodRunner

case = "/root/reference/tests/data/LF_ETRS89_UseCase"
outdir = "/tmp/lf_out"; os.makedirs(outdir, exist_ok=True)

def run_steps(opts_on, opts_off, label, n=3, check_dtypes=False):
    s = load_settings(os.path.join(case, "settings", "base.xml"),
                      opts_to_set=('repMBTs',)+opts_on,
                      opts_to_unset=('wateruse','riceIrrigation','groundwaterSmooth')+opts_off,
                      vars_to_set={"CalendarDayStart":"01/01/1900 00:00",
                                   "StepStart":"02/01/1951 06:00","StepEnd":"31/01/1951 00:00","DtSec":"21600",
                                   "PathMeteo":"$(PathRoot)/meteo_1950","PathOut": outdir})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = LisfloodRunner(s)
    state = r.state
    t0=time.time()
    errs=[]
    for i in range(n):
        f = r.forcing_for(i, r.dates[i])
        new_state, diag = r.step_fn(state, f)
        if check_dtypes and i == 0:
            for k in state:
                a, b = state[k], new_state[k]
                if a.dtype != b.dtype or getattr(a,'weak_type',None) != getattr(b,'weak_type',None):
                    print(f"  DTYPE CHANGE {k}: {a.dtype}/{getattr(a,'weak_type',None)} -> {b.dtype}/{getattr(b,'weak_type',None)}")
        state = new_state
        errs.append(float(np.unique(np.asarray(diag["MBError"]))[0]))
    print(label, ["%.3f"%e for e in errs], f"({time.time()-t0:.0f}s, cache={r.step_fn._cache_size()})", flush=True)
    return r, state


def combos():
    ALL = ('SplitRouting','simulateLakes','simulateReservoirs','openwaterevapo','drainedIrrigation')
    run_steps(('simulateLakes','simulateReservoirs'), ('SplitRouting','openwaterevapo','drainedIrrigation'), "lakes+res      ")
    run_steps(('simulateLakes','simulateReservoirs','SplitRouting'), ('openwaterevapo','drainedIrrigation'), "lakes+res+split")
    run_steps(('drainedIrrigation',), tuple(o for o in ALL if o!='drainedIrrigation'), "drained        ")
    run_steps(ALL, (), "all            ")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv)>1 else "all"
    ALL = ('SplitRouting','simulateLakes','simulateReservoirs','openwaterevapo','drainedIrrigation')
    if which in ("minimal","all"):
        run_steps((), ALL, "minimal    ", check_dtypes=True)
    if which in ("lakes","all"):
        run_steps(('simulateLakes',), tuple(o for o in ALL if o!='simulateLakes'), "lakes      ")
    if which in ("res","all"):
        run_steps(('simulateReservoirs',), tuple(o for o in ALL if o!='simulateReservoirs'), "reservoirs ")
    if which in ("split","all"):
        run_steps(('SplitRouting',), tuple(o for o in ALL if o!='SplitRouting'), "split      ")
    if which == "combos":
        combos()
    if which in ("openwater","all"):
        run_steps(('openwaterevapo',), tuple(o for o in ALL if o!='openwaterevapo'), "openwater  ")
