"""Extract the declarative option/report registry from the reference's
default_options.py into a compact JSON data file.

The registry (option defaults, ReportedMap and TimeSeries declarations) is
pure configuration data that any LISFLOOD-compatible framework must share to
run the same settings files; we extract it as data rather than porting code.
"""
import json
import sys

REF = "/root/reference/src/lisflood/global_modules/default_options.py"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/lisflood_tpu/config/registry.json"

ns = {}
with open(REF) as f:
    exec(f.read(), ns)

opts = ns["default_options"]
out = {"options": {}, "reported_maps": {}, "timeseries": {}}
for k, v in opts.items():
    if k == "reportedmaps":
        for name, rm in v.items():
            out["reported_maps"][name] = {
                "output_var": rm.output_var, "unit": rm.unit,
                "end": list(rm.end), "steps": list(rm.steps), "all": list(rm.all),
                "restrictoption": list(rm.restrictoption),
                "monthly": bool(rm.monthly), "yearly": bool(rm.yearly),
            }
    elif k == "timeseries":
        for name, ts in v.items():
            out["timeseries"][name] = {
                "output_var": ts.output_var, "where": ts.where,
                "repoption": list(ts.repoption),
                "restrictoption": list(ts.restrictoption),
                "operation": list(ts.operation) if isinstance(ts.operation, (list, tuple)) else ts.operation,
            }
    else:
        out["options"][k] = bool(v)

with open(OUT, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"options={len(out['options'])} maps={len(out['reported_maps'])} tss={len(out['timeseries'])}")
