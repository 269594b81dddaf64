"""Dump the optimized HLO of the production scanned step and print the
definitions of named instructions (default: the top device-time fusions
from scripts/profile_trace.py) with their operand chains.

Usage: python scripts/dump_hlo.py [name ...]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    names = sys.argv[1:] or ["fusion.411", "fusion.412", "fusion.433", "sort.12"]
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache_jax"))
    from profile_trace import build
    multi, state, stack = build(2)
    lowered = jax.jit(multi.impl).lower(multi.params_arrays, state, stack)
    txt = lowered.compile().as_text()
    out_path = "/tmp/multi_step_opt.hlo"
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {out_path}")
    for nm in names:
        # the instruction line defining %name = ...
        pat = re.compile(rf"%{re.escape(nm)} = .*")
        m = pat.search(txt)
        print(f"\n==== {nm} ====")
        if not m:
            print("not found")
            continue
        line = m.group(0)
        print(line[:2000])
        # if it's a fusion with calls=..., print the computation header
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm:
            comp = cm.group(1)
            cpat = re.compile(rf"^%?{re.escape(comp)} [^\n]*\n(.*?)^\}}",
                              re.M | re.S)
            c = cpat.search(txt)
            if c:
                body = c.group(0)
                print(f"--- computation {comp} ({body.count(chr(10))} lines) ---")
                print(body[:6000])


if __name__ == "__main__":
    main()
