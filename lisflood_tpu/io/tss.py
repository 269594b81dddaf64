"""PCRaster time-series (.tss) files: reader and writer.

Format (reference zusatz.py:196-400): a header line, the column count
(gauges + 1), the literal "timestep", one line per gauge id, then one row
per step with " %8g" step number and " %14g" values (1e31 = missing).
"""
from __future__ import annotations

import time as _time

import numpy as np


def read_tss(path):
    """Read a .tss file -> (ids list, data array (steps, ncols), step numbers)."""
    with open(path) as f:
        lines = f.readlines()
    # header: line0 = description, line1 = ncols, line2 = 'timestep', then ids
    ncols = int(lines[1])
    ids = [int(float(lines[3 + i])) for i in range(ncols - 1)]
    rows = []
    steps = []
    for line in lines[2 + ncols :]:
        parts = line.split()
        if not parts:
            continue
        steps.append(int(float(parts[0])))
        rows.append([float(p) for p in parts[1:]])
    return ids, np.array(rows), np.array(steps)


def read_tss_header(path):
    """Gauge/outlet ids declared in the header (reference inflow.py:73)."""
    return read_tss(path)[0]


class TssWriter:
    """Accumulates per-step sampled values; writes the whole file at the end
    of the run (matching the reference's behaviour of rewriting the file
    from its in-memory buffer every reporting step)."""

    def __init__(self, path, ids, settings_path="", first_step=1, write_header=True):
        self.path = str(path)
        if not self.path.endswith(".tss"):
            self.path += ".tss"
        self.ids = list(ids)
        self.settings_path = settings_path
        self.first_step = first_step
        self.write_header = write_header
        self.rows = {}

    def sample(self, step, values):
        self.rows[int(step)] = np.atleast_1d(np.asarray(values, dtype=np.float64))

    def flush(self):
        with open(self.path, "w") as f:
            if self.write_header:
                f.write(
                    "timeseries scalar settingsfile: {} date: {}\n".format(
                        self.settings_path, _time.ctime()))
                f.write(f"{len(self.ids) + 1}\n")
                f.write("timestep\n")
                for gid in self.ids:
                    f.write(f"{gid}\n")
            for step in sorted(self.rows):
                row = " %8g" % step
                for v in self.rows[step]:
                    row += "           1e31" if np.isnan(v) else " %14g" % v
                f.write(row + "\n")
