"""Run driver: time loop, forcing pipeline, and output writing.

Equivalent of the reference's lisfloodexe + DynamicFramework run loop
(main.py:56-157, zusatz.py:116-171) and the output module
(output.py:485-586): per step it assembles the forcing dict on host,
invokes the jitted step, and feeds the declarative output system
(netCDF map stacks + PCRaster-style TSS gauge series).
"""
from __future__ import annotations

import datetime
import os
import re
import time as _time

import numpy as np

from ..config.calendar import parse_date_or_step
from ..io.forcing import ForcingReader, open_forcing_stack, run_dates
from ..io import ncdf
from ..io.tss import TssWriter
from ..io.csf import write_map, VS_SCALAR
from ..utils.errors import LisfloodError
from .initial import build_model
from .step import build_step

_INDEXED = re.compile(r"^(\w+)\[(\d+)\]$")


def resolve_output(diag, expr):
    """Resolve a ReportedMap/TimeSeries output_var expression against the
    diagnostics dict: a plain name ('LZ'), an indexed name ('Theta1a[2]'),
    or an arithmetic expression as the reference evals them
    ('EvaAddM3*self.var.M3toMM', output.py:566)."""
    m = _INDEXED.match(expr)
    if m:
        return np.asarray(diag[m.group(1)])[int(m.group(2))]
    if expr in diag:
        return np.asarray(diag[expr])
    import types
    ns = {k: np.asarray(v) for k, v in diag.items()}
    ns["self"] = types.SimpleNamespace(var=types.SimpleNamespace(**ns))
    return np.asarray(eval(expr, {"__builtins__": {}}, ns))


def output_var_fields(expr):
    """Diagnostic field names an output_var expression depends on."""
    return {t for t in re.findall(r"[A-Za-z_]\w*", expr.replace("self.var.", " "))
            if t not in ("self", "var")}


def _coord_pairs(value):
    """Parse a 'x1 y1 x2 y2 ...' gauge coordinate string; None if the value
    is not an even-length list of numbers (reference output.py:513-515)."""
    toks = str(value).split()
    if not toks or len(toks) % 2 != 0:
        return None
    try:
        return [float(t) for t in toks]
    except ValueError:
        return None


def _gauges_from_coords(coords, grid):
    """Build a compressed gauge-id vector (i+1 at each coordinate's cell)
    from map coordinates (reference valuecell, add1.py:102-132)."""
    ids2d = np.zeros((grid.nrows, grid.ncols))
    for i in range(len(coords) // 2):
        col = int((coords[2 * i] - grid.west) / grid.cell)
        row = int((grid.north - coords[2 * i + 1]) / grid.cell)
        if not (0 <= row < grid.nrows and 0 <= col < grid.ncols):
            raise LisfloodError(
                f"Gauge coordinates {coords[2*i]},{coords[2*i+1]} outside mask "
                f"map - col,row: {col},{row}")
        ids2d[row, col] = i + 1
    return grid.compress(ids2d)


class GaugeSampler:
    """PCRaster TimeoutputTimeseries sampling: per gauge-id region average
    (zusatz.py:294-400 + pcraster areaaverage semantics)."""

    def __init__(self, ids_vec):
        ids_vec = np.nan_to_num(np.asarray(ids_vec), nan=0.0).astype(np.int64)
        self.ids = np.unique(ids_vec[ids_vec > 0])
        self.masks = [ids_vec == gid for gid in self.ids]

    def sample(self, values):
        values = np.asarray(values)
        return np.array([values[m].mean() if m.any() else np.nan for m in self.masks])


_H5_INTERNAL_ATTRS = ("CLASS", "NAME", "REFERENCE_LIST", "DIMENSION_LIST",
                      "_Netcdf4Dimid", "_Netcdf4Coordinates", "_FillValue")


class TemplateMeta:
    """Coordinate + projection metadata from the netCDF template — the
    analogue of the reference's NetCDFMetadata singleton
    (settings.py:285-326), consumed by the map writer so geographic grids
    get lon/lat dims + the projection variable exactly like
    write_netcdf_header (netcdf.py:494-530)."""

    _XY_DEFAULTS = {
        "x": {"units": "Meter", "standard_name": "projection_x_coordinate",
              "long_name": "x coordinate of projection"},
        "y": {"units": "Meter", "standard_name": "projection_y_coordinate",
              "long_name": "y coordinate of projection"},
        "lon": {"units": "degrees_east", "standard_name": "longitude",
                "long_name": "longitude coordinate"},
        "lat": {"units": "degrees_north", "standard_name": "latitude",
                "long_name": "latitude coordinate"},
    }

    def __init__(self, settings):
        self.dims = ("x", "y")      # (x-like, y-like)
        self.coord_attrs = {}
        self.proj = None            # (var_name, attrs)
        path = (settings.binding.get("netCDFtemplate")
                or settings.binding.get("PrecipitationMaps"))
        if path:
            try:
                from ..io.ncdf import NcFile
                with NcFile(path) as nc:
                    xd, yd = nc.spatial_dims
                    self.dims = (xd, yd)
                    for d in (xd, yd):
                        self.coord_attrs[d] = {
                            k: v for k, v in nc.attrs(d).items()
                            if k not in _H5_INTERNAL_ATTRS}
                    for name in ("laea", "lambert_azimuthal_equal_area"):
                        if nc.has(name):
                            self.proj = (name, {
                                k: v for k, v in nc.attrs(name).items()
                                if k not in _H5_INTERNAL_ATTRS})
                            break
            except Exception:
                pass

    def attrs_for(self, dim):
        at = dict(self._XY_DEFAULTS.get(dim, {}))
        at.update(self.coord_attrs.get(dim, {}))
        return at


class MapStackWriter:
    """netCDF stack writer for one reported map (output.py:68-167 +
    netcdf.py:432-584)."""

    def __init__(self, settings, grid, map_key, entry, rep_steps, frequency, single,
                 meta=None):
        self.settings = settings
        self.grid = grid
        self.map_key = map_key
        self.entry = entry
        self.frequency = frequency
        self.single = single          # end map: single 2-D field
        self.meta = meta or TemplateMeta(settings)
        path = settings.binding.get(map_key)
        self.path = os.path.normpath(path) + ".nc"
        self.var_name = os.path.basename(os.path.normpath(path))
        self.rep_steps = list(rep_steps) if rep_steps is not None else None
        self._file = None
        self._index = 0

    def _create(self):
        binding = self.settings.binding
        f = ncdf.create_nc(self.path)
        f.attrs["settingsfile"] = self.settings.settings_path
        f.attrs["date_created"] = _time.ctime()
        f.attrs["Source_Software"] = "LISFLOOD-TPU"
        f.attrs["source"] = "Lisflood output maps"
        f.attrs["Conventions"] = "CF-1.6"
        xd, yd = self.meta.dims
        ncdf.add_dimension(f, xd, self.grid.coords_x(), self.meta.attrs_for(xd))
        ncdf.add_dimension(f, yd, self.grid.coords_y(), self.meta.attrs_for(yd))
        dtype = binding.get("OutputMapsDataType", "float64")
        attrs = {"standard_name": self.map_key, "long_name": self.entry.output_var, "units": self.entry.unit}
        if self.meta.proj is not None:
            proj_name, proj_attrs = self.meta.proj
            proj = f.create_dataset(proj_name, data=np.int32(0))
            for k, v in proj_attrs.items():
                proj.attrs[k] = v
            attrs["grid_mapping"] = proj_name
        if self.single:
            ds = ncdf.add_variable(f, self.var_name, (yd, xd), dtype, fill_value=-9999.0, attrs=attrs)
        else:
            dt_sec = float(binding["DtSec"])
            start = parse_date_or_step(binding["CalendarDayStart"], binding["calendar_type"])
            if dt_sec >= 86400:
                units = "days since %s" % start.strftime("%Y-%m-%d %H:%M:%S.0")
            elif dt_sec >= 3600:
                units = "hours since %s" % start.strftime("%Y-%m-%d %H:%M:%S.0")
            else:
                units = "minutes since %s" % start.strftime("%Y-%m-%d %H:%M:%S.0")
            ncdf.add_unlimited_time(f, units, binding["calendar_type"])
            ds = ncdf.add_variable(f, self.var_name, ("time", yd, xd), dtype,
                                   fill_value=-9999.0, chunks=(1, self.grid.nrows, self.grid.ncols), attrs=attrs)
        self._file = f
        return f

    def write_step(self, date, vec, step=None):
        if self._file is None:
            self._create()
        data2d = self.grid.decompress(np.asarray(vec, dtype=np.float64))
        data2d = np.where(np.isnan(data2d), -9999.0, data2d)
        if self.single:
            self._file[self.var_name][:, :] = data2d
        else:
            ncdf.append_time_step(self._file, self.var_name, date, data2d)

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None


class PCRasterStackWriter:
    """PCRaster-format map output (output.py:170-188): one CSF .map per
    reported step with 8.3-style numbered names (add1.py:858-889), plus the
    plain name for end maps."""

    def __init__(self, settings, grid, map_key, entry, single):
        self.grid = grid
        self.map_key = map_key
        self.entry = entry
        self.single = single
        self.path = os.path.normpath(settings.binding.get(map_key))

    def _numbered(self, step):
        head, tail = os.path.split(self.path)
        nr = str(step)
        tail = tail[:8]
        space = 11 - (len(tail) + len(nr))
        result = f"{tail}{'0' * space}{nr}"
        return os.path.join(head, f"{result[:8]}.{result[8:]}")

    def write_step(self, date, vec, step=None):
        data2d = self.grid.decompress(np.asarray(vec, dtype=np.float64))
        if self.single:
            # bindings like '.../avgdis.map' already carry the extension
            path = self.path if self.path.endswith(".map") else self.path + ".map"
        else:
            path = self._numbered(step)
        write_map(path, data2d.astype(np.float32), self.grid.west, self.grid.north,
                  self.grid.cell, VS_SCALAR)

    def close(self):
        pass


class OutputManager:
    """Declarative outputs: builds all active map writers and TSS samplers
    from the settings registries (output.py:387-447,485-586)."""

    def __init__(self, settings, grid, params, aux, config):
        self.settings = settings
        self.grid = grid
        self.config = config
        binding = settings.binding
        self.rep_steps = [x for x in settings.report_steps
                          if settings.step_start_int <= x <= settings.step_end_int]
        self.map_writers = []       # (writer, trigger) trigger in {'end','steps','all'}
        seen_paths = set()
        # async map writing (reference output.py:449-480): a single writer
        # thread serializes h5py access while overlapping device compute;
        # disable with AsyncOutput=False
        self._async = str(binding.get("AsyncOutput", "True")) != "False"
        self._write_queue = None
        self._write_worker = None
        self._write_error = None

        write_nc = settings.options.get("writeNetcdf") or settings.options.get("writeNetcdfStack")
        meta = TemplateMeta(settings)

        # TSS `operation` support (reference output.py:566-574): catchment
        # 'total' = accuflux(value*PixelArea)/UpArea; 'mapmaximum' = global max
        self._params = params
        self._graph = aux.get("graph_full")
        self._pixel_area = np.asarray(params["PixelArea"], np.float64)
        up_area = np.asarray(params["UpArea"], np.float64)
        self._inv_up_area = np.where(up_area > 0, 1.0 / up_area, 0.0)

        def add(map_key, entry, trigger, frequency):
            path = binding.get(map_key)
            if not path:
                return
            if trigger == "steps" and not self.rep_steps:
                return
            if write_nc:
                w = MapStackWriter(settings, grid, map_key, entry, self.rep_steps, frequency,
                                   single=(trigger == "end"), meta=meta)
            else:
                w = PCRasterStackWriter(settings, grid, map_key, entry, single=(trigger == "end"))
            if w.path in seen_paths:
                return
            seen_paths.add(w.path)
            self.map_writers.append((w, trigger, frequency))

        for key, entry in settings.report_maps_end.items():
            add(key, entry, "end", None)
        for key, entry in settings.report_maps_steps.items():
            freq = "monthly" if entry.monthly else ("yearly" if entry.yearly else "all")
            add(key, entry, "steps", freq)
        for key, entry in settings.report_maps_all.items():
            freq = "monthly" if entry.monthly else ("yearly" if entry.yearly else "all")
            add(key, entry, "all", freq)

        # TSS
        self.tss_writers = {}
        self.tss_samplers = {}
        loader = aux["loader"]
        for name, ts in settings.report_timeseries.items():
            where = ts.where
            if where == "Catchments":
                ids_vec = params["Catchments"]
            elif _coord_pairs(binding.get(where, "")) is not None:
                # coordinate-pair gauges: 'x1 y1 x2 y2 ...' placed on the
                # grid by inverse cell arithmetic (reference valuecell,
                # add1.py:102-132; dispatch output.py:513-515)
                ids_vec = _gauges_from_coords(_coord_pairs(binding[where]), grid)
            else:
                try:
                    ids_vec = loader.load(where)
                except LisfloodError:
                    continue
                if np.isscalar(ids_vec):
                    continue
            sampler = GaugeSampler(ids_vec)
            path = binding.get(name)
            if not path:
                continue
            self.tss_writers[name] = TssWriter(path, sampler.ids.tolist(),
                                               settings_path=settings.settings_path,
                                               write_header=not settings.flags.get("noheader"))
            self.tss_samplers[name] = (sampler, ts)

    def _writer_loop(self):
        while True:
            item = self._write_queue.get()
            if item is None:
                return
            if self._write_error is not None:
                continue                  # first failure wins; drain the rest
            w, date, vec, step = item
            try:
                w.write_step(date, vec, step=step)
            except Exception as e:        # surfaced at close()
                self._write_error = e

    def _dispatch_write(self, w, date, vec, step):
        """Stage a map write on the writer thread (reference
        output.py:449-480 OutputMapsFactoryThreads): the host netCDF write
        overlaps the next step's device compute. Bounded queue so a slow
        filesystem backpressures instead of buffering the whole run."""
        if not self._async:
            w.write_step(date, vec, step=step)
            return
        import queue as _queue
        import threading
        if self._write_queue is None:
            self._write_queue = _queue.Queue(maxsize=64)
            self._write_worker = threading.Thread(target=self._writer_loop, daemon=True)
            self._write_worker.start()
        self._write_queue.put((w, date, np.asarray(vec, np.float64).copy(), step))

    def _drain_writes(self):
        if self._write_queue is not None:
            self._write_queue.put(None)
            self._write_worker.join()
            self._write_queue = None
            self._write_worker = None

    def needed_fields(self):
        """Diagnostic fields the active outputs read (params excluded —
        compound expressions may reference converters like M3toMM, which
        resolve from the params side instead)."""
        fields = set()
        for w, _, _ in self.map_writers:
            fields |= output_var_fields(w.entry.output_var)
        for _, (_, ts) in self.tss_samplers.items():
            fields |= output_var_fields(ts.output_var)
        return {f for f in fields if f not in self._params}

    def _resolve(self, diag, expr):
        try:
            return resolve_output(diag, expr)
        except (KeyError, AttributeError):
            merged = dict(self._params)
            merged.update(diag)
            return resolve_output(merged, expr)

    def report(self, step, date, diag, monthend=False, yearend=False, is_last=False):
        def freq_ok(freq):
            return freq == "all" or freq is None or (freq == "monthly" and monthend) or (freq == "yearly" and yearend)

        for w, trigger, freq in self.map_writers:
            if trigger == "end":
                if is_last:
                    self._dispatch_write(w, date, self._resolve(diag, w.entry.output_var), step)
            elif trigger == "steps":
                if step in self.rep_steps and freq_ok(freq):
                    self._dispatch_write(w, date, self._resolve(diag, w.entry.output_var), step)
            else:  # all
                if freq_ok(freq):
                    self._dispatch_write(w, date, self._resolve(diag, w.entry.output_var), step)

        for name, (sampler, ts) in self.tss_samplers.items():
            field = np.asarray(self._resolve(diag, ts.output_var), np.float64)
            op = ts.operation[0] if ts.operation else ""
            if op == "mapmaximum":
                # reference output.py:568-570: sample the map-wide maximum
                field = np.full_like(field, np.nanmax(field))
            elif op == "total" and self._graph is not None:
                # reference output.py:571-573: upstream-average via
                # catchmenttotal(value*PixelArea, Ldd) * InvUpArea
                field = self._graph.accuflux(np.nan_to_num(field) * self._pixel_area) * self._inv_up_area
            values = sampler.sample(field)
            self.tss_writers[name].sample(step, values)

    def close(self):
        # drain the async queue, then close/flush EVERY writer before
        # surfacing a staged write error — a failed map write must not leave
        # the other output files unflushed
        self._drain_writes()
        try:
            for w, _, _ in self.map_writers:
                w.close()
            for w in self.tss_writers.values():
                w.flush()
        finally:
            if self._write_error is not None:
                err, self._write_error = self._write_error, None
                raise err


class LisfloodRunner:
    """End-to-end deterministic run."""

    def __init__(self, settings, dtype=None):
        self.settings = settings
        self.config, params_np, state_np, aux = build_model(settings)
        self.aux = aux
        self.grid = aux["grid"]
        self.params_np = params_np
        import jax.numpy as jnp
        if dtype is None:
            # Precision binding: 'double' (reference parity, default) or
            # 'single' (TPU fast mode; passes the oracle tolerances
            # atol=1e-4/rtol=1e-3 but not bitwise warm-start equality).
            prec = str(settings.binding.get("Precision", "double")).lower()
            dtype = jnp.float32 if prec in ("single", "float32", "f32") else jnp.float64
        self.dtype = dtype
        self.step_fn, self.params = build_step(self.config, params_np, aux, dtype=dtype)
        # keep exactly the step function's state contract: build_model may
        # emit extra entries (e.g. split-routing state during an InitLisflood
        # prerun) that would break the lax.scan carry structure. With the
        # packed router the routing state converts ONCE to schedule-packed
        # pk$ entries here (and back to natural space at end of run).
        from .step import state_keys
        state_np = self.step_fn.prepare_state(state_np)
        allowed = set(state_keys(self.config))
        self.state = {k: jnp.asarray(v, dtype if np.asarray(v).dtype.kind == "f" else None)
                      for k, v in state_np.items() if k in allowed}
        binding = settings.binding

        dates = run_dates(settings)
        self.dates = dates
        skip_val = settings.flags.get("skipvalreplace", False)
        self.forcings = {}
        for key, name in [("Precipitation", "PrecipitationMaps"), ("Tavg", "TavgMaps"),
                          ("ETRef", "ET0Maps"), ("EWRef", "E0Maps")]:
            # netCDF stack, or PCRaster numbered-map stack (readmapsparse)
            self.forcings[key] = open_forcing_stack(
                binding[name], self.grid, dates,
                first_step=settings.step_start_int,
                skip_valid_replace=skip_val)
        self.demand = {}
        if self.config.water_use and self.config.transient_water_demand:
            for key, name in [("DomesticDemandMM", "DomesticDemandMaps"),
                              ("IndustrialDemandMM", "IndustrialDemandMaps"),
                              ("LivestockDemandMM", "LivestockDemandMaps"),
                              ("EnergyDemandMM", "EnergyDemandMaps")]:
                self.demand[key] = ForcingReader(
                    binding[name], self.grid, dates, indexer="ffill",
                    climatology=self.config.water_demand_ave_year,
                    skip_valid_replace=skip_val)

        self.landuse_stacks = {}
        if self.config.transient_landuse:
            # yearly land-use fraction stacks, nearest-date indexed
            # (landusechange.py:94-148)
            for key in ("ForestFraction", "DirectRunoffFraction", "WaterFraction",
                        "IrrigationFraction", "RiceFraction", "OtherFraction"):
                self.landuse_stacks[key] = ForcingReader(
                    binding[key + "Maps"], self.grid, dates, indexer="closest",
                    skip_valid_replace=skip_val)

        self.outputs = OutputManager(settings, self.grid, params_np, aux, self.config)
        self.cal_day_start = aux["CalendarDayStart"]
        self.lai_lookup = aux["lai_day_to_interval"]
        self.varw_lookup = aux.get("varW_day_to_month")
        if self.config.inflow:
            # per-step inflow vector from the hydrograph tss (inflow.py:113-127)
            ids, data, steps = aux["inflow_tss"]
            pts = aux["inflow_points"]
            col_of = {pid: i for i, pid in enumerate(ids)}
            row_of = {int(st): i for i, st in enumerate(steps)}
            self._inflow = (pts, col_of, row_of, data)

    def close(self):
        """Close all forcing/demand/land-use readers (joins their prefetch
        threads) and flush outputs."""
        for readers in (self.forcings, self.demand, self.landuse_stacks):
            for r in readers.values():
                try:
                    r.close()
                except Exception:
                    pass
        self.outputs.close()

    def forcing_for(self, offset, date):
        import jax.numpy as jnp
        cal_day = int(date.strftime("%j"))
        dt = self.dtype
        f = {
            "Precipitation": jnp.asarray(self.forcings["Precipitation"][offset], dt),
            "Tavg": jnp.asarray(self.forcings["Tavg"][offset], dt),
            "ETRef": jnp.asarray(self.forcings["ETRef"][offset], dt),
            "EWRef": jnp.asarray(self.forcings["EWRef"][offset], dt),
            "CalendarDay": jnp.asarray(cal_day, dt),
            "LAIInterval": jnp.int32(self.lai_lookup[cal_day]),
        }
        if self.varw_lookup is not None:
            f["VarWMonth"] = jnp.int32(self.varw_lookup[cal_day])
        if self.config.water_use and self.config.indicator:
            nxt = date + datetime.timedelta(seconds=self.config.dt_sec)
            f["MonthEnd"] = jnp.asarray(nxt.month != date.month)
            f["YearEnd"] = jnp.asarray(nxt.year != date.year)
        if self.config.inflow:
            pts, col_of, row_of, data = self._inflow
            step = self.settings.step_start_int + offset
            qin = np.zeros(self.grid.num_pixels)
            row = row_of.get(step)
            if row is not None:
                for pid, col in col_of.items():
                    val = data[row, col]
                    if np.isfinite(val) and val < 1e30:
                        qin[pts == pid] = val
            f["QInM3"] = jnp.asarray(qin * self.config.dt_sec, dt)
        if self.config.transient_landuse:
            n = len(self.dates)
            for key, reader in self.landuse_stacks.items():
                f[key + "_t"] = jnp.asarray(reader[offset], dt)
                if self.config.rep_mbts:
                    f[key + "_nt"] = jnp.asarray(reader[min(offset + 1, n - 1)], dt)
        if self.config.water_use:
            dt_day = self.config.dt_day
            if self.config.transient_water_demand:
                for key in self.demand:
                    f[key] = jnp.asarray(self.demand[key][offset], dt) * dt_day
            else:
                for key in ("DomesticDemandMM", "IndustrialDemandMM", "LivestockDemandMM", "EnergyDemandMM"):
                    f[key] = jnp.asarray(self.params[key])
        return f

    def _warn_soil_cap(self, hit):
        """One-shot warning when the Courant safety cap truncated soil
        sub-stepping (the reference's per-pixel loop is unbounded,
        soilloop.py:249)."""
        if hit and not getattr(self, "_soil_cap_warned", False):
            self._soil_cap_warned = True
            import warnings
            from ..utils.errors import LisfloodWarning
            warnings.warn(LisfloodWarning(
                f"soil Courant sub-step count exceeded the safety cap "
                f"(max_soil_substeps={self.config.max_soil_substeps}); "
                f"inter-layer seepage was truncated on some pixels"))

    def run_scanned(self, chunk_steps=16, progress=False, max_steps=None):
        """Scanned run: batches of `chunk_steps` model steps execute as one
        device program (lax.scan), amortizing host<->device latency."""
        import jax.numpy as jnp
        from .step import build_multi_step

        settings = self.settings
        needed = sorted(self.outputs.needed_fields() | {"SoilCourantCapHit"})
        multi, _ = build_multi_step(self.config, self.params_np, self.aux, output_keys=needed)
        start = settings.step_start_int
        end = settings.step_end_int
        n = end - start + 1
        if max_steps is not None:
            n = min(n, max_steps)
        state = self.step_fn.prepare_state(self.state)
        offset = 0
        while offset < n:
            k = min(chunk_steps, n - offset)
            fs = [self.forcing_for(offset + i, self.dates[offset + i]) for i in range(k)]
            stack = {key: jnp.stack([f[key] for f in fs]) for key in fs[0]}
            state, outs = multi(state, stack)
            outs = {key: np.asarray(v) for key, v in outs.items()}
            self._warn_soil_cap(bool(outs["SoilCourantCapHit"].any()))
            for i in range(k):
                step = start + offset + i
                date = self.dates[offset + i]
                diag_i = {key: outs[key][i] for key in outs}
                monthend = yearend = False
                if self.config.water_use and self.config.indicator:
                    nxt = date + datetime.timedelta(seconds=self.config.dt_sec)
                    monthend = nxt.month != date.month
                    yearend = nxt.year != date.year
                self.outputs.report(step, date, diag_i, monthend, yearend, is_last=(step == end))
            if progress:
                print(f"\r{start + offset + k - 1} - {self.dates[offset + k - 1]:%d/%m/%Y %H:%M}", end="", flush=True)
            offset += k
        if progress:
            print()
        # natural-space state for downstream consumers (warm dumps, tests)
        self.state = self.step_fn.natural_state(state)
        self.close()
        return self.state

    def _debug_dump(self, fname, chan_m3, chan2_m3=None, cross2_area=None):
        """-d debug: per-pixel channel state text dump (reference
        Lisflood_initial.py:239-250 / Lisflood_dynamic.py:252-262),
        including the reference's range(nelements-1) quirk."""
        inv_dx = 1.0 / np.asarray(self.params_np["ChanLength"], np.float64)
        chan_m3 = np.asarray(chan_m3, np.float64)
        tcsa = chan_m3 * inv_dx
        with open(fname, "w") as f:
            if chan2_m3 is not None and cross2_area is not None:
                c2 = np.asarray(cross2_area, np.float64)
                m2 = np.asarray(chan2_m3, np.float64)
                for i in range(chan_m3.size - 1):
                    print(i, tcsa[i], c2[i], chan_m3[i], m2[i], file=f)
            else:
                for i in range(chan_m3.size - 1):
                    print(i, tcsa[i], chan_m3[i], file=f)

    def _loud_dis(self, diag):
        """First-gauge average discharge for the -l per-step line
        (reference output.py:557-563 firstout of DisTS)."""
        pair = self.outputs.tss_samplers.get("DisTS")
        if pair is None:
            return None
        sampler, _ = pair
        try:
            return float(sampler.sample(np.asarray(diag["ChanQAvg"]))[0])
        except Exception:
            return None

    def run(self, progress=False, max_steps=None):
        settings = self.settings
        flags = settings.flags
        loud = flags.get("loud")
        debug = flags.get("debug")
        start = settings.step_start_int
        end = settings.step_end_int
        n = end - start + 1
        if max_steps is not None:
            n = min(n, max_steps)
        self.state = self.step_fn.prepare_state(self.state)
        if debug:
            st_n = self.step_fn.natural_state(self.state)
            split = "CrossSection2Area" in st_n
            self._debug_dump(
                os.path.join(settings.output_dir, f"Debug_init_{start}.txt"),
                st_n["ChanM3Kin"],
                st_n.get("Chan2M3Kin") if split else None,
                st_n.get("CrossSection2Area") if split else None)
        for offset in range(n):
            step = start + offset
            date = self.dates[offset]
            f = self.forcing_for(offset, date)
            self.state, diag = self.step_fn(self.state, f)
            self._warn_soil_cap(bool(np.asarray(diag["SoilCourantCapHit"])))
            # month/year end flags: only meaningful when wateruse+indicator
            # are both active (reference quirk, indicatorcalc.py:92-96)
            monthend = yearend = False
            if self.config.water_use and self.config.indicator:
                nxt = date + datetime.timedelta(seconds=self.config.dt_sec)
                monthend = nxt.month != date.month
                yearend = nxt.year != date.year
            self.outputs.report(step, date, diag, monthend, yearend, is_last=(step == end))
            if loud:
                dis = self._loud_dis(diag)
                line = "%-6i %20s" % (step, date.strftime("%d/%m/%Y %H:%M"))
                if dis is not None:
                    line += " %10.2f" % dis
                print(line, flush=True)
            elif progress:
                print(f"\r{step} - {date:%d/%m/%Y %H:%M}", end="", flush=True)
            if debug:
                st_n = self.step_fn.natural_state(self.state)
                split = "Chan2M3Kin" in st_n
                self._debug_dump(
                    os.path.join(settings.output_dir, f"Debug_out_{step}.txt"),
                    np.asarray(diag.get("ChanM3", st_n["ChanM3Kin"])),
                    st_n.get("Chan2M3Kin") if split else None,
                    st_n.get("CrossSection2Area") if split else None)
        if progress and not loud:
            print()
        self.state = self.step_fn.natural_state(self.state)
        self.close()
        return self.state


def lisfloodexe(settings):
    """Run orchestrator (reference main.py:56-157): pre-flight checkers,
    model build, then the deterministic run — or the MonteCarlo / EnKF
    ensemble when EnsMembers/FilterSteps are configured — honouring the
    -c/-i audit flags."""
    from ..config.checkers import check_modules_inputs, check_meteo_forcings

    flags = settings.flags
    check_modules_inputs(settings)
    check_meteo_forcings(settings)
    runner = LisfloodRunner(settings)

    if flags.get("checkfiles"):
        # -c: per-map statistics audit, no model run (zusatz.py:49-113)
        rows = runner.aux["loader"].check_rows
        print(f"{'Name':20s} {'File/Value':40s} {'nonMV':>10s} {'MV-in-mask':>10s} "
              f"{'min':>12s} {'mean':>12s} {'max':>12s}")
        for name, value, n, miss, vmin, vmean, vmax in rows:
            fmt = lambda v: f"{v:12.4g}" if isinstance(v, float) else f"{v:>12}"
            print(f"{name:20s} {value[-40:]:40s} {n!s:>10s} {miss!s:>10s} "
                  f"{fmt(vmin)} {fmt(vmean)} {fmt(vmax)}")
        return runner

    if flags.get("initonly"):
        print("initonly flag activated... Stopping now before entering time loop.")
        return runner

    # MonteCarlo/EnKF wrap is gated on the OPTIONS, not on EnsMembers —
    # templates carry EnsMembers=2 by default and the reference still runs
    # deterministically unless MonteCarlo/EnKF is switched on
    # (settings.py:404-410, main.py:98-115)
    init = settings.options.get("InitLisflood")
    mc_set = bool(settings.options.get("MonteCarlo")) and not init
    enkf_set = bool(settings.options.get("EnKF")) and not init
    if (mc_set or enkf_set) and settings.ens_members > 1:
        from .ensemble import run_from_settings
        run_from_settings(runner, settings)
    elif flags.get("loud") or flags.get("debug"):
        # per-step diagnostics need host visibility of every step
        runner.run(progress=not settings.flags.get("veryquiet"))
    else:
        # production path: chunks of steps execute as one device program
        # (reference runs its production DynamicFramework loop by default,
        # main.py:157; here the scanned driver is the production loop)
        runner.run_scanned(progress=not settings.flags.get("veryquiet"))
    return runner
