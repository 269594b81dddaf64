"""The jitted model step — assembly of all process kernels.

`build_step(config, params, aux)` converts parameters to device arrays and
returns a jitted pure function `step(state, forcing) -> (state, diag)`
reproducing the reference's per-timestep driver order exactly
(Lisflood_dynamic.py:38-268):

  meteo -> land use -> LAI -> [inflow] -> snow -> frost -> canopy ->
  soil columns -> open/sealed -> rice -> water abstraction -> per-pixel
  aggregation -> groundwater -> open-water evaporation -> surface routing
  -> sub-stepped channel routing -> water level -> water balance

Option flags are resolved at trace time (config is static), so each
configuration compiles to one specialized XLA executable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import physics as ph
from ..ops.routing_ops import channel_routing, surface_routing_step
from ..ops.physics import segment_spread

STATE_KEYS_BASE = [
    "SnowCoverS", "FrostIndex", "CumInterception", "CumInterSealed",
    "W1a", "W1b", "W2", "DSLR", "UZ", "LZ",
    "TotalPrecipitation", "TaCUM", "TaInterceptionCUM", "ESActCUM",
    "GwLossCUM", "LZInflowCUM",
    "ChanQKin", "ChanM3Kin", "ChanQ", "CumQ", "avgdis",
    "DischargeM3Out", "TotalQInM3", "sumDis", "sumInWB",
    "OFM3Other", "OFM3Forest", "OFM3Direct",
    "OFQDirect", "OFQOther", "OFQForest",
    "EvaCumM3", "PaddyRiceWaterAbstractionFromSurfaceWaterM3",
    "TimeSinceStart",
]


def uses_packed_state(cfg):
    """Whether the channel-routing state lives in schedule-packed position
    space ACROSS steps (pk$-prefixed state keys). Round-4 design: the
    per-step pack/unpack permutation gathers of continental state vectors
    were the single largest cost of the model step (profiled ~120 ms of a
    270 ms step); keeping the routing state packed makes them one-time.
    Natural-space views are emitted as diagnostics and DCE'd by XLA in the
    scanned production path unless outputs consume them."""
    return cfg.routing_kernel == "packed"


def packed_routing_keys(cfg):
    """State entries held packed (pk$-prefixed) when uses_packed_state."""
    keys = ["ChanQKin", "ChanM3Kin", "ChanQ", "CumQ", "avgdis",
            "DischargeM3Out", "sumDis"]
    if cfg.split_routing and not cfg.init_lisflood:
        keys += ["Chan2QKin", "Chan2M3Kin", "CrossSection2Area", "Sideflow1Chan"]
    if cfg.trans_loss:
        keys += ["TransCum"]
    if cfg.open_water_evapo:
        keys += ["EvaCumM3"]
    return keys


def state_keys(cfg):
    keys = list(STATE_KEYS_BASE)
    if cfg.split_routing and not cfg.init_lisflood:
        keys += ["Chan2QKin", "Chan2M3Kin", "CrossSection2Area", "Sideflow1Chan"]
    if cfg.simulate_lakes and not cfg.init_lisflood:
        keys += ["LakeStorageM3CC", "LakeInflowOldCC", "LakeOutflowCC",
                 "LakeStorageM3BalanceCC", "LakeLevelCC", "LakeStorageM3", "EWLakeCUMM3"]
    if cfg.simulate_reservoirs and not cfg.init_lisflood:
        keys += ["ReservoirStorageM3CC", "ReservoirFillCC", "ReservoirStorageM3"]
    if cfg.water_use:
        keys += ["ActualAccumulatedReUsedWaterM3", "IrriLossCUM", "wateruseCum",
                 "cumulated_CH_withdrawal"]
    if cfg.trans_loss:
        keys += ["TransCum"]
    if cfg.inflow:
        keys += ["QInM3Old"]
    if cfg.simulate_polders and not cfg.init_lisflood:
        keys += ["PolderStorageM3"]
    if cfg.rep_mbts:
        keys += ["WaterInit", "DischargeM3StructuresIni", "StorageStepINIT"]
    if cfg.indicator and cfg.water_use:
        from ..ops.indicators import indicator_keys
        keys += list(indicator_keys(cfg))
    if uses_packed_state(cfg):
        pk = set(packed_routing_keys(cfg))
        keys = ["pk$" + k if k in pk else k for k in keys]
    return keys


def build_routers(cfg, aux):
    """Kinematic-wave router objects for the channel and to-channel
    (overland) drainage schedules. `cfg.routing_kernel` selects the
    implementation: 'packed' (default, scatter-free windowed sweep) or
    'scan' (round-1 gather/scatter path, kept as reference)."""
    if cfg.routing_kernel == "packed":
        from ..ops.kinwave_packed import PackedRouter
        make = PackedRouter
    elif cfg.routing_kernel == "scan":
        from ..ops.kinwave import ScanRouter
        make = ScanRouter
    elif cfg.routing_kernel == "sharded":
        # subcatchment-partitioned sweep with explicit cut-edge exchange
        from ..ops.kinwave_sharded import ShardedRouter
        from ..parallel.partition import catchment_partition
        shard_of, stats = catchment_partition(aux["graph_kin"], cfg.num_shards)
        # the overland (to-channel) graph shares the pixel space; reuse the
        # same partition so both sweeps shard identically
        return {"kin": ShardedRouter(aux["graph_kin"], shard_of),
                "tochan": ShardedRouter(aux["graph_tochan"], shard_of),
                "shard_of": shard_of, "partition_stats": stats}
    else:
        raise ValueError(f"unknown routing_kernel {cfg.routing_kernel!r}")
    return {"kin": make(aux["schedule_kin"]), "tochan": make(aux["schedule_tochan"])}


def packed_routing_params(cfg, params_np, ps):
    """Host-side schedule-order reorder of the per-pixel params the
    channel-routing sub-step loop touches (consumed as p['kinp$...'] by
    ops/routing_ops.channel_routing when the packed router is active).
    Padding-slot fills are chosen so padded lanes are inert.

    Returns (params, feeders_earlier): the second element records whether
    every structure cell sits in a strictly later schedule chunk than ALL
    of its feeders — the staging discipline the diagonal-pipelined and
    pallas sub-step loops rely on (they stage feeder discharge after a
    chunk's t-loop). build_schedule's order_graph packing guarantees it
    for the single-shard packed schedule; shard-local schedules
    (routing_kernel='sharded') may not, and then only the sequential
    sub-step loop (which reads previous-sub-step ChanQ directly) is
    eligible."""
    out = {}
    feeders_earlier = [True]

    def pk(name, fill=0.0):
        out["kinp$" + name] = ps.pack_np(np.asarray(params_np[name], np.float64), fill)

    pk("ChanLength", 1.0)
    pk("ChannelAlpha", 1.0)
    out["kinp$IsChannelKinematic"] = ps.pack_np(
        np.asarray(params_np["IsChannelKinematic"], bool), False)
    # packed-space outlet mask for the DischargeM3Out accumulator
    # (routing_ops._post_routing_packed)
    out["kinp$AtLastPointC"] = ps.pack_np(
        np.asarray(params_np["AtLastPointC"], bool), False)
    if cfg.split_routing and not cfg.init_lisflood:
        pk("ChannelAlpha2", 1.0)
        pk("QLimit", 0.0)
        pk("M3Limit", np.inf)      # padded lanes never count as over-limit
        pk("Chan2M3Start", 0.0)
        pk("Chan2QStart", 0.0)
    if cfg.trans_loss:
        out["kinp$UpTrans"] = ps.pack_np(np.asarray(params_np["UpTrans"], bool), False)
        pk("TransPower1", 1.0)
        pk("TransPower2", 1.0)
        pk("TransSub", 0.0)
    if cfg.rep_mbts:
        # padding slots get a dedicated extra segment id so their sums
        # never pollute the real catchment totals
        out["kinp$Catchments"] = ps.pack_np(
            np.asarray(params_np["Catchments"], np.int32), cfg.num_catchments)
    # position-space downstruct for the lake/reservoir inflow lookup: built
    # from the ORIGINAL (pre-structure-cut) downstruct, not the cut routing
    # graph — the reference keeps LddStructuresKinematic for exactly this
    # (structures.py:43-61, lakes.py:215): the pixel upstream of a lake is a
    # routing pit but still delivers its discharge into the lake.
    P = ps.num_pixels
    p_pad = ps.p_pad
    downstruct = np.asarray(params_np["downstruct"], np.int64)   # (P,), P = pit
    down_pos = np.full(p_pad, p_pad, dtype=np.int32)
    real = ps.perm < P
    pix = ps.perm[real]
    tgt = downstruct[pix]
    has = tgt < P
    dp = np.full(pix.size, p_pad, np.int64)
    dp[has] = ps.inv_perm[tgt[has]]
    down_pos[np.flatnonzero(real)] = dp.astype(np.int32)
    out["kinp$down_pos"] = down_pos

    def ups_gather(struct_pix):
        """(n, 8) packed positions of each structure cell's immediate
        upstream pixels (by the pre-cut downstruct) + 0/1 weights — lets
        the sub-step loop compute structure inflow with an 8-wide gather
        instead of a full-vector segment-sum (reference lakes.py:215 is
        np.bincount(downstruct, ChanQ)[LakeIndex]; a lake has at most 8
        LDD neighbours)."""
        n = len(struct_pix)
        idx = np.zeros((n, 8), np.int32)
        w = np.zeros((n, 8), np.float64)
        for i, pix in enumerate(np.asarray(struct_pix, np.int64)):
            ups = np.flatnonzero(downstruct == pix)
            assert ups.size <= 8, f"structure cell {pix} has {ups.size} upstreams"
            pos = ps.inv_perm[ups]
            if not (pos // ps.chunk < ps.inv_perm[pix] // ps.chunk).all():
                feeders_earlier[0] = False
            idx[i, :pos.size] = pos
            w[i, :pos.size] = 1.0
        return idx, w

    if cfg.simulate_lakes and not cfg.init_lisflood:
        out["kinp$LakePos"] = ps.inv_perm[np.asarray(params_np["LakeIndex"], np.int64)].astype(np.int32)
        out["kinp$LakeUpsIdx"], out["kinp$LakeUpsW"] = ups_gather(params_np["LakeIndex"])
    if cfg.simulate_reservoirs and not cfg.init_lisflood:
        out["kinp$ResPos"] = ps.inv_perm[np.asarray(params_np["ReservoirIndex"], np.int64)].astype(np.int32)
        out["kinp$ResUpsIdx"], out["kinp$ResUpsW"] = ups_gather(params_np["ReservoirIndex"])

    # open-water evaporation chain as an in-kernel wavefront (the eva
    # graph's edges are a subset of the PRE-CUT channel graph the schedule
    # was chunked against, so they fit the same W-chunk windows): local
    # window offsets like ps.down_local, W*C sentinel = no transfer
    eva_window_ok = False
    if cfg.open_water_evapo and "downEva" in params_np:
        down_eva = np.asarray(params_np["downEva"], np.int64)      # (P,), P = pit
        sentinel = ps.window * ps.chunk
        eva_dl = np.full(ps.p_pad, sentinel, dtype=np.int32)
        pos = np.flatnonzero(real)
        tgt = down_eva[pix]
        has_t = tgt < P
        tgt_pos = ps.inv_perm[tgt[has_t]]
        src_chunk = pos[has_t] // ps.chunk
        delta = tgt_pos // ps.chunk - src_chunk
        if has_t.any() and delta.size and 1 <= delta.min() and delta.max() <= ps.window:
            local = tgt_pos - (src_chunk + 1) * ps.chunk
            eva_dl[pos[has_t]] = local.astype(np.int32)
            out["kinp$EvaDownLocal"] = eva_dl
            eva_window_ok = True
        elif not has_t.any():
            out["kinp$EvaDownLocal"] = eva_dl
            eva_window_ok = True
    return out, feeders_earlier[0], eva_window_ok


def prepare_state(cfg, routers, state):
    """Convert a natural-space state dict into the step function's state
    contract: when uses_packed_state, routing entries move to pk$-prefixed
    schedule-packed arrays (host- or device-side)."""
    if not uses_packed_state(cfg) or "pk$ChanQKin" in state:
        return dict(state)
    kin = routers["kin"]
    out = {}
    pkeys = set(packed_routing_keys(cfg))
    for k, v in state.items():
        if k in pkeys:
            if isinstance(v, np.ndarray):
                out["pk$" + k] = kin.ps.pack_np(np.asarray(v, np.float64))
            else:
                out["pk$" + k] = kin.pack(v)
        else:
            out[k] = v
    return out


def natural_state(cfg, routers, state):
    """Inverse of prepare_state: unpack pk$ entries back to natural-space
    names (padding slots dropped); other entries pass through."""
    if not any(str(k).startswith("pk$") for k in state):
        return dict(state)
    kin = routers["kin"]
    inv = np.asarray(kin.ps.inv_perm)
    out = {}
    for k, v in state.items():
        if str(k).startswith("pk$"):
            if isinstance(v, np.ndarray):
                out[k[3:]] = np.asarray(v)[..., inv]
            else:
                out[k[3:]] = kin.unpack(v)
        else:
            out[k] = v
    return out


def build_step(cfg, params_np, aux, dtype=jnp.float64):
    """Returns (step_fn, device_params). step_fn is jitted over (state, forcing)."""
    p = {}
    for k, v in params_np.items():
        if isinstance(v, (int, float, np.floating, np.integer)):
            p[k] = float(v) if not isinstance(v, (int, np.integer)) else v
        elif isinstance(v, np.ndarray) and v.dtype.kind in "fb":
            p[k] = jnp.asarray(v, dtype if v.dtype.kind == "f" else None)
        else:
            p[k] = jnp.asarray(v)

    routers = build_routers(cfg, aux)
    if hasattr(routers["kin"], "ps"):
        kinp, feeders_earlier, eva_window_ok = packed_routing_params(
            cfg, params_np, routers["kin"].ps)
        routers["kin"].struct_feeders_earlier = feeders_earlier
        routers["kin"].eva_window_ok = eva_window_ok
        for k, v in kinp.items():
            p[k] = jnp.asarray(v, dtype if v.dtype.kind == "f" else None)
    ncatch = cfg.num_catchments

    # Array params are passed as a jit ARGUMENT (not closed over):
    # closed-over arrays become embedded HLO constants, which at
    # continental scale (GB of parameters) makes tracing/compilation take
    # minutes and bloats the executable. Scalar params stay closed over —
    # they specialize the compilation like the option flags do.
    p_scalars = {k: v for k, v in p.items() if not isinstance(v, jax.Array)}
    p_arrays = {k: v for k, v in p.items() if isinstance(v, jax.Array)}

    packed_state = uses_packed_state(cfg)
    from ..ops.routing_ops import pallas_eva_active
    pallas_eva = pallas_eva_active(cfg, routers, dtype)

    def step_impl(pa, s, f):
        p = {**p_scalars, **pa}
        catchtotal = lambda x: segment_spread(x, p["Catchments"], ncatch)
        d = dict(f)  # diagnostics namespace, seeded with forcing
        d["TimeSinceStart"] = s["TimeSinceStart"] + 1.0
        # natural-space view of packed routing state, for the option-gated
        # consumers below (one permutation gather, CSE'd across uses)
        s_nat = (lambda key: routers["kin"].unpack(s["pk$" + key])) \
            if packed_state else (lambda key: s[key])

        # transient land-use change (landusechange.py:94-148): per-step
        # fraction stacks arrive as forcing and override the init-time
        # parameter entries for everything downstream in this step
        if cfg.transient_landuse:
            for k in ("ForestFraction", "DirectRunoffFraction", "WaterFraction",
                      "IrrigationFraction", "RiceFraction", "OtherFraction"):
                p[k] = f[k + "_t"]
            p["SoilFraction"] = jnp.stack([
                p["OtherFraction"] + p["RiceFraction"],
                p["ForestFraction"], p["IrrigationFraction"]])
            p["PermeableFraction"] = 1 - p["DirectRunoffFraction"] - p["WaterFraction"]

        # meteo scaling (readmeteo.py:44-81)
        d["Precipitation"] = f["Precipitation"] * cfg.dt_day * p["PrScaling"]
        tavg = f["Tavg"]
        if cfg.temperature_in_kelvin:
            tavg = tavg - 273.15
        d["Tavg"] = tavg
        d["ETRef"] = f["ETRef"] * cfg.dt_day * p["CalEvaporation"]
        d["EWRef"] = f["EWRef"] * cfg.dt_day * p["CalEvaporation"]
        d["ESRef"] = (d["EWRef"] + d["ETRef"]) / 2

        # LAI selection (leafarea.py:76-90)
        d["LAI"] = p["LAIX"][f["LAIInterval"]]

        # inflow hydrographs (inflow.py:98-127): QInM3 read host-side
        if cfg.inflow:
            d["QInM3"] = f["QInM3"]
            d["QInM3OldLoop"] = s["QInM3Old"]   # previous step's inflow, used in substeps
            d["QInM3Old"] = f["QInM3"]          # becomes old for next step
            d["QDelta"] = (f["QInM3"] - s["QInM3Old"]) / cfg.no_rout_steps
            d["TotalQInM3"] = s["TotalQInM3"] + f["QInM3"]

        # variable water fraction (evapowater.py:96-121)
        d.update(ph.evapowater_init_step(cfg, p, s, d))

        # snow + frost
        d.update(ph.snow_step(cfg, p, s, d))
        d.update(ph.frost_step(cfg, p, s, d))

        # canopy: interception, ET, transpiration
        d.update(ph.canopy_step(cfg, p, s, d))
        # soil columns
        soil_in = dict(s)
        soil_in["W1a"], soil_in["W1b"] = d["W1a"], d["W1b"]
        d.update(ph.soil_columns_step(cfg, p, soil_in, d))
        # optional pF soil-suction diagnostics (soilloop.py:673-704)
        if cfg.simulate_pf:
            d.update(ph.pf_step(cfg, p, d))
        # open water and sealed surfaces
        d.update(ph.opensealed_step(cfg, p, s, d))
        # rice irrigation + water abstraction
        if cfg.rice_irrigation:
            d.update(ph.rice_irrigation_step(cfg, p, s, d))
        else:
            d["PaddyRiceWaterAbstractionFromSurfaceWaterM3"] = jnp.zeros_like(d["Rain"])
        if cfg.water_use:
            wa_state = dict(s)
            wa_state["ChanM3Kin"] = s_nat("ChanM3Kin")
            d["ChanM3Kin"] = wa_state["ChanM3Kin"]
            d["ChanQ"] = s_nat("ChanQ")
            d.update(ph.water_abstraction_step(cfg, p, wa_state, d))
            if cfg.groundwater_smooth:
                from ..ops.indicators import groundwater_smooth
                d["LZ"] = groundwater_smooth(
                    cfg, p, d["LZ"], p["LandRows"], p["LandCols"],
                    cfg.grid_rows, cfg.grid_cols)
        # per-pixel aggregation + groundwater
        d.update(ph.soil_perpixel_step(cfg, p, s, d))
        d.update(ph.groundwater_step(cfg, p, s, d))

        if cfg.init_lisflood_without_split:
            new_state = _collect_state(cfg, s, d)
            return new_state, d

        # open water evaporation
        if cfg.open_water_evapo:
            if pallas_eva:
                # the chain runs INSIDE the Mosaic routing kernel
                # (ops/kinwave_pallas.py eva phase): hand it the own-pixel
                # potential evaporation; outputs come back from routing
                d["EvaUpstream0"] = d["EWRef"] * p["MMtoM3"] * d["WaterFraction"]
            else:
                eva_d = dict(d)
                eva_d["ChanM3Kin"] = s_nat("ChanM3Kin")
                s_eva = dict(s)
                if packed_state:
                    s_eva["EvaCumM3"] = routers["kin"].unpack(s["pk$EvaCumM3"])
                out_eva = ph.evapowater_step(cfg, p, s_eva, eva_d)
                if packed_state:
                    out_eva["pk$EvaCumM3"] = (
                        s["pk$EvaCumM3"] + routers["kin"].pack(out_eva["EvaAddM3"]))
                d.update(out_eva)

        # surface routing
        d.update(surface_routing_step(cfg, p, s, d, routers))

        # channel routing substeps (incl. lakes/reservoirs/transmission)
        route_state = dict(s)
        for k in ("LakeStorageM3CC", "ReservoirStorageM3CC", "LakeStorageM3", "ReservoirStorageM3"):
            if k in d:
                route_state[k] = d[k]
        d.update(channel_routing(cfg, p, route_state, d, routers))

        # water level diagnostic
        if cfg.simulate_water_levels:
            d.update(ph.waterlevel_step(cfg, p, s, d))

        # polder level diagnostic — the reference's dynamic polder parts are
        # a no-op skeleton (polder.py:72-177), so storage passes through
        if cfg.simulate_polders and not cfg.init_lisflood:
            d["PolderLevel"] = jnp.where(
                p["IsPolder"], s["PolderStorageM3"] / jnp.maximum(p["PolderArea"], 1e-30), 0.0)

        # total water storage / mass balance (waterbalance.py:114-288)
        if cfg.rep_total_water_storage or cfg.rep_mbts:
            d.update(_waterbalance(cfg, p, s, d, catchtotal))

        # water-security indicators (indicatorcalc.py:80-235)
        if cfg.indicator and cfg.water_use:
            from ..ops.indicators import indicator_keys, indicator_step, indicator_state_zero
            from ..graph.ldd import FlowGraph  # noqa: F401 (doc reference)
            month_dis = s["MonthDisM3"] + d["ChanQAvg"] * cfg.dt_sec
            d["UpstreamSumMonthDis"] = ph.scatter_to_downstream(
                month_dis, p["downstruct"], cfg.num_pixels)
            d.update(indicator_step(cfg, p, s, d))
            # reset monthly accumulators at month end (Lisflood_dynamic:266-268)
            zeros = indicator_state_zero(cfg, cfg.num_pixels, d["Rain"].dtype)
            monthend = f["MonthEnd"]
            for k in indicator_keys(cfg):
                d[k] = jnp.where(monthend, zeros[k], d[k])

        new_state = _collect_state(cfg, s, d)
        return new_state, d

    jitted = jax.jit(step_impl)

    def step(s, f):
        return jitted(p_arrays, s, f)

    step.impl = step_impl   # array-params-explicit form for scan/vmap composition
    step.params = p
    step.params_arrays = p_arrays
    step.routers = routers
    step.prepare_state = lambda st: prepare_state(cfg, routers, st)
    step.natural_state = lambda st: natural_state(cfg, routers, st)
    return step, p


def build_multi_step(cfg, params_np, aux, output_keys=(), dtype=jnp.float64):
    """Scanned multi-step runner: `multi(state, forcing_stack) -> (state,
    outputs)` where every forcing entry carries a leading time axis and
    `outputs` contains only `output_keys`, stacked over time.

    This is the production data path on TPU: a chunk of steps runs as one
    device program, amortizing host<->device latency (the per-step driver
    pays a full tunnel round trip per step), and letting XLA overlap the
    routing scan with the next step's column physics."""
    step_fn, p = build_step(cfg, params_np, aux, dtype)
    output_keys = tuple(output_keys)

    def multi_impl(pa, state, forcing_stack):
        def body(s, f):
            s2, d = step_fn.impl(pa, s, f)
            return s2, {k: d[k] for k in output_keys}
        return jax.lax.scan(body, state, forcing_stack)

    jitted = jax.jit(multi_impl)

    def multi(state, forcing_stack):
        return jitted(step_fn.params_arrays, state, forcing_stack)

    multi.impl = multi_impl
    multi.params = p
    multi.params_arrays = step_fn.params_arrays
    multi.routers = step_fn.routers
    multi.prepare_state = step_fn.prepare_state
    multi.natural_state = step_fn.natural_state
    return multi, p


def _collect_state(cfg, s, d):
    new_state = {}
    for k in state_keys(cfg):
        new_state[k] = d.get(k, s[k])
    new_state["TimeSinceStart"] = d["TimeSinceStart"]
    return new_state


def _storage_channel(cfg, p, s, d):
    """waterbalance.py:114-122."""
    stored = d["ChanM3"]
    if cfg.simulate_lakes:
        stored = stored + d["LakeStorageM3Balance"]
    if cfg.simulate_reservoirs:
        stored = stored + d["ReservoirStorageM3"]
    if cfg.simulate_polders and not cfg.init_lisflood:
        stored = stored + d.get("PolderStorageM3", s["PolderStorageM3"])
    return stored


def _storage_hillslope(cfg, p, s, d):
    """waterbalance.py:124-128."""
    hill1 = d["LZ"] + (p["SoilFraction"] * (d["CumInterception"] + d["W1a"] + d["W1b"] + d["W2"] + d["UZ"])).sum(0)
    hillslope_mm = d["WaterDepth"] + d["SnowCover"] + hill1 + d["DirectRunoffFraction"] * d["CumInterSealed"]
    return hillslope_mm * p["MMtoM3"]


def _waterbalance(cfg, p, s, d, catchtotal):
    out = {}
    channel_stored = _storage_channel(cfg, p, s, d)
    hillslope_stored = _storage_hillslope(cfg, p, s, d)
    if cfg.rep_total_water_storage:
        out["TotalWaterStorageMM"] = (channel_stored + hillslope_stored) * p["M3toMM"]
    if cfg.rep_mbts and not cfg.init_lisflood:
        sum_in = jnp.where(jnp.isnan(s["sumInWB"]), 0.0, s["sumInWB"])
        water_in = catchtotal(sum_in) + catchtotal(d["TotalPrecipitationWB"] * p["MMtoM3"])
        water_stored = catchtotal(channel_stored) + catchtotal(hillslope_stored)
        hillslope_out = (d["TaWB"] + d["TaInterceptionWB"] + d["ESActWB"] + d["GwLossWB"]) * p["MMtoM3"]
        sum1 = jnp.where(p["AtLastPointC"], d["ChanQAvg"], 0.0)
        water_out = catchtotal(sum1 * cfg.dt_sec) + catchtotal(hillslope_out)
        if cfg.simulate_lakes:
            water_out = water_out + catchtotal(s["EWLakeCUMM3"] * 0.0)  # EWLakeWBM3 never updated (ref quirk)
        if cfg.open_water_evapo:
            water_out = water_out + catchtotal(d["EvaWBM3"])
        if cfg.trans_loss:
            water_out = water_out + catchtotal(d["TransCum"])
        if cfg.water_use:
            water_out = water_out + catchtotal(d["IrriLossCUM"]) + catchtotal(d["wateruseCum"])
        dis_stru = jnp.where(p["IsUpsOfStructureKinematicC"], d["ChanQ"] * cfg.dt_routing, 0)
        dis_structures = catchtotal(dis_stru)
        if cfg.simulate_lakes:
            dis_lake = jnp.zeros_like(d["Rain"]).at[p["LakeIndex"]].set(0.5 * d["LakeInflowCC"] * cfg.dt_routing)
            dis_structures = dis_structures + catchtotal(dis_lake)
        dis_structures = dis_structures - s["DischargeM3StructuresIni"]
        mb_error = s["WaterInit"] + water_in - water_stored - water_out - dis_structures
        out["MB_WaterInit"] = s["WaterInit"]
        out["MB_WaterIn"] = water_in
        out["MB_WaterStored"] = water_stored
        out["MB_WaterOut"] = water_out
        out["MB_DisStructures"] = dis_structures
        out["MB_ChannelStored"] = catchtotal(channel_stored)
        out["MB_HillslopeStored"] = catchtotal(hillslope_stored)
        out["MBError"] = mb_error
        out["MBErrorMM"] = 1000.0 * mb_error / p["CatchArea"]
        if cfg.transient_landuse:
            # next step starts from the NEXT land-use fractions, so WaterInit
            # must be the hillslope storage re-priced with them
            # (waterbalance.py:186-271 when DynamicLandCoverDelta > 0; with no
            # change next == current, so this is always safe)
            p_next = dict(p)
            p_next["SoilFraction"] = jnp.stack([
                d["OtherFraction_nt"] + d["RiceFraction_nt"],
                d["ForestFraction_nt"], d["IrrigationFraction_nt"]])
            d_next = dict(d)
            d_next["DirectRunoffFraction"] = d["DirectRunoffFraction_nt"]
            hillslope_next = _storage_hillslope(cfg, p_next, s, d_next)
            water_stored_next = catchtotal(channel_stored) + catchtotal(hillslope_next)
            out["WaterInit"] = water_stored_next + dis_structures
        else:
            out["WaterInit"] = water_stored + dis_structures
        # mass-balance analysis diagnostics (waterbalance.py:276-289); with
        # transient land use the reference evaluates these AFTER reassigning
        # the fractions to the next-step values (waterbalance.py:186-199)
        if cfg.transient_landuse:
            sum_fracs = (d["ForestFraction_nt"] + d["DirectRunoffFraction_nt"]
                         + d["WaterFraction_nt"] + d["IrrigationFraction_nt"]
                         + d["OtherFraction_nt"])
        else:
            sum_fracs = (p["ForestFraction"] + p["DirectRunoffFraction"] + p["WaterFraction"]
                         + p["IrrigationFraction"] + p["OtherFraction"])
        npix = catchtotal(jnp.ones_like(sum_fracs))
        out["AverageFractions"] = catchtotal(sum_fracs) / npix
        out["MBErrorStorage"] = mb_error / out["WaterInit"]
    return out
