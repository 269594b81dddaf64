"""Channel routing step: surface runoff routing, the sub-stepped channel
kinematic wave with lakes / reservoirs / transmission-loss / sideflow
assembly, and split (floodplain) routing.

Reproduces surface_routing.py:115-213, routing.py:435-706,
lakes.py:199-298, reservoir.py:173-323, transmission.py:67-89,
Lisflood_dynamic.py:176-230. The NoRoutSteps sub-step loop is a
`lax.scan`; the kinematic wave itself is the wavefront scan in
ops/kinwave.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .physics import scatter_to_downstream, segment_spread


def surface_routing_step(cfg, p, s, d, routers):
    """Overland kinematic wave for 3 runoff lanes (surface_routing.py:115-213)."""
    soil_frac = p["SoilFraction"]
    surface_run_soil = soil_frac * jnp.maximum(d["AvailableWaterForInfiltration"] - d["Infiltration"], 0)
    surface_runoff = d["DirectRunoff"] + surface_run_soil.sum(0)
    total_runoff = surface_runoff + d["UZOutflowPixel"] + d["LZOutflowToChannelPixel"]

    mmto_m3 = p["MMtoM3"]
    inv_pl = 1.0 / p["PixelLength"]
    inv_dt = 1.0 / cfg.dt_sec
    sideflow_direct = d["DirectRunoff"] * mmto_m3 * inv_pl * inv_dt
    sideflow_other = (surface_run_soil[0] + surface_run_soil[2]) * mmto_m3 * inv_pl * inv_dt
    sideflow_forest = surface_run_soil[1] * mmto_m3 * inv_pl * inv_dt

    beta = p["Beta"]
    # OFAlpha lanes [Other, Forest, Direct]; a_dx_div_dt = alpha * dx / dt
    dx = p["PixelLength"]
    adx = p["OFAlpha"] * dx / cfg.dt_sec
    # route all 3 overland lanes in one batched wavefront sweep
    q0 = jnp.stack([s["OFQOther"], s["OFQForest"], s["OFQDirect"]])
    lat = jnp.stack([sideflow_other, sideflow_forest, sideflow_direct]) * dx
    q_lanes = routers["tochan"].route_batched(q0, lat, adx, beta)
    of_q_other, of_q_forest, of_q_direct = q_lanes[0], q_lanes[1], q_lanes[2]

    of_m3_direct = dx * p["OFAlpha"][2] * of_q_direct**beta
    of_m3_other = dx * p["OFAlpha"][0] * of_q_other**beta
    of_m3_forest = dx * p["OFAlpha"][1] * of_q_forest**beta
    q_all = of_q_direct + of_q_other + of_q_forest
    m3_all = of_m3_direct + of_m3_other + of_m3_forest
    of_to_chan = jnp.where(p["IsChannel"], q_all * cfg.dt_sec, 0)
    to_chan_runoff = (d["UZOutflowPixel"] + d["LZOutflowToChannelPixel"]) * mmto_m3 + of_to_chan
    return {
        "SurfaceRunSoil": surface_run_soil,
        "SurfaceRunoff": surface_runoff,
        "TotalRunoff": total_runoff,
        "OFQDirect": of_q_direct, "OFQOther": of_q_other, "OFQForest": of_q_forest,
        "OFM3Direct": of_m3_direct, "OFM3Other": of_m3_other, "OFM3Forest": of_m3_forest,
        "Qall": q_all, "M3all": m3_all,
        "OFToChanM3": of_to_chan,
        "WaterDepth": m3_all * p["M3toMM"],
        "ToChanM3Runoff": to_chan_runoff,
        "ToChanM3RunoffDt": to_chan_runoff / cfg.no_rout_steps,
    }


def _lake_substep(cfg, p, carry, inflow_cc, lake_idx, N, dtype):
    """Modified Puls lake routing (lakes.py:199-263). Operates in "routing
    space": natural pixel space or schedule-packed position space; the
    caller supplies the lake inflow and index vectors for that space."""
    updates, q_out_m3 = _lake_substep_cc(cfg, p, carry, inflow_cc)
    q_lake_out = jnp.zeros(N, dtype).at[lake_idx].set(q_out_m3)
    return updates, q_lake_out


def _lake_substep_cc(cfg, p, carry, inflow_cc):
    """Per-lake (compressed) form: returns (state updates, q_out_m3)."""
    lake_in = (inflow_cc + carry["LakeInflowOldCC"]) * 0.5
    si = carry["LakeStorageM3CC"] / cfg.dt_routing - 0.5 * carry["LakeOutflowCC"] + lake_in
    outflow_cc = jnp.square(-p["LakeFactor"] + jnp.sqrt(p["LakeFactorSqr"] + 2 * si))
    q_out_m3 = outflow_cc * cfg.dt_routing
    storage = (si - outflow_cc * 0.5) * cfg.dt_routing
    storage = jnp.where(jnp.isnan(storage) | (storage < 0), 0.0, storage)
    balance = carry["LakeStorageM3BalanceCC"] + lake_in * cfg.dt_routing - q_out_m3
    level = storage / p["LakeAreaCC"]
    updates = {
        "LakeInflowOldCC": inflow_cc,
        "LakeInflowCC": inflow_cc,
        "LakeOutflowCC": outflow_cc,
        "LakeStorageM3CC": storage,
        "LakeStorageM3BalanceCC": balance,
        "LakeLevelCC": level,
        "sumLakeInCC": carry["sumLakeInCC"] + inflow_cc * cfg.dt_routing,
        "sumLakeOutCC": carry["sumLakeOutCC"] + q_out_m3,
    }
    return updates, q_out_m3


def _reservoir_substep(cfg, p, carry, inflow_cc, res_idx, N, dtype):
    """Rule-curve reservoir operation (reservoir.py:173-303); routing-space
    generic like _lake_substep."""
    updates, q_out_m3 = _reservoir_substep_cc(cfg, p, carry, inflow_cc)
    q_res_out = jnp.zeros(N, dtype).at[res_idx].set(q_out_m3)
    return updates, q_res_out


def _reservoir_substep_cc(cfg, p, carry, inflow_cc):
    """Per-reservoir (compressed) form: returns (state updates, q_out_m3)."""
    inv_day = 1.0 / 86400.0
    q_in_m3 = inflow_cc * cfg.dt_routing
    storage = carry["ReservoirStorageM3CC"] + q_in_m3
    total = p["TotalReservoirStorageM3CC"]
    fill = storage / total
    o1 = jnp.minimum(p["MinReservoirOutflowCC"], storage * inv_day)
    o2 = p["MinReservoirOutflowCC"] + p["DeltaO"] * (fill - 2 * p["ConservativeStorageLimitCC"]) / p["DeltaLN"]
    o3a = p["NormalReservoirOutflowCC"]
    o3b = p["NormalReservoirOutflowCC"] + ((fill - p["Normal_FloodStorageLimitCC"]) / p["DeltaNFL"]) * (
        p["NonDamagingReservoirOutflowCC"] - p["NormalReservoirOutflowCC"])
    temp4 = jnp.minimum(p["NonDamagingReservoirOutflowCC"],
                        jnp.maximum(inflow_cc * 1.2, p["NormalReservoirOutflowCC"]))
    o4 = jnp.maximum((fill - p["FloodStorageLimitCC"] - 0.01) * total * inv_day, temp4)
    outflow = o1
    outflow = jnp.where(fill > 2 * p["ConservativeStorageLimitCC"], o2, outflow)
    outflow = jnp.where(fill > p["NormalStorageLimitCC"], o3a, outflow)
    outflow = jnp.where(fill > p["Normal_FloodStorageLimitCC"], o3b, outflow)
    outflow = jnp.where(fill > p["FloodStorageLimitCC"], o4, outflow)
    temp = jnp.minimum(outflow, jnp.maximum(inflow_cc, p["NormalReservoirOutflowCC"]))
    outflow = jnp.where((outflow > 1.2 * inflow_cc) & (outflow > p["NormalReservoirOutflowCC"]) &
                        (fill < p["FloodStorageLimitCC"]), temp, outflow)
    q_out_m3 = outflow * cfg.dt_routing
    q_out_m3 = jnp.minimum(q_out_m3, storage)
    q_out_m3 = jnp.maximum(q_out_m3, storage - total)
    storage = storage - q_out_m3
    fill = storage / total
    fill = jnp.where(jnp.isnan(fill) | (fill < 0), 0.0, fill)
    updates = {
        "ReservoirStorageM3CC": storage,
        "ReservoirFillCC": fill,
        "sumResInCC": carry["sumResInCC"] + q_in_m3,
        "sumResOutCC": carry["sumResOutCC"] + q_out_m3,
    }
    return updates, q_out_m3


def resolve_pipeline(cfg, routers, dtype):
    """Static (trace-time) sub-step pipeline resolution, shared by
    channel_routing and the step assembly (models/step.py consults it to
    decide whether the Mosaic kernel also absorbs the open-water
    evaporation chain). 'auto' picks the fastest equivalence-gated path:
    the fused Mosaic kernel when it applies (float32 — Mosaic has no f64,
    and a Precision=double run must not silently degrade — on a real TPU;
    interpret mode is only for explicit RoutingPipeline=pallas testing),
    else the wavefront-pipelined diagonal loop, else the sequential
    sub-step scan."""
    kin = routers["kin"]
    packed = hasattr(kin, "route_packed") and hasattr(kin, "ps")
    structs = ((cfg.simulate_lakes or cfg.simulate_reservoirs)
               and not cfg.init_lisflood)
    pipelineable = (packed and cfg.no_rout_steps > 1
                    and not getattr(kin, "no_edges", True)
                    and getattr(kin.ps, "n_shards", 1) == 1
                    and (not structs
                         or getattr(kin, "struct_feeders_earlier", False)))
    can_pallas = pipelineable and dtype == jnp.float32
    pipeline = cfg.routing_pipeline
    if pipeline == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        pipeline = ("pallas" if can_pallas and on_tpu
                    else ("diagonal" if pipelineable else "substeps"))
    if pipeline == "pallas" and can_pallas:
        return "pallas"
    if pipeline in ("diagonal", "pallas") and pipelineable:
        return "diagonal"
    return "substeps"


def pallas_eva_active(cfg, routers, dtype):
    """Whether the open-water evaporation chain runs INSIDE the Mosaic
    sub-step kernel (its downstream transfers ride the kernel's chunk
    windows instead of full-grid segment-sum scatters — profiled ~42
    ms/step at continental scale). Requires the eva graph's edges to fit
    the schedule windows (models/step.packed_routing_params checks)."""
    return (cfg.open_water_evapo and not cfg.init_lisflood
            and resolve_pipeline(cfg, routers, dtype) == "pallas"
            and getattr(routers["kin"], "eva_window_ok", False))


def channel_routing(cfg, p, s, d, routers):
    """The NoRoutSteps sub-step loop (Lisflood_dynamic.py:176-230 +
    routing.py:435-706) as a lax.scan; returns end-of-step state and
    diagnostics.

    With the packed router the WHOLE sub-step loop runs in schedule-packed
    position space, and with uses_packed_state (models/step.py) the routing
    state ALSO stays packed ACROSS steps ('pk$' state keys): the per-step
    permutation gathers of continental state vectors — profiled as the
    single largest cost of the round-3 step — happen once at init, and the
    natural-space views emitted for diagnostics are DCE'd by XLA in the
    scanned production path unless an output consumes them. The
    lake/reservoir/downstream indices are the precomputed position-space
    ones (params prefixed 'kinp$', built host-side in models/step.py).
    The natural-space path (ScanRouter) is the identity mapping."""
    P = cfg.num_pixels
    packed_state = "pk$ChanQKin" in s
    dtype = (s["pk$ChanQKin"] if packed_state else s["ChanQKin"]).dtype
    kin = routers["kin"]
    packed = "kinp$ChanLength" in p and hasattr(kin, "route_packed")
    pipeline = resolve_pipeline(cfg, routers, dtype)
    if pipeline == "pallas":
        return channel_routing_pallas(cfg, p, s, d, routers)
    if pipeline == "diagonal":
        return channel_routing_pipelined(cfg, p, s, d, routers)
    if packed:
        pk = lambda name: p["kinp$" + name]
        pack = kin.pack
        unpack = kin.unpack
        N = kin.ps.p_pad
        down_idx = pk("down_pos")
        route_b = lambda q, lat, adx, beta: kin.route_packed(q, lat, adx, beta)
    else:
        pk = lambda name: p[name]
        pack = lambda x, fill=0.0: x
        unpack = lambda x: x
        N = P
        down_idx = p["downstruct"]
        route_b = lambda q, lat, adx, beta: kin.route_batched(q, lat, adx, beta)

    beta = p["Beta"]
    dx = pk("ChanLength")
    inv_dx = 1.0 / dx
    adx1 = pk("ChannelAlpha") * dx / cfg.dt_routing
    inv_alpha1 = 1.0 / pk("ChannelAlpha")
    if cfg.split_routing and not cfg.init_lisflood:
        adx2 = pk("ChannelAlpha2") * dx / cfg.dt_routing
        inv_alpha2 = 1.0 / pk("ChannelAlpha2")

    # per-step inputs consumed inside the sub-step loop, in routing space
    din = {"ToChanM3RunoffDt": pack(d["ToChanM3RunoffDt"])}
    if cfg.open_water_evapo:
        din["EvaAddM3Dt"] = pack(d["EvaAddM3Dt"])
    if cfg.water_use:
        din["withdrawal_CH_actual_M3_routStep"] = pack(d["withdrawal_CH_actual_M3_routStep"])
        din["returnflow_GwAbs2Channel_M3_routStep"] = pack(d["returnflow_GwAbs2Channel_M3_routStep"])
    if cfg.inflow:
        din["QInM3OldLoop"] = pack(d["QInM3OldLoop"])
        din["QDelta"] = pack(d["QDelta"])

    # routing-space state access: already-packed pk$ entries, or a per-step
    # pack of the natural entries (scan/sharded kernels)
    spk = (lambda k: s["pk$" + k]) if packed_state else (lambda k: pack(s[k]))

    zero = jnp.zeros(N, dtype)
    carry = {
        "ChanQKin": spk("ChanQKin"),
        "ChanM3Kin": spk("ChanM3Kin"),
        "ChanQ": spk("ChanQ"),
        "sumDisDay": zero,
    }
    if cfg.split_routing and not cfg.init_lisflood:
        carry.update({
            "Chan2QKin": spk("Chan2QKin"),
            "Chan2M3Kin": spk("Chan2M3Kin"),
            "CrossSection2Area": spk("CrossSection2Area"),
            "Sideflow1Chan": spk("Sideflow1Chan"),
        })
    if cfg.simulate_lakes and not cfg.init_lisflood:
        lake_idx = pk("LakePos") if packed else p["LakeIndex"]
        if packed:
            # structure inflow = sum over its <=8 upstream neighbours — an
            # 8-wide gather instead of a full-vector segment-sum per substep
            lake_inflow = lambda q: (q[pk("LakeUpsIdx")] * pk("LakeUpsW")).sum(1)
        else:
            lake_inflow = lambda q: scatter_to_downstream(q, down_idx, N)[lake_idx]
        carry.update({
            "LakeStorageM3CC": s["LakeStorageM3CC"],
            "LakeInflowOldCC": s["LakeInflowOldCC"],
            "LakeInflowCC": jnp.zeros(cfg.num_lakes, dtype),
            "LakeOutflowCC": s["LakeOutflowCC"],
            "LakeStorageM3BalanceCC": s["LakeStorageM3BalanceCC"],
            "LakeLevelCC": s["LakeLevelCC"],
            "sumLakeInCC": jnp.zeros(cfg.num_lakes, dtype),
            "sumLakeOutCC": jnp.zeros(cfg.num_lakes, dtype),
        })
    if cfg.simulate_reservoirs and not cfg.init_lisflood:
        res_idx = pk("ResPos") if packed else p["ReservoirIndex"]
        if packed:
            res_inflow = lambda q: (q[pk("ResUpsIdx")] * pk("ResUpsW")).sum(1)
        else:
            res_inflow = lambda q: scatter_to_downstream(q, down_idx, N)[res_idx]
        carry.update({
            "ReservoirStorageM3CC": s["ReservoirStorageM3CC"],
            "ReservoirFillCC": s["ReservoirFillCC"],
            "sumResInCC": jnp.zeros(cfg.num_reservoirs, dtype),
            "sumResOutCC": jnp.zeros(cfg.num_reservoirs, dtype),
        })
    if cfg.trans_loss:
        carry["TransCum"] = spk("TransCum")
    if cfg.rep_mbts:
        carry["AddedTRUN"] = zero
    if cfg.inflow:
        carry["QinADDEDM3"] = zero

    # in-loop catchment totals: in packed space the padding slots carry an
    # extra segment id (num_catchments) so they never pollute real sums
    if cfg.rep_mbts:
        catch_rs = pk("Catchments") if packed else p["Catchments"]
        ncatch_rs = cfg.num_catchments + (1 if packed else 0)
        catchtotal_rs = lambda x: segment_spread(x, catch_rs, ncatch_rs)

    def substep(carry, n):
        c = dict(carry)
        sideflow_m3 = din["ToChanM3RunoffDt"]

        if cfg.simulate_lakes and not cfg.init_lisflood:
            lake_updates, q_lake_out = _lake_substep(cfg, p, c, lake_inflow(c["ChanQ"]), lake_idx, N, dtype)
            c.update(lake_updates)
        if cfg.simulate_reservoirs and not cfg.init_lisflood:
            res_updates, q_res_out = _reservoir_substep(cfg, p, c, res_inflow(c["ChanQ"]), res_idx, N, dtype)
            c.update(res_updates)
        if cfg.inflow:
            q_in_dt = (din["QInM3OldLoop"] + (n + 1) * din["QDelta"]) / cfg.no_rout_steps
            c["QinADDEDM3"] = c["QinADDEDM3"] + q_in_dt
        if cfg.trans_loss:
            trans_out = jnp.where(pk("UpTrans"),
                                  (c["ChanQ"] ** pk("TransPower2") - pk("TransSub")) ** pk("TransPower1"),
                                  c["ChanQ"])
            trans_loss_m3 = (c["ChanQ"] - trans_out) * cfg.dt_routing
            c["TransCum"] = c["TransCum"] + trans_loss_m3

        # sideflow assembly (routing.py:462-478)
        if cfg.open_water_evapo:
            sideflow_m3 = sideflow_m3 - din["EvaAddM3Dt"]
        if cfg.water_use:
            wuse_add = din["withdrawal_CH_actual_M3_routStep"] - din["returnflow_GwAbs2Channel_M3_routStep"]
            sideflow_m3 = sideflow_m3 - wuse_add
        if cfg.inflow:
            sideflow_m3 = sideflow_m3 + q_in_dt
        if cfg.trans_loss:
            sideflow_m3 = sideflow_m3 - trans_loss_m3
        if not cfg.init_lisflood:
            if cfg.simulate_lakes:
                sideflow_m3 = sideflow_m3 + q_lake_out
            if cfg.simulate_reservoirs:
                sideflow_m3 = sideflow_m3 + q_res_out

        if cfg.rep_mbts:
            added = catchtotal_rs(din["ToChanM3RunoffDt"])
            if cfg.inflow:
                added = added + catchtotal_rs(q_in_dt)
            if cfg.open_water_evapo:
                added = added - catchtotal_rs(din["EvaAddM3Dt"])
            if cfg.water_use:
                added = added - catchtotal_rs(wuse_add)
            c["AddedTRUN"] = c["AddedTRUN"] + added

        sideflow = jnp.where(pk("IsChannelKinematic"), sideflow_m3 * inv_dx / cfg.dt_routing, 0)
        sideflow = jnp.where(jnp.isnan(sideflow), 0.0, sideflow)

        if cfg.init_lisflood or not cfg.split_routing:
            # single routing (routing.py:518-541)
            q = route_b(c["ChanQKin"][None], (sideflow * dx)[None], adx1[None], beta)[0]
            m3 = dx * pk("ChannelAlpha") * q**beta
            m3 = jnp.maximum(m3, 0.0)
            q = (m3 * inv_dx * inv_alpha1) ** (1 / beta)
            c["ChanQKin"] = q
            c["ChanM3Kin"] = m3
            c["ChanQ"] = q
            c["sumDisDay"] = c["sumDisDay"] + q
        else:
            # double routing (routing.py:543-604)
            ratio_den = c["ChanM3Kin"] + c["Chan2M3Kin"]
            sideflow_ratio = jnp.where(ratio_den > 0, c["ChanM3Kin"] / jnp.where(ratio_den > 0, ratio_den, 1.0), 0.0)
            over_limit = (c["ChanM3Kin"] + c["Chan2M3Kin"] - pk("Chan2M3Start")) > pk("M3Limit")
            sideflow1 = jnp.where(over_limit, sideflow_ratio * sideflow, sideflow)
            sideflow1 = jnp.where(jnp.abs(sideflow) < 1e-7, sideflow, sideflow1)
            sideflow2 = sideflow - sideflow1
            sideflow2 = sideflow2 + pk("Chan2QStart") * inv_dx
            c["Sideflow1Chan"] = sideflow1

            # main channel + floodplain routed in one batched sweep
            q12 = route_b(
                jnp.stack([c["ChanQKin"], c["Chan2QKin"]]),
                jnp.stack([sideflow1, sideflow2]) * dx,
                jnp.stack([adx1, adx2]), beta)
            q1, q2 = q12[0], q12[1]
            m31 = jnp.maximum(dx * pk("ChannelAlpha") * q1**beta, 0.0)
            q1 = (m31 * inv_dx * inv_alpha1) ** (1 / beta)

            m32 = dx * pk("ChannelAlpha2") * q2**beta
            m32 = jnp.where(m32 - pk("Chan2M3Start") < 0.0, pk("Chan2M3Start"), m32)
            cross2 = (m32 - pk("Chan2M3Start")) * inv_dx
            q2 = (m32 * inv_dx * inv_alpha2) ** (1 / beta)

            chan_q = jnp.maximum(q1 + q2 - pk("QLimit"), 0.0)
            c["ChanQKin"] = q1
            c["ChanM3Kin"] = m31
            c["Chan2QKin"] = q2
            c["Chan2M3Kin"] = m32
            c["CrossSection2Area"] = cross2
            c["ChanQ"] = chan_q
            c["sumDisDay"] = c["sumDisDay"] + chan_q

        return c, None

    carry, _ = jax.lax.scan(substep, carry, jnp.arange(cfg.no_rout_steps))

    if packed_state:
        return _post_routing_packed(cfg, p, s, d, carry, routers)

    # back to natural pixel space for the post-loop diagnostics
    for key in ("ChanQKin", "ChanM3Kin", "ChanQ", "sumDisDay", "Chan2QKin",
                "Chan2M3Kin", "CrossSection2Area", "Sideflow1Chan",
                "TransCum", "AddedTRUN", "QinADDEDM3"):
        if key in carry:
            carry[key] = unpack(carry[key])

    return _post_routing(cfg, p, s, d, carry, dtype)


def _post_routing(cfg, p, s, d, carry, dtype):
    """Post-substep-loop state assembly and diagnostics, shared by the
    sequential and diagonal-pipelined sub-step loops
    (Lisflood_dynamic.py:194-230, routing.py:645-706)."""
    P = cfg.num_pixels
    dx = p["ChanLength"]
    inv_dx = 1.0 / dx
    catchtotal = lambda x: segment_spread(x, p["Catchments"], cfg.num_catchments)

    out = dict(carry)
    if cfg.inflow:
        # for the mass-balance module (Lisflood_dynamic.py:185-189)
        out["sumInWB"] = carry["QinADDEDM3"]
    # post-loop (Lisflood_dynamic.py:194-230)
    if cfg.init_lisflood or not cfg.split_routing:
        chan_m3 = carry["ChanM3Kin"]
    else:
        chan_m3 = carry["ChanM3Kin"] + carry["Chan2M3Kin"] - p["Chan2M3Start"]
    out["ChanM3"] = chan_m3
    out["TotalCrossSectionArea"] = chan_m3 * inv_dx
    out["sumDis"] = s["sumDis"] + carry["sumDisDay"]
    out["ChanQAvg"] = carry["sumDisDay"] / cfg.no_rout_steps
    if cfg.init_lisflood or cfg.rep_average_dis:
        cum_q = s["CumQ"] + carry["ChanQ"]
        out["CumQ"] = cum_q
        out["avgdis"] = cum_q / d["TimeSinceStart"]
    out["DischargeM3Out"] = s["DischargeM3Out"] + jnp.where(p["AtLastPointC"], carry["ChanQ"] * cfg.dt_sec, 0)

    # flow velocity diagnostic (routing.py:695-706)
    tcsa = jnp.maximum(carry["ChanM3Kin"] * inv_dx, 0.01)
    velocity = jnp.minimum(carry["ChanQKin"] / tcsa, 0.36 * carry["ChanQKin"] ** 0.24)
    velocity = velocity * jnp.minimum(jnp.sqrt(p["PixelArea"]) * inv_dx, 1)
    out["FlowVelocity"] = velocity
    out["TravelDistance"] = velocity * cfg.dt_sec

    # expand structure state to (P,) (lakes.py:280-297, reservoir.py:307-322)
    if cfg.simulate_lakes and not cfg.init_lisflood:
        lake_idx = p["LakeIndex"]
        expand = lambda cc: jnp.zeros(P, dtype).at[lake_idx].set(cc)
        out["LakeStorageM3Balance"] = expand(carry["LakeStorageM3BalanceCC"])
        out["LakeStorageM3"] = expand(carry["LakeStorageM3CC"])
        out["LakeLevel"] = expand(carry["LakeLevelCC"])
        out["LakeInflowOld"] = expand(carry["LakeInflowOldCC"])
        out["LakeOutflow"] = expand(carry["LakeOutflowCC"])
        out["LakeInflowM3S"] = expand(carry["sumLakeInCC"] / cfg.dt_sec)
        out["LakeOutflowM3S"] = expand(carry["sumLakeOutCC"] / cfg.dt_sec)
    if cfg.simulate_reservoirs and not cfg.init_lisflood:
        res_idx = p["ReservoirIndex"]
        expand = lambda cc: jnp.zeros(P, dtype).at[res_idx].set(cc)
        out["ReservoirStorageM3"] = expand(carry["ReservoirStorageM3CC"])
        out["ReservoirFill"] = expand(carry["ReservoirFillCC"])
        out["ReservoirInflowM3S"] = expand(carry["sumResInCC"] / cfg.dt_sec)
        out["ReservoirOutflowM3S"] = expand(carry["sumResOutCC"] / cfg.dt_sec)

    # split-routing mass balance (routing.py:645-691)
    if cfg.rep_mbts and not cfg.init_lisflood and cfg.split_routing:
        chan_q_avg_sr = carry["sumDisDay"] / cfg.no_rout_steps
        sum1 = jnp.where(p["AtLastPointC"], chan_q_avg_sr, 0.0)
        out_step = catchtotal(sum1 * cfg.dt_sec)
        storage_step = carry["ChanM3Kin"] + carry["Chan2M3Kin"] - p["Chan2M3Start"]
        dis_structures = jnp.zeros(P, dtype)
        if cfg.simulate_reservoirs:
            storage_step = storage_step + out["ReservoirStorageM3"]
            dis_structure = jnp.where(p["IsUpsOfStructureKinematicC"], carry["ChanQ"] * cfg.dt_routing, 0)
            dis_structures = catchtotal(dis_structure) - s["DischargeM3StructuresIni"]
        if cfg.simulate_lakes:
            storage_step = storage_step + out["LakeStorageM3Balance"]
            dis_structure = jnp.where(p["IsUpsOfStructureKinematicC"], carry["ChanQ"] * cfg.dt_routing, 0)
            dis_structures = catchtotal(dis_structure)
            dis_lake = jnp.zeros(P, dtype).at[p["LakeIndex"]].set(0.5 * carry["LakeInflowCC"] * cfg.dt_routing)
            dis_structures = dis_structures + catchtotal(dis_lake)
            dis_structures = dis_structures - s["DischargeM3StructuresIni"]
        storage_step1 = catchtotal(storage_step)
        mb_error = -storage_step1 + s["StorageStepINIT"] - out_step - dis_structures + carry["AddedTRUN"]
        out["MBErrorSplitRoutingM3"] = mb_error
        qout_corr = jnp.where(p["AtLastPointC"], mb_error / cfg.dt_routing, 0.0)
        out["OutletDischargeErrorSplitRouting"] = catchtotal(qout_corr)
        out["StorageStepINIT"] = storage_step1 + dis_structures
    return out


def _post_routing_packed(cfg, p, s, d, carry_p, routers):
    """Packed-state epilogue: advances the pk$ routing state in position
    space (no permutation gathers on the carried path) and reuses
    _post_routing for ALL natural-space diagnostics via lazily-unpacked
    views — XLA DCEs any view no output consumes in the scanned production
    driver, so a run that only reports discharge pays exactly one unpack
    per step (sumDisDay -> ChanQAvg)."""
    kin = routers["kin"]
    p_pad = kin.ps.p_pad
    unpack = kin.unpack

    def view(v):
        return unpack(v) if getattr(v, "ndim", 0) >= 1 and v.shape[-1] == p_pad else v

    carry_n = {k: view(v) for k, v in carry_p.items()}
    s_n = dict(s)
    for key in ("sumDis", "CumQ", "avgdis", "DischargeM3Out", "TransCum"):
        if "pk$" + key in s:
            s_n[key] = unpack(s["pk$" + key])
    out = _post_routing(cfg, p, s_n, d, carry_n, carry_n["ChanQKin"].dtype)

    # the advancing state, in packed space (bit-identical to the natural
    # updates in _post_routing — same elementwise ops, permuted layout)
    for key in ("ChanQKin", "ChanM3Kin", "ChanQ", "Chan2QKin", "Chan2M3Kin",
                "CrossSection2Area", "Sideflow1Chan", "TransCum"):
        if key in carry_p:
            out["pk$" + key] = carry_p[key]
    out["pk$sumDis"] = s["pk$sumDis"] + carry_p["sumDisDay"]
    if cfg.init_lisflood or cfg.rep_average_dis:
        cum_q = s["pk$CumQ"] + carry_p["ChanQ"]
        out["pk$CumQ"] = cum_q
        out["pk$avgdis"] = cum_q / d["TimeSinceStart"]
    out["pk$DischargeM3Out"] = s["pk$DischargeM3Out"] + jnp.where(
        p["kinp$AtLastPointC"], carry_p["ChanQ"] * cfg.dt_sec, 0)
    return out


def channel_routing_pipelined(cfg, p, s, d, routers):
    """Wavefront-pipelined sub-step loop: chunk-major scan with ALL
    NoRoutSteps sub-steps of a chunk computed inside one scan iteration.

    The sequential loop runs NoRoutSteps x n_chunks iterations; but
    sub-step t of chunk c depends only on sub-step t of earlier chunks
    (the sweep window) and sub-step t-1 of the SAME chunk — so once the
    scan is chunk-major, the whole T-deep sub-step chain of a chunk is
    computable in one iteration (an unrolled t-loop), and every upstream
    dependency is already complete. This is the spatial wavefront
    pipelining of the routing DAG over time sub-steps (SURVEY.md §5):

    - sequential depth drops from T x n_chunks to n_chunks iterations;
    - all T sub-steps share ONE one-hot scatter matmul (T*L x C) x
      (C, W*C): the selection operand is materialized once per chunk
      instead of once per (chunk, sub-step), and the matmul has T*L rows
      (48 for split routing at daily/hourly stepping) instead of L=2 —
      both measured as the dominant costs of the sequential path;
    - lake/reservoir sub-step chains run inside their chunk's iteration;
      their inflow (feeder discharge at every sub-step) is staged into a
      small per-structure buffer by the feeders' earlier iterations —
      complete before use because the schedule is chunked against the
      PRE-CUT graph (graph/ldd.py build_schedule order_graph).

    Per-pixel numerics are identical to the sequential path (same Newton,
    same clamp order); only the window-accumulation float grouping can
    differ at ulp level — gated by tests/test_model.py.
    """
    packed_state = "pk$ChanQKin" in s
    dtype = (s["pk$ChanQKin"] if packed_state else s["ChanQKin"]).dtype
    kin = routers["kin"]
    ps = kin.ps
    pk = lambda name: p["kinp$" + name]
    pack = kin.pack
    unpack = kin.unpack
    spk = (lambda k: s["pk$" + k]) if packed_state else (lambda k: pack(s[k]))
    T = cfg.no_rout_steps
    C = ps.chunk
    n_chunks = ps.n_chunks
    W = ps.window
    beta = p["Beta"]
    split = cfg.split_routing and not cfg.init_lisflood
    lakes = cfg.simulate_lakes and not cfg.init_lisflood
    reservoirs = cfg.simulate_reservoirs and not cfg.init_lisflood
    L = 2 if split else 1

    from .kinwave_packed import newton_solve

    c2 = lambda x: x.reshape(n_chunks, C)
    # static per-chunk operands, consumed as scan xs
    xs = {
        "ToChan": c2(pack(d["ToChanM3RunoffDt"])),
        "dx": c2(pk("ChanLength")),
        "adx1": c2(pk("ChannelAlpha") * pk("ChanLength") / cfg.dt_routing),
        "alpha1": c2(pk("ChannelAlpha")),
        "ischan": c2(pk("IsChannelKinematic")),
        "dl": jnp.asarray(ps.down_local).reshape(n_chunks, C),
        "q1_0": c2(spk("ChanQKin")),
        "m31_0": c2(spk("ChanM3Kin")),
        "chanq_0": c2(spk("ChanQ")),
        "cidx": jnp.arange(n_chunks, dtype=jnp.int32),
    }
    if split:
        xs.update({
            "adx2": c2(pk("ChannelAlpha2") * pk("ChanLength") / cfg.dt_routing),
            "alpha2": c2(pk("ChannelAlpha2")),
            "qlimit": c2(pk("QLimit")),
            "m3limit": c2(pk("M3Limit")),
            "chan2m3start": c2(pk("Chan2M3Start")),
            "chan2qstart": c2(pk("Chan2QStart")),
            "q2_0": c2(spk("Chan2QKin")),
            "m32_0": c2(spk("Chan2M3Kin")),
        })
    if cfg.open_water_evapo:
        xs["eva"] = c2(pack(d["EvaAddM3Dt"]))
    if cfg.water_use:
        xs["wuse"] = c2(pack(d["withdrawal_CH_actual_M3_routStep"])
                        - pack(d["returnflow_GwAbs2Channel_M3_routStep"]))
    if cfg.inflow:
        xs["qin_old"] = c2(pack(d["QInM3OldLoop"]))
        xs["qdelta"] = c2(pack(d["QDelta"]))
    if cfg.trans_loss:
        xs["uptrans"] = c2(pk("UpTrans"))
        xs["tp1"] = c2(pk("TransPower1"))
        xs["tp2"] = c2(pk("TransPower2"))
        xs["tsub"] = c2(pk("TransSub"))

    iota_w = jnp.arange(W * C, dtype=jnp.int32)

    if lakes:
        nl = cfg.num_lakes
        lake_chunk = pk("LakePos") // C
        lake_lane = pk("LakePos") % C
        lake_ups_chunk = pk("LakeUpsIdx") // C          # (nl, 8)
        lake_ups_lane = pk("LakeUpsIdx") % C
        lake_ups_w = pk("LakeUpsW")
        buf_lake0 = jnp.zeros((nl, T + 1), dtype).at[:, 0].set(
            (spk("ChanQ")[pk("LakeUpsIdx")] * lake_ups_w).sum(1))
    if reservoirs:
        nr = cfg.num_reservoirs
        res_chunk = pk("ResPos") // C
        res_lane = pk("ResPos") % C
        res_ups_chunk = pk("ResUpsIdx") // C
        res_ups_lane = pk("ResUpsIdx") % C
        res_ups_w = pk("ResUpsW")
        buf_res0 = jnp.zeros((nr, T + 1), dtype).at[:, 0].set(
            (spk("ChanQ")[pk("ResUpsIdx")] * res_ups_w).sum(1))

    carry0 = {"win": jnp.zeros((T, L, W * C), dtype)}
    if lakes:
        carry0.update(
            buf_lake=buf_lake0,
            LakeStorageM3CC=s["LakeStorageM3CC"], LakeInflowOldCC=s["LakeInflowOldCC"],
            LakeInflowCC=jnp.zeros(nl, dtype), LakeOutflowCC=s["LakeOutflowCC"],
            LakeStorageM3BalanceCC=s["LakeStorageM3BalanceCC"],
            LakeLevelCC=s["LakeLevelCC"],
            sumLakeInCC=jnp.zeros(nl, dtype), sumLakeOutCC=jnp.zeros(nl, dtype))
    if reservoirs:
        carry0.update(
            buf_res=buf_res0,
            ReservoirStorageM3CC=s["ReservoirStorageM3CC"],
            ReservoirFillCC=s["ReservoirFillCC"],
            sumResInCC=jnp.zeros(nr, dtype), sumResOutCC=jnp.zeros(nr, dtype))

    def body(c, x):
        cidx = x["cidx"]
        inv_dx = 1.0 / x["dx"]
        if lakes:
            on_l = lake_chunk == cidx                   # (nl,)
        if reservoirs:
            on_r = res_chunk == cidx

        q1, m31 = x["q1_0"], x["m31_0"]
        chanq = x["chanq_0"]
        if split:
            q2, m32 = x["q2_0"], x["m32_0"]
        sumdis = jnp.zeros(C, dtype)
        trans_acc = jnp.zeros(C, dtype)
        q_rows = []
        chanq_rows = []

        for t in range(T):
            sideflow_m3 = x["ToChan"]
            if cfg.open_water_evapo:
                sideflow_m3 = sideflow_m3 - x["eva"]
            if cfg.water_use:
                sideflow_m3 = sideflow_m3 - x["wuse"]
            if cfg.inflow:
                sideflow_m3 = sideflow_m3 + (x["qin_old"] + (t + 1) * x["qdelta"]) / T
            if cfg.trans_loss:
                trans_out = jnp.where(x["uptrans"],
                                      (chanq ** x["tp2"] - x["tsub"]) ** x["tp1"],
                                      chanq)
                trans_loss_m3 = (chanq - trans_out) * cfg.dt_routing
                sideflow_m3 = sideflow_m3 - trans_loss_m3
                trans_acc = trans_acc + trans_loss_m3
            if lakes:
                lk = {k: c[k] for k in ("LakeStorageM3CC", "LakeInflowOldCC",
                                        "LakeInflowCC", "LakeOutflowCC",
                                        "LakeStorageM3BalanceCC", "LakeLevelCC",
                                        "sumLakeInCC", "sumLakeOutCC")}
                upd, q_out_l = _lake_substep_cc(cfg, p, lk, c["buf_lake"][:, t])
                for k, v in upd.items():
                    c[k] = jnp.where(on_l, v, c[k])
                sideflow_m3 = sideflow_m3.at[lake_lane].add(jnp.where(on_l, q_out_l, 0.0))
            if reservoirs:
                rs = {k: c[k] for k in ("ReservoirStorageM3CC", "ReservoirFillCC",
                                        "sumResInCC", "sumResOutCC")}
                upd, q_out_r = _reservoir_substep_cc(cfg, p, rs, c["buf_res"][:, t])
                for k, v in upd.items():
                    c[k] = jnp.where(on_r, v, c[k])
                sideflow_m3 = sideflow_m3.at[res_lane].add(jnp.where(on_r, q_out_r, 0.0))

            sideflow = jnp.where(x["ischan"], sideflow_m3 * inv_dx / cfg.dt_routing, 0)
            sideflow = jnp.where(jnp.isnan(sideflow), 0.0, sideflow)

            if not split:
                q_in = q1[None]
                lat = (sideflow * x["dx"])[None]
                adx = x["adx1"][None]
            else:
                ratio_den = m31 + m32
                sideflow_ratio = jnp.where(ratio_den > 0, m31 / jnp.where(ratio_den > 0, ratio_den, 1.0), 0.0)
                over_limit = (m31 + m32 - x["chan2m3start"]) > x["m3limit"]
                sideflow1 = jnp.where(over_limit, sideflow_ratio * sideflow, sideflow)
                sideflow1 = jnp.where(jnp.abs(sideflow) < 1e-7, sideflow, sideflow1)
                sideflow2 = sideflow - sideflow1 + x["chan2qstart"] * inv_dx
                q_in = jnp.stack([q1, q2])
                lat = jnp.stack([sideflow1, sideflow2]) * x["dx"][None]
                adx = jnp.stack([x["adx1"], x["adx2"]])

            cc_const = c["win"][t, :, :C] + adx * q_in ** beta + lat
            q = newton_solve(cc_const, adx, beta)              # (L, C)
            q_rows.append(q)

            if not split:
                q1 = q[0]
                m31 = jnp.maximum(x["dx"] * x["alpha1"] * q1 ** beta, 0.0)
                q1 = (m31 * inv_dx / x["alpha1"]) ** (1 / beta)
                chanq = q1
            else:
                q1v, q2v = q[0], q[1]
                m31 = jnp.maximum(x["dx"] * x["alpha1"] * q1v ** beta, 0.0)
                q1 = (m31 * inv_dx / x["alpha1"]) ** (1 / beta)
                m32 = x["dx"] * x["alpha2"] * q2v ** beta
                m32 = jnp.where(m32 - x["chan2m3start"] < 0.0, x["chan2m3start"], m32)
                q2 = (m32 * inv_dx / x["alpha2"]) ** (1 / beta)
                chanq = jnp.maximum(q1 + q2 - x["qlimit"], 0.0)
            chanq_rows.append(chanq)
            sumdis = sumdis + chanq

        # one shared scatter for all T sub-steps: (T*L, C) x (C, W*C)
        Q = jnp.stack(q_rows).reshape(T * L, C)
        onehot = (x["dl"][:, None] == iota_w[None, :]).astype(dtype)
        add = jax.lax.dot(Q, onehot,
                          precision=jax.lax.Precision.HIGHEST).reshape(T, L, W * C)
        c["win"] = jnp.concatenate(
            [c["win"][:, :, C:], jnp.zeros((T, L, C), dtype)], axis=2) + add

        # stage feeder discharge for downstream structures' sub-step chains
        chanq_all = jnp.stack(chanq_rows)                      # (T, C)
        if lakes:
            feeds = lake_ups_chunk == cidx                     # (nl, 8)
            vals = chanq_all[:, lake_ups_lane] * lake_ups_w[None]      # (T, nl, 8)
            contrib = jnp.where(feeds[None], vals, 0.0).sum(-1)        # (T, nl)
            c["buf_lake"] = c["buf_lake"].at[:, 1:].add(contrib.T)
        if reservoirs:
            feeds = res_ups_chunk == cidx
            vals = chanq_all[:, res_ups_lane] * res_ups_w[None]
            contrib = jnp.where(feeds[None], vals, 0.0).sum(-1)
            c["buf_res"] = c["buf_res"].at[:, 1:].add(contrib.T)

        ys = {"q1": q1, "m31": m31, "chanq": chanq, "sumdis": sumdis}
        if split:
            ys.update(q2=q2, m32=m32,
                      cross2=(m32 - x["chan2m3start"]) * inv_dx,
                      side1=sideflow1)
        if cfg.trans_loss:
            ys["trans"] = trans_acc
        return c, ys

    carry, ys = jax.lax.scan(body, carry0, xs)

    # packed-state mode keeps the carry in position space; natural mode
    # unpacks here (scan/sharded kernels)
    collect = (lambda name: ys[name].reshape(-1)) if packed_state \
        else (lambda name: unpack(ys[name].reshape(-1)))
    out_carry = {
        "ChanQKin": collect("q1"),
        "ChanM3Kin": collect("m31"),
        "ChanQ": collect("chanq"),
        "sumDisDay": collect("sumdis"),
    }
    if split:
        out_carry.update({
            "Chan2QKin": collect("q2"), "Chan2M3Kin": collect("m32"),
            "CrossSection2Area": collect("cross2"), "Sideflow1Chan": collect("side1"),
        })
    if cfg.trans_loss:
        out_carry["TransCum"] = spk("TransCum") + collect("trans")
    if cfg.inflow:
        # closed form of the per-substep ramp sum (inflow.py:145-147)
        out_carry["QinADDEDM3"] = d["QInM3OldLoop"] + d["QDelta"] * (T + 1) / 2.0
    if cfg.rep_mbts:
        # AddedTRUN is linear in the per-substep terms -> one catchtotal
        catch = p["Catchments"]
        ct = lambda v: segment_spread(v, catch, cfg.num_catchments)
        added = T * ct(d["ToChanM3RunoffDt"])
        if cfg.inflow:
            added = added + ct(out_carry["QinADDEDM3"])
        if cfg.open_water_evapo:
            added = added - T * ct(d["EvaAddM3Dt"])
        if cfg.water_use:
            added = added - T * ct(d["withdrawal_CH_actual_M3_routStep"]
                                   - d["returnflow_GwAbs2Channel_M3_routStep"])
        out_carry["AddedTRUN"] = added
    for k in ("LakeStorageM3CC", "LakeInflowOldCC", "LakeInflowCC",
              "LakeOutflowCC", "LakeStorageM3BalanceCC", "LakeLevelCC",
              "sumLakeInCC", "sumLakeOutCC", "ReservoirStorageM3CC",
              "ReservoirFillCC", "sumResInCC", "sumResOutCC"):
        if k in carry:
            out_carry[k] = carry[k]
    if packed_state:
        return _post_routing_packed(cfg, p, s, d, out_carry, routers)
    return _post_routing(cfg, p, s, d, out_carry, s["ChanQKin"].dtype)


def pallas_operands(cfg, p, s, d, routers):
    """Chunk-major operand dict + option flags for the Mosaic sub-step
    kernel (ops/kinwave_pallas.py). Split out of channel_routing_pallas so
    the kernel can be benchmarked/tuned in isolation on real shapes
    (scripts/bench_kernel.py)."""
    from .kinwave_pallas import _rnd

    packed_state = "pk$ChanQKin" in s
    kin = routers["kin"]
    ps = kin.ps
    pk = lambda name: p["kinp$" + name]
    pack = kin.pack
    spk = (lambda k: s["pk$" + k]) if packed_state else (lambda k: pack(s[k]))
    T = cfg.no_rout_steps
    C = ps.chunk
    n_chunks = ps.n_chunks
    split = cfg.split_routing and not cfg.init_lisflood
    lakes = cfg.simulate_lakes and not cfg.init_lisflood
    reservoirs = cfg.simulate_reservoirs and not cfg.init_lisflood

    c2 = lambda x: x.reshape(n_chunks, C)
    xs = {
        "ToChan": c2(pack(d["ToChanM3RunoffDt"])),
        "dx": c2(pk("ChanLength")),
        "adx1": c2(pk("ChannelAlpha") * pk("ChanLength") / cfg.dt_routing),
        "alpha1": c2(pk("ChannelAlpha")),
        "ischan": c2(pk("IsChannelKinematic")),
        "dl": jnp.asarray(ps.down_local).reshape(n_chunks, C),
        "q1_0": c2(spk("ChanQKin")),
        "m31_0": c2(spk("ChanM3Kin")),
        "chanq_0": c2(spk("ChanQ")),
    }
    has = {"split": split}
    if split:
        xs.update({
            "adx2": c2(pk("ChannelAlpha2") * pk("ChanLength") / cfg.dt_routing),
            "alpha2": c2(pk("ChannelAlpha2")),
            "qlimit": c2(pk("QLimit")),
            "m3limit": c2(jnp.minimum(pk("M3Limit"), jnp.finfo(jnp.float32).max)),
            "chan2m3start": c2(pk("Chan2M3Start")),
            "chan2qstart": c2(pk("Chan2QStart")),
            "q2_0": c2(spk("Chan2QKin")),
            "m32_0": c2(spk("Chan2M3Kin")),
        })
    eva_chain = "EvaUpstream0" in d
    if eva_chain:
        # the whole evaporation chain runs in-kernel (see kinwave_pallas
        # eva phase); its transfers use the eva graph's packed window
        # offsets and its result feeds the sideflow directly
        has["eva_chain"] = True
        xs["ev_up0"] = c2(pack(d["EvaUpstream0"]))
        xs["ev_dl"] = pk("EvaDownLocal").reshape(n_chunks, C)
    elif cfg.open_water_evapo:
        xs["eva"] = c2(pack(d["EvaAddM3Dt"]))
        has["eva"] = True
    if cfg.water_use:
        xs["wuse"] = c2(pack(d["withdrawal_CH_actual_M3_routStep"])
                        - pack(d["returnflow_GwAbs2Channel_M3_routStep"]))
        has["wuse"] = True
    if cfg.inflow:
        xs["qin_old"] = c2(pack(d["QInM3OldLoop"]))
        xs["qdelta"] = c2(pack(d["QDelta"]))
        has["qin_old"] = True
    if cfg.trans_loss:
        xs["uptrans"] = c2(pk("UpTrans"))
        xs["tp1"] = c2(pk("TransPower1"))
        xs["tp2"] = c2(pk("TransPower2"))
        xs["tsub"] = c2(pk("TransSub"))
        has["uptrans"] = True

    f32 = jnp.float32

    def struct_operands(prefix, pos, ups_idx, ups_w, n, Np):
        """Per-chunk ownership mask / outlet lane / feeder lane+weight
        operands for one structure family, lane-padded to Np (see
        kinwave_pallas module docstring for the layout contract)."""
        chunk_of = pos // C
        lane_of = pos % C
        cids = jnp.arange(n_chunks, dtype=jnp.int32)
        on = chunk_of[None, :] == cids[:, None]                  # (n_chunks, n)
        lane = jnp.where(on, lane_of[None, :], C).astype(jnp.int32)
        ups_chunk = ups_idx // C                                 # (n, 8)
        ups_lane = ups_idx % C
        in_chunk = ups_chunk[None] == cids[:, None, None]        # (n_chunks, n, 8)
        fee_lane = jnp.where(in_chunk, ups_lane[None], C).astype(jnp.int32)
        fee_w = jnp.where(in_chunk, ups_w[None].astype(f32), 0.0)
        fee_lane = fee_lane.transpose(0, 2, 1)                   # (n_chunks, 8, n)
        fee_w = fee_w.transpose(0, 2, 1)
        padn = Np - n
        out = {
            prefix + "_on": jnp.pad(on.astype(f32), ((0, 0), (0, padn))),
            prefix + "_lane": jnp.pad(lane, ((0, 0), (0, padn)),
                                      constant_values=C).reshape(n_chunks * Np, 1),
            prefix + "_fee_lane": jnp.pad(fee_lane, ((0, 0), (0, 0), (0, padn)),
                                          constant_values=C).reshape(n_chunks * 8, Np),
            prefix + "_fee_w": jnp.pad(fee_w, ((0, 0), (0, 0), (0, padn))
                                       ).reshape(n_chunks * 8, Np),
            prefix + "_own_flag": on.any(1).astype(jnp.int32),
            prefix + "_fee_flag": in_chunk.any((1, 2)).astype(jnp.int32),
        }
        return out

    def row(vec, n, Np, fill=0.0):
        return jnp.pad(jnp.asarray(vec, f32), (0, Np - n),
                       constant_values=fill).reshape(1, Np)

    if lakes:
        from .kinwave_pallas import _rnd as _rnd_  # noqa: F401 (doc anchor)
        has["lakes"] = True
        nl = cfg.num_lakes
        NLp = _rnd(max(nl, 1), 128)
        xs.update(struct_operands("lk", pk("LakePos"), pk("LakeUpsIdx"),
                                  pk("LakeUpsW"), nl, NLp))
        xs.update({
            "lk_factor": row(p["LakeFactor"], nl, NLp, 1.0),
            "lk_factorsqr": row(p["LakeFactorSqr"], nl, NLp, 1.0),
            "lk_area": row(p["LakeAreaCC"], nl, NLp, 1.0),
            "lk_st0": row(s["LakeStorageM3CC"], nl, NLp),
            "lk_inold0": row(s["LakeInflowOldCC"], nl, NLp),
            "lk_out0": row(s["LakeOutflowCC"], nl, NLp),
            "lk_bal0": row(s["LakeStorageM3BalanceCC"], nl, NLp),
            "lk_buf0": row((spk("ChanQ")[pk("LakeUpsIdx")]
                            * pk("LakeUpsW")).sum(1), nl, NLp),
        })
    if reservoirs:
        has["reservoirs"] = True
        nr = cfg.num_reservoirs
        NRp = _rnd(max(nr, 1), 128)
        xs.update(struct_operands("rs", pk("ResPos"), pk("ResUpsIdx"),
                                  pk("ResUpsW"), nr, NRp))
        xs.update({
            "rs_tot": row(p["TotalReservoirStorageM3CC"], nr, NRp, 1.0),
            "rs_cons": row(p["ConservativeStorageLimitCC"], nr, NRp),
            "rs_norm": row(p["NormalStorageLimitCC"], nr, NRp),
            "rs_flood": row(p["FloodStorageLimitCC"], nr, NRp),
            "rs_nfl": row(p["Normal_FloodStorageLimitCC"], nr, NRp),
            "rs_nondam": row(p["NonDamagingReservoirOutflowCC"], nr, NRp),
            "rs_normout": row(p["NormalReservoirOutflowCC"], nr, NRp),
            "rs_minout": row(p["MinReservoirOutflowCC"], nr, NRp),
            "rs_do": row(p["DeltaO"], nr, NRp),
            "rs_dln": row(p["DeltaLN"], nr, NRp, 1.0),
            "rs_dnfl": row(p["DeltaNFL"], nr, NRp, 1.0),
            "rs_st0": row(s["ReservoirStorageM3CC"], nr, NRp),
            "rs_fill0": row(s["ReservoirFillCC"], nr, NRp),
            "rs_buf0": row((spk("ChanQ")[pk("ResUpsIdx")]
                            * pk("ResUpsW")).sum(1), nr, NRp),
        })
    return xs, has


def channel_routing_pallas(cfg, p, s, d, routers):
    """Sub-step loop on the fused Mosaic kernel (ops/kinwave_pallas.py),
    structures included.

    Selected by RoutingPipeline=pallas (or auto on TPU) for float32 runs;
    f64 parity runs fall back to the XLA paths — channel_routing
    dispatches accordingly."""
    from .kinwave_pallas import build_substep_pallas

    packed_state = "pk$ChanQKin" in s
    dtype = (s["pk$ChanQKin"] if packed_state else s["ChanQKin"]).dtype
    kin = routers["kin"]
    ps = kin.ps
    pk = lambda name: p["kinp$" + name]
    unpack = kin.unpack
    spk = (lambda k: s["pk$" + k]) if packed_state else (lambda k: kin.pack(s[k]))
    T = cfg.no_rout_steps
    split = cfg.split_routing and not cfg.init_lisflood
    lakes = cfg.simulate_lakes and not cfg.init_lisflood
    reservoirs = cfg.simulate_reservoirs and not cfg.init_lisflood
    eva_chain = "EvaUpstream0" in d

    xs, has = pallas_operands(cfg, p, s, d, routers)
    interpret = jax.devices()[0].platform != "tpu"
    run = build_substep_pallas(cfg, ps, float(p["Beta"]), has, interpret=interpret)
    ys = run(xs)

    collect = (lambda name: ys[name].reshape(-1).astype(dtype)) if packed_state \
        else (lambda name: unpack(ys[name].reshape(-1)).astype(dtype))
    out_carry = {
        "ChanQKin": collect("q1"),
        "ChanM3Kin": collect("m31"),
        "ChanQ": collect("chanq"),
        "sumDisDay": collect("sumdis"),
    }
    if split:
        out_carry.update({
            "Chan2QKin": collect("q2"), "Chan2M3Kin": collect("m32"),
            "CrossSection2Area": collect("cross2"), "Sideflow1Chan": collect("side1"),
        })
    if cfg.trans_loss:
        out_carry["TransCum"] = spk("TransCum") + collect("trans")
    if cfg.inflow:
        out_carry["QinADDEDM3"] = d["QInM3OldLoop"] + d["QDelta"] * (T + 1) / 2.0
    if cfg.rep_mbts:
        catch = p["Catchments"]
        ct = lambda v: segment_spread(v, catch, cfg.num_catchments)
        added = T * ct(d["ToChanM3RunoffDt"])
        if cfg.inflow:
            added = added + ct(out_carry["QinADDEDM3"])
        if cfg.open_water_evapo:
            eva_dt_nat = (unpack(ys["ev_add"].reshape(-1)).astype(dtype) / T
                          if eva_chain else d["EvaAddM3Dt"])
            added = added - T * ct(eva_dt_nat)
        if cfg.water_use:
            added = added - T * ct(d["withdrawal_CH_actual_M3_routStep"]
                                   - d["returnflow_GwAbs2Channel_M3_routStep"])
        out_carry["AddedTRUN"] = added
    if lakes:
        take = lambda k: ys[k][0, :cfg.num_lakes].astype(dtype)
        out_carry.update({
            "LakeStorageM3CC": take("lk_st"), "LakeInflowOldCC": take("lk_inold"),
            "LakeInflowCC": take("lk_in"), "LakeOutflowCC": take("lk_out"),
            "LakeStorageM3BalanceCC": take("lk_bal"), "LakeLevelCC": take("lk_level"),
            "sumLakeInCC": take("lk_sumin"), "sumLakeOutCC": take("lk_sumout")})
    if reservoirs:
        take = lambda k: ys[k][0, :cfg.num_reservoirs].astype(dtype)
        out_carry.update({
            "ReservoirStorageM3CC": take("rs_st"), "ReservoirFillCC": take("rs_fill"),
            "sumResInCC": take("rs_sumin"), "sumResOutCC": take("rs_sumout")})
    if packed_state:
        out = _post_routing_packed(cfg, p, s, d, out_carry, routers)
    else:
        out = _post_routing(cfg, p, s, d, out_carry, dtype)
    if eva_chain:
        eva_p = ys["ev_add"].reshape(-1).astype(dtype)
        eva_nat = unpack(eva_p)          # diagnostic view (DCE-able)
        out["EvaAddM3"] = eva_nat
        out["EvaAddM3Dt"] = eva_nat / T
        out["EvaWBM3"] = eva_nat
        if packed_state:
            out["pk$EvaCumM3"] = s["pk$EvaCumM3"] + eva_p
            out["EvaCumM3"] = unpack(out["pk$EvaCumM3"])
        else:
            out["EvaCumM3"] = s["EvaCumM3"] + eva_nat
    return out
