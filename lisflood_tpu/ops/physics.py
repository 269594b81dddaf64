"""Hydrological process kernels — pure JAX, vectorized over pixels.

Each function reproduces one reference module's dynamic() semantics
(citations inline); together they are assembled into the single jitted
step by models/step.py. State/params/forcing are plain dicts of jnp
arrays; functions return dicts of updated entries (functional style — no
in-place mutation, XLA fuses the pipeline).

Shapes: (P,) per-pixel, (3, P) per-vegetation/landuse (indices equal:
[Rainfed/Other, Forest, Irrigated]), runoff lanes [Other, Forest, Direct].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# reductions


def segment_spread(values, segments, num_segments):
    """np.bincount(seg, w)[seg] — per-group total spread back to members."""
    totals = jax.ops.segment_sum(values, segments, num_segments=num_segments)
    return totals[segments]


def scatter_to_downstream(values, down_index, num_pixels):
    """np.bincount(downstruct, w)[:P] — route values to downstream pixel."""
    return jax.ops.segment_sum(values, down_index, num_segments=num_pixels + 1)[:num_pixels]


# ---------------------------------------------------------------------------
# snow (snow.py:95-188)


def snow_step(cfg, p, s, f):
    lat_rad = p["lat_rad"]
    day = f["CalendarDay"]
    dt_day = cfg.dt_day
    hemisphere_n = lat_rad > 0
    snow_day_degrees = 360 / 365.25
    ice_day_degrees = 2 * snow_day_degrees
    snowmelt_coeff = jnp.sin(jnp.radians((day - 81) * snow_day_degrees))
    seas_coef = p["SnowSeason"] * jnp.where(hemisphere_n, snowmelt_coeff, -snowmelt_coeff) + p["SnowMeltCoef"]

    is_summer_n = (day > 165) & (day < 257)
    is_summer_s = (day > 347) | (day < 74)
    ice_coeff = jnp.sin(jnp.radians((day - 165) * ice_day_degrees))
    summer_season = jnp.where(hemisphere_n,
                              jnp.where(is_summer_n, ice_coeff, 0.0),
                              jnp.where(is_summer_s, ice_coeff, 0.0))

    precip = f["Precipitation"]
    tavg = f["Tavg"]
    cover = s["SnowCoverS"]
    new_cover = []
    snow = jnp.zeros_like(precip)
    rain = jnp.zeros_like(precip)
    melt = jnp.zeros_like(precip)
    total_cover = jnp.zeros_like(precip)
    for i in range(3):
        tavg_s = tavg + p["DeltaTSnow"] * (i - 1)
        snow_s = jnp.where(tavg_s < p["TempSnow"], p["SnowFactor"] * precip, 0.0)
        rain_s = jnp.where(tavg_s >= p["TempSnow"], precip, 0.0)
        melt_s = (tavg_s - p["TempMelt"]) * seas_coef * (1 + 0.01 * rain_s) * dt_day
        if i < 2:
            ice_melt = tavg * 7.0 * dt_day * summer_season
        else:
            ice_melt = tavg_s * 7.0 * dt_day * summer_season
        melt_s = jnp.maximum(jnp.minimum(melt_s + ice_melt, cover[i]), 0.0)
        cov_i = cover[i] + snow_s - melt_s
        new_cover.append(cov_i)
        snow = snow + snow_s
        rain = rain + rain_s
        melt = melt + melt_s
        total_cover = total_cover + cov_i
    snow = snow / 3
    rain = rain / 3
    melt = melt / 3
    total_cover = total_cover / 3
    return {
        "SnowCoverS": jnp.stack(new_cover),
        "Snow": snow,
        "Rain": rain,
        "SnowMelt": melt,
        "SnowCover": total_cover,
        "TotalPrecipitation": s["TotalPrecipitation"] + snow + rain,
        "TotalPrecipitationWB": snow + rain,
    }


# ---------------------------------------------------------------------------
# frost (frost.py:61-93)


def frost_step(cfg, p, s, d):
    rate = -(1 - p["Afrost"]) * s["FrostIndex"] - d["Tavg"] * jnp.exp(
        -0.04 * p["Kfrost"] * d["SnowCover"] / p["SnowWaterEquivalent"])
    fi = jnp.maximum(s["FrostIndex"] + rate * cfg.dt_day, 0)
    fi = jnp.where(fi > 57.0, 57.0, fi)
    return {"FrostIndex": fi, "isFrozenSoil": fi > p["FrostIndexThreshold"]}


# ---------------------------------------------------------------------------
# canopy: interception + Ta stress (soilloop.py:519-627, kernels 27-75)


def canopy_step(cfg, p, s, d):
    lai = d["LAI"]                       # (3, P)
    lai_term = jnp.exp(-p["kgb"][None] * lai)
    rain = d["Rain"]
    one_minus_lai = 1.0 - lai_term
    ta_interception_max = d["EWRef"][None] * one_minus_lai

    # interception water balance (soilloop.py:27-70)
    cum = s["CumInterception"]
    smax = jnp.where(lai <= 0.1, 0.0,
                     jnp.where(lai <= 43.3, 0.935 + 0.498 * lai - 0.00575 * lai**2, 11.718))
    interception = jnp.where(
        smax > 0,
        jnp.minimum(jnp.minimum(smax - cum, smax * (1 - jnp.exp(-0.046 * lai * rain[None] / jnp.where(smax > 0, smax, 1.0)))), rain[None]),
        0.0)
    cum = jnp.where(smax > 0, cum + interception, cum)
    has_cum = cum > 0
    ta_int = jnp.where(has_cum, jnp.maximum(jnp.minimum(cum, ta_interception_max), 0.0), 0.0)
    cum2 = jnp.maximum(cum - ta_int, 0.0)
    leaf_drainage = jnp.where(has_cum, p["LeafDrainageK"] * cum2, 0.0)
    cum3 = jnp.where(has_cum, jnp.maximum(cum2 - leaf_drainage, 0.0), cum2)

    # potential transpiration (soilloop.py:73-75,546-559)
    transpir_max = p["CropCoef"] * d["ETRef"][None] * one_minus_lai
    potential_transpiration = jnp.maximum(transpir_max - ta_int, 0)

    # soil water stress + actual transpiration (soilloop.py:564-627)
    w1a, w1b = s["W1a"], s["W1b"]
    w1 = w1a + w1b
    inv_dt_day = 1.0 / cfg.dt_day
    et_capped = jnp.minimum(0.1 * d["ETRef"] * inv_dt_day, 1.0)
    swdf = 1 / (0.76 + 1.5 * et_capped[None]) - 0.10 * (5 - p["CropGroupNumber"])
    swdf = jnp.where(p["CropGroupNumber"] <= 2.5,
                     swdf + (et_capped[None] - 0.6) / (p["CropGroupNumber"] * (p["CropGroupNumber"] + 3)),
                     swdf)
    swdf = jnp.clip(swdf, 0.0, 1.0)
    wcrit1 = (1 - swdf) * (p["WFC1"] - p["WWP1"]) + p["WWP1"]
    wcrit1a = (1 - swdf) * (p["WFC1a"] - p["WWP1a"]) + p["WWP1a"]
    wcrit1b = (1 - swdf) * (p["WFC1b"] - p["WWP1b"]) + p["WWP1b"]

    rws = jnp.where(wcrit1 - p["WWP1"] > 0, (w1 - p["WWP1"]) / (wcrit1 - p["WWP1"]), 1.0)
    rws = jnp.clip(rws, 0.0, 1.0)
    transpirable = jnp.maximum(w1 - p["WWP1"], 0)
    ta = jnp.minimum(rws * potential_transpiration, transpirable)
    ta = jnp.where(d["isFrozenSoil"][None], 0.0, ta)
    wc1a = jnp.maximum(w1a - wcrit1a, 0)
    wc1b = jnp.maximum(w1b - wcrit1b, 0)
    ta1a = jnp.minimum(ta, wc1a)
    rest = jnp.maximum(ta - ta1a, 0)
    ta1b = jnp.minimum(rest, wc1b)
    rest = jnp.maximum(rest - ta1b, 0)
    sa1a = jnp.maximum(w1a - ta1a - p["WWP1a"], 0)
    sa1b = jnp.maximum(w1b - ta1b - p["WWP1b"], 0)
    sa_tot = sa1a + sa1b
    avail = sa_tot > 0
    fr1a = jnp.where(avail, sa1a / jnp.where(avail, sa_tot, 1.0), 0.0)
    fr1b = jnp.where(avail, sa1b / jnp.where(avail, sa_tot, 1.0), 0.0)
    ta1a = ta1a + fr1a * rest
    ta1b = ta1b + fr1b * rest
    w1a = w1a - ta1a
    w1b = w1b - ta1b

    # irrigation-layer fill levels needed by water abstraction
    # (soilloop.py:582-588, Irrigated landuse only)
    out = {
        "CumInterception": cum3,
        "Interception": interception,
        "TaInterception": ta_int,
        "LeafDrainage": leaf_drainage,
        "potential_transpiration": potential_transpiration,
        "RWS": rws,
        "Ta": ta,
        "W1a": w1a,
        "W1b": w1b,
        "LAITerm": lai_term,
    }
    if cfg.water_use:
        out["WFilla"] = jnp.minimum(wcrit1a[2], p["WPF3a"][2])
        out["WFillb"] = jnp.minimum(wcrit1b[2], p["WPF3b"][2])
    return out


# ---------------------------------------------------------------------------
# soil column water balance (soilloop.py:78-356)


def _unsat_conductivity(w, psnz, wres, ws, ksat, inv_m, m):
    sat = jnp.where(psnz, jnp.clip((w - wres) / jnp.where(psnz, ws - wres, 1.0), 0.0, 1.0), 0.0)
    return ksat * jnp.sqrt(sat) * (1 - (1 - sat ** inv_m) ** m) ** 2


def soil_columns_step(cfg, p, s, d):
    dt_day = cfg.dt_day
    rain_plus_melt = d["Rain"] + d["SnowMelt"]
    w1a, w1b, w2 = s["W1a"], s["W1b"], s["W2"]
    dslr = s["DSLR"]
    frozen = d["isFrozenSoil"][None]

    avail_inf = jnp.maximum(rain_plus_melt[None] + d["LeafDrainage"] - d["Interception"], 0.0)

    # bare soil evaporation (soilloop.py:137-162)
    dslr = jnp.where(avail_inf > p["AvWaterThreshold"], 1.0, dslr + dt_day)
    es_max = d["ESRef"][None] * d["LAITerm"]
    es_act = es_max * (jnp.sqrt(dslr) - jnp.sqrt(dslr - 1))
    w1 = w1a + w1b
    es_act = jnp.maximum(jnp.minimum(es_act, w1 - p["WRes1"]), 0.0)
    supply1a = w1a - p["WRes1a"]
    es1a = jnp.minimum(es_act, supply1a)
    es1b = jnp.maximum(es_act - supply1a, 0.0)
    w1a_e = jnp.maximum(w1a - es1a, p["WRes1a"])
    w1b_e = jnp.maximum(w1b - es1b, p["WRes1b"])
    w1a = jnp.where(frozen, w1a, w1a_e)
    w1b = jnp.where(frozen, w1b, w1b_e)
    es_act = jnp.where(frozen, 0.0, es_act)
    w1 = w1a + w1b

    # infiltration capacity (soilloop.py:164-211)
    rel_sat1 = jnp.where(p["PoreSpaceNotZero1a"], jnp.minimum(w1 / p["WS1"], 1.0), 0.0)
    sat_fraction = 1.0 - (1.0 - rel_sat1) ** p["b_Xinanjiang"][None]
    inf_pot = jnp.where(frozen, 0.0,
                        p["StoreMaxPervious"] * (1 - sat_fraction) ** p["PowerInfPot"][None] * dt_day)
    pref_flow = (rel_sat1 ** p["PowerPrefFlow"][None]) * avail_inf
    avail_inf = avail_inf - pref_flow
    infiltration = jnp.maximum(jnp.minimum(avail_inf, inf_pot), 0.0)
    test_w1a = w1a + infiltration
    w1a = jnp.minimum(p["WS1a"], test_w1a)
    w1b = w1b + jnp.maximum(test_w1a - p["WS1a"], 0.0)

    # Darcy inter-layer seepage with per-pixel Courant sub-steps
    # (soilloop.py:213-321). Structure (settled by on-chip measurement,
    # bench.py is the arbiter — isolated micro-timings of these pieces were
    # repeatedly misleading): sub-step 0 runs loop-free for the whole grid
    # (fuses with the surrounding ops); no_subs>1 lanes are compacted into
    # a static-size buffer (top_k) and iterate there; a whole-grid masked
    # loop remains as the compaction-overflow fallback (no_subs forced to
    # 1 otherwise). Per-lane numerics are identical to the reference's
    # per-pixel loop on every path (gated by tests/test_soil_courant.py).
    k1a0 = _unsat_conductivity(w1a, p["PoreSpaceNotZero1a"], p["WRes1a"], p["WS1a"], p["KSat1a"], p["GenuInvM1a"], p["GenuM1a"])
    k1b0 = _unsat_conductivity(w1b, p["PoreSpaceNotZero1b"], p["WRes1b"], p["WS1b"], p["KSat1b"], p["GenuInvM1b"], p["GenuM1b"])
    k20 = _unsat_conductivity(w2, p["PoreSpaceNotZero2"], p["WRes2"], p["WS2"], p["KSat2"], p["GenuInvM2"], p["GenuM2"])
    aw1a = w1a - p["WRes1a"]
    aw1b = w1b - p["WRes1b"]
    aw2 = w2 - p["WRes2"]
    courant_a = jnp.where(aw1a == 0, 0.0, k1a0 * dt_day / jnp.where(aw1a == 0, 1.0, aw1a))
    courant_b = jnp.where(aw1b == 0, 0.0, k1b0 * dt_day / jnp.where(aw1b == 0, 1.0, aw1b))
    courant_2 = jnp.where(aw2 == 0, 0.0, k20 * dt_day / jnp.where(aw2 == 0, 1.0, aw2))
    courant = jnp.maximum(jnp.maximum(courant_a, courant_b), courant_2)
    no_subs_raw = jnp.maximum(1, jnp.ceil(courant / p["CourantCrit"])).astype(jnp.int32)
    no_subs = jnp.minimum(no_subs_raw, cfg.max_soil_substeps)
    # diagnostic: the safety cap silently truncates the physics when it
    # binds (the reference's per-pixel loop is unbounded, soilloop.py:249);
    # surfaced as a warning by the run drivers
    cap_hit = jnp.any(no_subs_raw > cfg.max_soil_substeps)
    # divide in the COMPUTE dtype: python-float / int32 promotes to f64
    # under the global x64 flag, which silently ran the whole seepage chain
    # in emulated float64 on TPU (measured 3x the f32 cost)
    dt_sub = dt_day / no_subs.astype(courant.dtype)
    cap1 = p["WS1b"] - w1b
    cap2 = p["WS2"] - w2

    soil_keys = ("WRes1a", "WRes1b", "WRes2", "WS1a", "WS1b", "WS2",
                 "KSat1a", "KSat1b", "KSat2", "GenuInvM1a", "GenuInvM1b",
                 "GenuInvM2", "GenuM1a", "GenuM1b", "GenuM2",
                 "PoreSpaceNotZero1a", "PoreSpaceNotZero1b", "PoreSpaceNotZero2")

    def tail_loop(aw1a_t, aw1b_t, aw2_t, sa_t, sb_t, sgw_t, ns_t, dtsub_t, q):
        """Sub-steps 1..no_subs-1, masked per lane; identical update order
        to the reference loop (caps recomputed from current storage each
        sub-step, which equals the explicit cap carry of soilloop.py)."""
        nmax = jnp.max(ns_t)

        def cond(c):
            return c[0] < nmax

        def body(c):
            i, a1a, a1b, a2, sa, sb, sgw = c
            active = i < ns_t
            wt1a = a1a + q["WRes1a"]
            wt1b = a1b + q["WRes1b"]
            wt2 = a2 + q["WRes2"]
            k1a = _unsat_conductivity(wt1a, q["PoreSpaceNotZero1a"], q["WRes1a"], q["WS1a"], q["KSat1a"], q["GenuInvM1a"], q["GenuM1a"])
            k1b = _unsat_conductivity(wt1b, q["PoreSpaceNotZero1b"], q["WRes1b"], q["WS1b"], q["KSat1b"], q["GenuInvM1b"], q["GenuM1b"])
            k2 = _unsat_conductivity(wt2, q["PoreSpaceNotZero2"], q["WRes2"], q["WS2"], q["KSat2"], q["GenuInvM2"], q["GenuM2"])
            s_a = jnp.minimum(k1a * dtsub_t, q["WS1b"] - wt1b)
            s_b = jnp.minimum(k1b * dtsub_t, q["WS2"] - wt2)
            s_g = jnp.minimum(k2 * dtsub_t, a2)
            sel = lambda n, o: jnp.where(active, n, o)
            return (i + 1, sel(a1a - s_a, a1a), sel(a1b + s_a - s_b, a1b),
                    sel(a2 + s_b - s_g, a2),
                    sel(sa + s_a, sa), sel(sb + s_b, sb), sel(sgw + s_g, sgw))

        out = jax.lax.while_loop(
            cond, body, (jnp.int32(1), aw1a_t, aw1b_t, aw2_t, sa_t, sb_t, sgw_t))
        return out[4], out[5], out[6]

    # sub-step 0, whole grid, loop-free (reuses the Courant conductivities)
    seep_a = jnp.minimum(k1a0 * dt_sub, cap1)
    seep_b = jnp.minimum(k1b0 * dt_sub, cap2)
    seep_gw = jnp.minimum(k20 * dt_sub, aw2)
    aw1a_1 = aw1a - seep_a
    aw1b_1 = aw1b + seep_a - seep_b
    aw2_1 = aw2 + seep_b - seep_gw

    multi = no_subs > 1
    n_multi = multi.sum()
    n_lanes = int(np.prod(no_subs.shape))
    # M = n/64: measured fastest full-step configuration on the real chip
    # (n/8 avoids overflow in wet conditions but benches 90 ms/step slower
    # end-to-end; the where-merged fallback keeps overflow steps correct)
    M = min(n_lanes, max(1024, n_lanes // 64))
    # compaction via top_k, not jnp.nonzero: the nonzero/cumsum lowering
    # spills scoped VMEM inside lax.scan on TPU (reduce-window pad-127
    # pattern); top_k over a 0/1 key selects every multi lane while
    # count <= M (ties broken by index, so fill slots replay lane 0's
    # neighbourhood harmlessly — see below)
    idx = jax.lax.top_k(multi.reshape(-1).astype(jnp.int32), M)[1]
    bcast = lambda x: jnp.broadcast_to(x, no_subs.shape).reshape(-1)
    g = lambda x: bcast(x)[idx]
    qc = {k: g(p[k]) for k in soil_keys}
    # top_k indices are distinct; slots holding non-multi lanes have
    # no_subs == 1, so their tail loop is masked to a no-op and the
    # scatter below writes back their unchanged sub-step-0 value — no
    # validity masking needed
    sa_c, sb_c, sgw_c = tail_loop(g(aw1a_1), g(aw1b_1), g(aw2_1),
                                  g(seep_a), g(seep_b), g(seep_gw),
                                  g(no_subs), g(dt_sub), qc)
    shape = no_subs.shape
    scat = lambda full, comp: full.reshape(-1).at[idx].set(comp).reshape(shape)
    seep_a_c = scat(seep_a, sa_c)
    seep_b_c = scat(seep_b, sb_c)
    seep_gw_c = scat(seep_gw, sgw_c)

    # overflow fallback: if more than M lanes need sub-stepping, rerun the
    # tail masked over the WHOLE grid (no_subs forced to 1 otherwise, so
    # the while_loop body executes zero times and costs only its carry
    # setup). NOT lax.cond: XLA converts the cond to a both-branches
    # select here and the 'skipped' full-grid loop runs for real
    # (measured +45 ms at continental scale).
    overflow = n_multi > M
    ns_eff = jnp.where(overflow, no_subs, 1)
    sa_f, sb_f, sgw_f = tail_loop(aw1a_1, aw1b_1, aw2_1,
                                  seep_a, seep_b, seep_gw, ns_eff, dt_sub, p)
    seep_a = jnp.where(overflow, sa_f, seep_a_c)
    seep_b = jnp.where(overflow, sb_f, seep_b_c)
    seep_gw = jnp.where(overflow, sgw_f, seep_gw_c)

    seep_a = jnp.where(frozen, 0.0, seep_a)
    seep_b = jnp.where(frozen, 0.0, seep_b)
    seep_gw = jnp.where(frozen, 0.0, seep_gw)
    w1a = w1a - seep_a
    w1b = w1b + seep_a - seep_b
    w2 = w2 + seep_b - seep_gw
    w1 = w1a + w1b
    infiltration = infiltration - jnp.maximum(w1a - p["WS1a"], 0.0)
    w1a = jnp.minimum(w1a, p["WS1a"])

    theta1a = jnp.where(p["PoreSpaceNotZero1a"], w1a / jnp.where(p["PoreSpaceNotZero1a"], p["SoilDepth1a"], 1.0), 0.0)
    theta1b = jnp.where(p["PoreSpaceNotZero1b"], w1b / jnp.where(p["PoreSpaceNotZero1b"], p["SoilDepth1b"], 1.0), 0.0)
    theta2 = jnp.where(p["PoreSpaceNotZero2"], w2 / jnp.where(p["PoreSpaceNotZero2"], p["SoilDepth2"], 1.0), 0.0)

    # upper zone transfer (soilloop.py:337-355)
    uz = s["UZ"]
    uz_outflow = jnp.minimum(p["UpperZoneK"][None] * uz, uz)
    uz = jnp.maximum(uz - uz_outflow, 0.0)
    if cfg.drained_irrigation:
        drained = p["DrainedFraction"]
        is_irrigated = jnp.array([0.0, 0.0, 1.0], uz.dtype)[:, None]
        uz_outflow = uz_outflow + is_irrigated * drained * seep_gw
        uz = uz + jnp.where(is_irrigated > 0, (1 - drained) * seep_gw + pref_flow, seep_gw + pref_flow)
    else:
        uz = uz + seep_gw + pref_flow
    gw_perc_uzlz = jnp.minimum(p["GwPercStep"][None], uz)
    uz = jnp.maximum(uz - gw_perc_uzlz, 0.0)

    return {
        "W1a": w1a, "W1b": w1b, "W2": w2, "DSLR": dslr, "UZ": uz,
        "ESAct": es_act, "PrefFlow": pref_flow, "Infiltration": infiltration,
        "AvailableWaterForInfiltration": avail_inf,
        "SeepTopToSubA": seep_a, "SeepTopToSubB": seep_b, "SeepSubToGW": seep_gw,
        "Theta1a": theta1a, "Theta1b": theta1b, "Theta2": theta2,
        "UZOutflow": uz_outflow, "GwPercUZLZ": gw_perc_uzlz,
        "SoilCourantCapHit": cap_hit,
    }


# ---------------------------------------------------------------------------
# open water & sealed (opensealed.py:41-71)


def opensealed_step(cfg, p, s, d):
    rain_snowmelt = jnp.maximum(d["Rain"] + d["SnowMelt"], 0.0)
    ewater_act = jnp.maximum(jnp.minimum(d["EWRef"], rain_snowmelt), 0.0)
    inter_sealed = jnp.minimum(jnp.maximum(p["SMaxSealed"] - s["CumInterSealed"], 0.0), rain_snowmelt)
    cum_sealed = s["CumInterSealed"] + inter_sealed
    ta_sealed = jnp.maximum(jnp.minimum(cum_sealed, d["EWRef"]), 0.0)
    cum_sealed = jnp.maximum(cum_sealed - ta_sealed, 0.0)
    direct_runoff = d["DirectRunoffFraction"] * (rain_snowmelt - inter_sealed) + d["WaterFraction"] * (rain_snowmelt - ewater_act)
    return {
        "RainSnowmelt": rain_snowmelt,
        "EWaterAct": ewater_act,
        "CumInterSealed": cum_sealed,
        "TASealed": ta_sealed,
        "DirectRunoff": direct_runoff,
    }


# ---------------------------------------------------------------------------
# rice irrigation (riceirrigation.py:78-179)


def rice_irrigation_step(cfg, p, s, d):
    day = d["CalendarDay"]
    ilanduse = 0  # Rainfed
    ws1 = p["WS1"][ilanduse]
    w1 = d["W1a"][ilanduse] + d["W1b"][ilanduse]
    mmto_m3 = p["MMtoM3"]
    dt_day = cfg.dt_day
    rice_frac = p["RiceFraction"]

    sat_demand = (ws1 - w1) * rice_frac * mmto_m3 * dt_day
    pl1, ha1 = p["RicePlantingDay1"], p["RiceHarvestDay1"]
    pl_20 = jnp.where(pl1 - 20 < 0, 365 + pl1 - 20, pl1 - 20)
    pl_10 = jnp.where(pl1 - 10 < 0, 365 + pl1 - 10, pl1 - 10)
    ha_20 = jnp.where(ha1 - 20 < 0, 365 + ha1 - 20, ha1 - 20)
    ha_10 = jnp.where(ha1 - 10 < 0, 365 + ha1 - 10, ha1 - 10)

    saturation = jnp.where((day >= pl_20) & (day < pl_10), 0.1 * sat_demand, 0.0)
    rice_eva = jnp.maximum(d["EWRef"] - (d["ESAct"][ilanduse] + d["Ta"][ilanduse]), 0)
    eva_demand = rice_eva * rice_frac * mmto_m3
    flooding_demand = p["RiceFlooding"] * rice_frac * mmto_m3 * dt_day
    flooding = jnp.where((day >= pl_10) & (day < pl1), flooding_demand + eva_demand, 0.0)
    evaporation = jnp.where((day >= pl1) & (day < ha_20), eva_demand, 0.0)
    perc_demand = p["RicePercolation"] * rice_frac * mmto_m3 * dt_day
    percolation = jnp.where((day >= pl1) & (day < ha_20), perc_demand, 0.0)
    abstraction = saturation + flooding + evaporation + percolation

    drain_demand = (ws1 - p["WFC1"][ilanduse]) * rice_frac * mmto_m3 * dt_day
    drainage = jnp.where((day >= ha_10) & (day < ha1), 0.1 * drain_demand, 0.0)

    soil_frac0 = p["SoilFraction"][ilanduse]
    uz = d["UZ"]
    uz0 = uz[ilanduse] + jnp.where(soil_frac0 > 0.0, (drainage + percolation) * p["M3toMM"] / jnp.where(soil_frac0 > 0, soil_frac0, 1.0), 0.0)
    uz = uz.at[ilanduse].set(uz0)
    return {"PaddyRiceWaterAbstractionFromSurfaceWaterM3": abstraction, "UZ": uz}


# ---------------------------------------------------------------------------
# water abstraction (waterabstraction.py:250-665)


def water_abstraction_step(cfg, p, s, d):
    P = cfg.num_pixels
    nreg = cfg.num_wregions
    wreg = p["WUseRegionC"]
    mmto_m3 = p["MMtoM3"]
    m3to_mm = p["M3toMM"]
    regional = lambda x: segment_spread(x, wreg, nreg)
    zero = jnp.zeros(P, d["Rain"].dtype)

    dom_mm = d["DomesticDemandMM"]
    ind_mm = d["IndustrialDemandMM"]
    liv_mm = d["LivestockDemandMM"]
    ene_mm = d["EnergyDemandMM"]
    fgw = p["FractionGroundwaterUsed"]
    fnc = p["FractionNonConventionalWaterUsed"]
    fsw = p["FractionSurfaceWaterUseDomLivInd"]

    # livestock (waterabstraction.py:279-290)
    cons_req_liv = liv_mm * p["LivestockConsumptiveUseFraction"]
    cons_gw_liv = cons_req_liv * fgw
    cons_sw_liv = cons_req_liv * fsw
    abst_req_liv = liv_mm * mmto_m3
    abst_gw_liv = fgw * abst_req_liv
    abst_nc_liv = fnc * abst_req_liv
    abst_sw_liv = abst_req_liv - abst_gw_liv - abst_nc_liv

    # domestic (waterabstraction.py:292-305)
    dem_red_dom = dom_mm * p["DomesticWaterSavingConstant"]
    leak_dom = p["leak_demand_fraction"] * dem_red_dom
    abst_req_dom_mm = dem_red_dom + leak_dom
    abst_req_dom = abst_req_dom_mm * mmto_m3
    cons_req_dom = dem_red_dom * p["DomesticConsumptiveUseFraction"]
    cons_gw_dom = cons_req_dom * fgw
    cons_sw_dom = cons_req_dom * fsw
    abst_gw_dom = fgw * abst_req_dom
    abst_nc_dom = fnc * abst_req_dom
    abst_sw_dom = abst_req_dom - abst_gw_dom - abst_nc_dom

    # industry (waterabstraction.py:307-321)
    abst_req_ind = ind_mm * mmto_m3
    cons_req_ind = ind_mm * p["IndustryConsumptiveUseFraction"]
    cons_gw_ind = cons_req_ind * fgw
    cons_sw_ind = cons_req_ind * fsw
    abst_gw_ind = fgw * abst_req_ind
    abst_nc_ind = fnc * abst_req_ind
    abst_sw_ind = abst_req_ind - abst_gw_ind - abst_nc_ind

    # energy (waterabstraction.py:323-329)
    cons_req_ene = ene_mm * p["EnergyConsumptiveUseFraction"]
    abst_sw_ene = ene_mm * mmto_m3

    # irrigation (waterabstraction.py:331-354): recompute Ta on irrigated
    iveg = 2
    w1_irr = d["W1a"][iveg] + d["W1b"][iveg]
    ta_irr = jnp.clip(d["RWS"][iveg] * d["potential_transpiration"][iveg], 0.0, None)
    ta_irr = jnp.maximum(jnp.minimum(ta_irr, w1_irr - p["WWP1"][iveg]), 0.0)
    ta = d["Ta"].at[iveg].set(ta_irr)
    demand_irr_mm = (d["potential_transpiration"][iveg] - ta_irr) * p["SoilFraction"][iveg]
    demand_irr_mm = jnp.where(d["isFrozenSoil"], 0.0, demand_irr_mm)
    cons_req_irr_mm = demand_irr_mm * p["IrrigationMult"]
    eff = p["IrrigationEfficiency"] * p["ConveyanceEfficiency"]
    abst_req_irr_mm = jnp.where(eff > 0, cons_req_irr_mm / jnp.where(eff > 0, eff, 1.0), 0.0)
    abst_req_irr = jnp.maximum(abst_req_irr_mm * mmto_m3, 0.0)

    # treated waste-water reuse (waterabstraction.py:355-366)
    accum_reuse = jnp.where(d["CalendarDay"] == 1, 0.0, s["ActualAccumulatedReUsedWaterM3"])
    avail_reuse = jnp.minimum(jnp.maximum(p["PotentialIrrigationWaterReUseM3Annual"] - accum_reuse, 0),
                              p["PotentialIrrigationWaterReUseM3Daily"])
    abst_reuse_irr = jnp.minimum(avail_reuse, abst_req_irr)
    accum_reuse = accum_reuse + abst_reuse_irr
    frac_swgw = 1.0 - jnp.where(abst_req_irr > 0, abst_reuse_irr / jnp.where(abst_req_irr > 0, abst_req_irr, 1.0), 0.0)
    abst_swgw_req_irr = frac_swgw * abst_req_irr
    cons_swgw_req_irr_mm = frac_swgw * cons_req_irr_mm

    gw_fed = p["GWfed_fraction_irrigation"]
    abst_gw_req_irr = gw_fed * abst_swgw_req_irr
    abst_sw_req_irr = jnp.maximum(abst_swgw_req_irr - abst_gw_req_irr, 0)
    cons_gw_req_irr_mm = gw_fed * cons_req_irr_mm
    cons_sw_req_irr_mm = jnp.maximum(cons_swgw_req_irr_mm - cons_gw_req_irr_mm, 0)
    abst_gw_act_irr = abst_gw_req_irr
    cons_gw_act_irr_mm = cons_gw_req_irr_mm

    # aggregation (waterabstraction.py:384-399)
    abst_all_req = abst_req_dom + abst_req_liv + abst_req_ind + abst_sw_ene + d["PaddyRiceWaterAbstractionFromSurfaceWaterM3"] + abst_req_irr
    abst_gw_noreturn = abst_gw_dom + abst_gw_liv + abst_gw_ind
    abst_sw_req = abst_sw_dom + abst_sw_liv + abst_sw_ind + abst_sw_ene + abst_sw_req_irr + d["PaddyRiceWaterAbstractionFromSurfaceWaterM3"]
    abst_swgw_req = abst_sw_req + abst_gw_req_irr + abst_gw_noreturn
    cons_gw_noreturn = (cons_gw_dom + cons_gw_liv + cons_gw_ind) * mmto_m3
    cons_sw_req_noreturn = (cons_sw_dom + cons_sw_liv + cons_sw_ind + cons_req_ene) * mmto_m3
    cons_swgw_req = (cons_gw_req_irr_mm + cons_sw_req_irr_mm) * mmto_m3 + d["PaddyRiceWaterAbstractionFromSurfaceWaterM3"] + cons_gw_noreturn + cons_sw_req_noreturn
    withdrawal_sw_req = cons_sw_req_noreturn + abst_sw_req_irr + d["PaddyRiceWaterAbstractionFromSurfaceWaterM3"]
    areatotal_withdrawal_sw_req = regional(withdrawal_sw_req)
    is_sw_required = areatotal_withdrawal_sw_req > 0

    # groundwater abstraction (waterabstraction.py:401-411)
    abst_gw_actual = abst_gw_noreturn + abst_gw_act_irr
    lz = s["LZ"] - abst_gw_actual * m3to_mm
    irri_loss_cum = s["IrriLossCUM"] + abst_gw_actual
    returnflow_gw2chan_routstep = (abst_gw_noreturn - cons_gw_noreturn) / cfg.no_rout_steps

    # lakes and reservoirs abstraction (waterabstraction.py:418-467)
    dt_day = cfg.dt_day
    if cfg.simulate_reservoirs and not cfg.init_lisflood:
        res_storage = s["ReservoirStorageM3"]
        pot_res = jnp.minimum(0.02 * res_storage, 0.01 * p["TotalReservoirStorageM3C"]) * dt_day
        pot_res = jnp.where(jnp.isnan(pot_res), 0.0, pot_res)
    else:
        pot_res = zero
    if cfg.simulate_lakes and not cfg.init_lisflood:
        pot_lake = 0.10 * s["LakeStorageM3"] * dt_day
        pot_lake = jnp.where(jnp.isnan(pot_lake), 0.0, pot_lake)
    else:
        pot_lake = zero
    pot_lakres = pot_lake + pot_res
    areatotal_pot_lakres = regional(pot_lakres)
    areatotal_lakres_req = p["FractionLakeReservoirWaterUsed"] * areatotal_withdrawal_sw_req
    areatotal_lakres_act = jnp.minimum(areatotal_lakres_req, areatotal_pot_lakres)
    frac_by_lakres = jnp.where(is_sw_required, areatotal_lakres_act / jnp.where(is_sw_required, areatotal_withdrawal_sw_req, 1.0), 0.0)
    frac_emptying = jnp.where(areatotal_pot_lakres > 0, areatotal_lakres_act / jnp.where(areatotal_pot_lakres > 0, areatotal_pot_lakres, 1.0), 0.0)
    lake_abstraction = pot_lake * frac_emptying
    res_abstraction = pot_res * frac_emptying
    out = {}
    if cfg.simulate_lakes and not cfg.init_lisflood:
        out["LakeStorageM3"] = s["LakeStorageM3"] - lake_abstraction
        out["LakeStorageM3CC"] = s["LakeStorageM3CC"] - lake_abstraction[p["LakeIndex"]]
    if cfg.simulate_reservoirs and not cfg.init_lisflood:
        out["ReservoirStorageM3"] = s["ReservoirStorageM3"] - res_abstraction
        out["ReservoirStorageM3CC"] = s["ReservoirStorageM3CC"] - res_abstraction[p["ReservoirIndex"]]

    # channel withdrawal (waterabstraction.py:470-498)
    areatotal_ch_req = jnp.maximum(areatotal_withdrawal_sw_req - areatotal_lakres_act, 0.0)
    pixel_avail_ch = jnp.maximum(d["ChanM3Kin"] - p["EFlowThreshold"] * cfg.dt_sec, 0.0)
    areatotal_avail_ch = jnp.maximum(regional(pixel_avail_ch), 0.0)
    areatotal_ch_act = jnp.minimum(areatotal_avail_ch, areatotal_ch_req)
    frac_from_ch = jnp.where(areatotal_avail_ch > 0,
                             jnp.minimum(areatotal_ch_act / jnp.where(areatotal_avail_ch > 0, areatotal_avail_ch, 1.0), 1.0), 0.0)
    withdrawal_ch_act = frac_from_ch * pixel_avail_ch
    withdrawal_ch_act_routstep = withdrawal_ch_act / cfg.no_rout_steps
    wateruse_cum = s["wateruseCum"] + withdrawal_ch_act
    areatotal_shortage_sw = jnp.maximum(areatotal_ch_req - areatotal_ch_act, 0.0)
    withdrawal_sw_act = withdrawal_ch_act + lake_abstraction + res_abstraction

    # scarcity allocation (waterabstraction.py:508-547)
    abst_ch_req_irr = abst_sw_req_irr * (1 - frac_by_lakres)
    areatotal_abst_ch_req_irr = regional(abst_ch_req_irr)
    irrabs_minus_short = areatotal_abst_ch_req_irr - areatotal_shortage_sw
    areatotal_abst_ch_act_irr = jnp.maximum(irrabs_minus_short, 0.0)
    frac_met_ch_irr = jnp.minimum(jnp.where(areatotal_abst_ch_req_irr > 0,
                                            areatotal_abst_ch_act_irr / jnp.where(areatotal_abst_ch_req_irr > 0, areatotal_abst_ch_req_irr, 1.0), 0.0), 1.0)
    abst_ch_act_irr = abst_ch_req_irr * frac_met_ch_irr
    withdrawal_ch_req_noreturn = cons_sw_req_noreturn * (1 - frac_by_lakres)
    areatotal_wd_ch_req_noreturn = regional(withdrawal_ch_req_noreturn)
    areatotal_short_beyond_irr = jnp.maximum(-irrabs_minus_short, 0.0)
    areatotal_wd_ch_act_noreturn = jnp.maximum(areatotal_wd_ch_req_noreturn - areatotal_short_beyond_irr, 0.0)
    frac_met_ch_noreturn = jnp.minimum(jnp.where(areatotal_wd_ch_req_noreturn > 0,
                                                 areatotal_wd_ch_act_noreturn / jnp.where(areatotal_wd_ch_req_noreturn > 0, areatotal_wd_ch_req_noreturn, 1.0), 0.0), 1.0)
    cum_ch_withdrawal = s["cumulated_CH_withdrawal"] + withdrawal_ch_act

    # actual surface-water abstractions (waterabstraction.py:535-547)
    abst_sw_act_irr = abst_sw_req_irr * frac_by_lakres + abst_ch_act_irr
    frac_met_sw_irr = jnp.minimum(frac_by_lakres + frac_met_ch_irr * (1 - frac_by_lakres), 1.0)
    frac_met_sw_noreturn = jnp.minimum(frac_by_lakres + frac_met_ch_noreturn * (1 - frac_by_lakres), 1.0)

    # actual consumptions (waterabstraction.py:549-559)
    cons_act_irr_mm = cons_gw_act_irr_mm + cons_sw_req_irr_mm * frac_met_sw_irr
    cons_act_ene = cons_req_ene * frac_met_sw_noreturn
    cons_act_dom = cons_gw_dom + cons_sw_dom * frac_met_sw_noreturn
    cons_act_liv = cons_gw_liv + cons_sw_liv * frac_met_sw_noreturn
    cons_act_ind = cons_gw_ind + cons_sw_ind * frac_met_sw_noreturn
    cons_swgw_act = (cons_act_irr_mm + cons_act_ene + cons_act_dom + cons_act_liv + cons_act_ind) * mmto_m3 + d["PaddyRiceWaterAbstractionFromSurfaceWaterM3"]

    # irrigation application to soil (waterabstraction.py:561-597)
    abst_swgw_act_irr = abst_sw_act_irr + abst_gw_act_irr
    irrigation_for_prescribed = jnp.maximum(abst_swgw_act_irr, 0)
    soil_frac_irr = p["SoilFraction"][iveg]
    iwd = irrigation_for_prescribed * m3to_mm
    iwd = jnp.where(soil_frac_irr > 0, iwd / jnp.where(soil_frac_irr > 0, soil_frac_irr, 1.0), 0.0)
    w1a_irr = d["W1a"][iveg]
    w1b_irr = d["W1b"][iveg]
    w_old = w1a_irr + w1b_irr
    wfilla = d["WFilla"]
    wfillb = d["WFillb"]
    iwd_b = jnp.maximum(iwd - (wfilla - w1a_irr), 0)
    w1a_new = jnp.where(w1a_irr >= wfilla, w1a_irr, jnp.minimum(wfilla, w1a_irr + iwd))
    w1b_new = jnp.where(w1b_irr >= wfillb, w1b_irr, jnp.minimum(wfillb, w1b_irr + iwd_b))
    w_diff = (w1a_new + w1b_new) - w_old
    ta = ta.at[iveg].set(ta[iveg] + iwd - w_diff)
    irri_loss_cum = irri_loss_cum + irrigation_for_prescribed * p["efficiency_irrigation"] - w_diff * mmto_m3 * soil_frac_irr
    w1a = d["W1a"].at[iveg].set(w1a_new)
    w1b = d["W1b"].at[iveg].set(w1b_new)

    # update irrigated thetas (waterabstraction.py:655-664)
    theta1a = d["Theta1a"].at[iveg].set(w1a_new / p["SoilDepth1a"][iveg])
    theta1b = d["Theta1b"].at[iveg].set(w1b_new / p["SoilDepth1b"][iveg])

    eflow_indicator = (d["ChanQ"] < p["EFlowThreshold"]).astype(d["ChanQ"].dtype)

    out.update({
        "LZ": lz,
        "W1a": w1a, "W1b": w1b, "Ta": ta,
        "Theta1a": theta1a, "Theta1b": theta1b,
        "ActualAccumulatedReUsedWaterM3": accum_reuse,
        "IrriLossCUM": irri_loss_cum,
        "wateruseCum": wateruse_cum,
        "cumulated_CH_withdrawal": cum_ch_withdrawal,
        "withdrawal_CH_actual_M3": withdrawal_ch_act,
        "withdrawal_CH_actual_M3_routStep": withdrawal_ch_act_routstep,
        "returnflow_GwAbs2Channel_M3_routStep": returnflow_gw2chan_routstep,
        "abstraction_GW_actual_M3": abst_gw_actual,
        "abstraction_allSources_required_M3": abst_all_req,
        "abstraction_SW_required_M3": abst_sw_req,
        "abstraction_SwGw_required_M3": abst_swgw_req,
        "consumption_SwGw_required_M3": cons_swgw_req,
        "consumption_SwGw_actual_M3": cons_swgw_act,
        "areatotal_shortage_SW_M3": areatotal_shortage_sw,
        "areatotal_withdrawal_LakRes_actual_M3": areatotal_lakres_act,
        "areatotal_withdrawal_SW_actual_M3": regional(withdrawal_sw_act),
        "LakeAbstractionM3": lake_abstraction,
        "ReservoirAbstractionM3": res_abstraction,
        "EFlowIndicator": eflow_indicator,
        "abstraction_SwGw_actual_irrigation_M3": abst_swgw_act_irr,
        "abstraction_Reuse_irrigation_M3": abst_reuse_irr,
    })
    if cfg.rep_water_use:
        # per-sector per-step terms feeding the monthly accounting
        # (waterabstraction.py:631-646); accumulation happens in
        # ops/indicators.indicator_step
        out.update({
            "consumption_required_domestic_MM": cons_sw_dom + cons_gw_dom,
            "consumption_required_energy_MM": cons_req_ene,
            "consumption_required_industry_MM": cons_sw_ind + cons_gw_ind,
            "consumption_required_livestock_MM": cons_sw_liv + cons_gw_liv,
            "consumption_SwGw_required_irrigation_MM": cons_gw_req_irr_mm + cons_sw_req_irr_mm,
            "consumption_actual_irrigation_MM": cons_act_irr_mm,
            "abstraction_required_irrigation_M3": abst_req_irr,
            "abstraction_SwGw_required_irrigation_M3": abst_swgw_req_irr,
        })
    return out


# ---------------------------------------------------------------------------
# per-pixel aggregation (soil.py:471-514)


def soil_perpixel_step(cfg, p, s, d):
    soil_frac = p["SoilFraction"]
    veg_sum = lambda x: (soil_frac * x).sum(0)
    ta_interception_all = veg_sum(d["TaInterception"]) + p["DirectRunoffFraction"] * d["TASealed"]
    ta_pixel = veg_sum(d["Ta"])
    es_act_pixel = veg_sum(d["ESAct"]) + d["WaterFraction"] * d["EWaterAct"]
    tot_sm = d["W1a"] + d["W1b"] + d["W2"]
    theta = soil_frac * tot_sm / p["SoilDepthTotal"]
    frac_sum = soil_frac.sum(0)
    theta_all = jnp.where(frac_sum > 0, theta.sum(0) / jnp.where(frac_sum > 0, frac_sum, 1.0), 0.0)
    return {
        "TaInterceptionAll": ta_interception_all,
        "TaInterceptionCUM": s["TaInterceptionCUM"] + ta_interception_all,
        "TaInterceptionWB": ta_interception_all,
        "TaPixel": ta_pixel,
        "TaCUM": s["TaCUM"] + ta_pixel,
        "TaWB": ta_pixel,
        "ESActPixel": es_act_pixel,
        "ESActCUM": s["ESActCUM"] + es_act_pixel,
        "ESActWB": es_act_pixel,
        "PrefFlowPixel": veg_sum(d["PrefFlow"]),
        "InfiltrationPixel": veg_sum(d["Infiltration"]),
        "Theta": theta,
        "ThetaAll": theta_all,
        "SeepTopToSubPixelA": veg_sum(d["SeepTopToSubA"]),
        "SeepTopToSubPixelB": veg_sum(d["SeepTopToSubB"]),
        "SeepSubToGWPixel": veg_sum(d["SeepSubToGW"]),
        "Theta1aPixel": veg_sum(d["Theta1a"]),
        "Theta1bPixel": veg_sum(d["Theta1b"]),
        "Theta2Pixel": veg_sum(d["Theta2"]),
    }


# ---------------------------------------------------------------------------
# groundwater (groundwater.py:134-181)


def groundwater_step(cfg, p, s, d):
    lz = d["LZ"] if "LZ" in d else s["LZ"]
    lz_outflow = jnp.minimum(p["LowerZoneK"] * lz, lz - p["LZThreshold"])
    lz_outflow = jnp.maximum(lz_outflow, 0)
    lz = lz - lz_outflow
    soil_frac = p["SoilFraction"]
    uz_outflow_pixel = (soil_frac * d["UZOutflow"]).sum(0)
    gw_perc_pixel = (soil_frac * d["GwPercUZLZ"]).sum(0)
    lz = lz + gw_perc_pixel
    gw_loss_lz = jnp.maximum(jnp.minimum(p["GwLossStep"], lz), 0.0)
    lz = lz - gw_loss_lz
    lz_inflow_cum = jnp.maximum(s["LZInflowCUM"] + gw_perc_pixel - gw_loss_lz, 0.0)
    lz_av_inflow = (lz_inflow_cum / cfg.dt_day) / d["TimeSinceStart"]
    return {
        "LZ": lz,
        "LZOutflow": lz_outflow,
        "LZOutflowToChannel": lz_outflow,
        "LZOutflowToChannelPixel": lz_outflow,
        "UZOutflowPixel": uz_outflow_pixel,
        "GwPercUZLZPixel": gw_perc_pixel,
        "GwLossPixel": gw_loss_lz,
        "GwLossWB": gw_loss_lz,
        "GwLossCUM": s["GwLossCUM"] + gw_loss_lz,
        "LZInflowCUM": lz_inflow_cum,
        "LZAvInflow": lz_av_inflow,
    }


# ---------------------------------------------------------------------------
# open-water evaporation (evapowater.py:96-159)


def evapowater_init_step(cfg, p, s, d):
    """Variable water fraction (evapowater.py:96-121)."""
    if not (cfg.open_water_evapo and cfg.var_fraction_water):
        return {
            "WaterFraction": p["WaterFraction"],
            "OtherFraction_dyn": p["OtherFraction"],
            "ForestFraction_dyn": p["ForestFraction"],
            "IrrigationFraction_dyn": p["IrrigationFraction"],
            "DirectRunoffFraction": p["DirectRunoffFraction"],
            "PermeableFraction": p["PermeableFraction"],
        }
    rel_water = p["varW"][d["VarWMonth"]]
    var_water = rel_water * p["diffmaxwater"]
    water = p["WaterFraction"] + var_water
    other = jnp.maximum(p["OtherFraction"] - var_water, 0)
    rest = jnp.maximum(var_water - p["OtherFraction"], 0)
    forest = jnp.maximum(p["ForestFraction"] - rest, 0)
    rest = jnp.maximum(rest - p["ForestFraction"], 0)
    irrig = jnp.maximum(p["IrrigationFraction"] - rest, 0)
    rest = jnp.maximum(rest - p["IrrigationFraction"], 0)
    direct = jnp.maximum(p["DirectRunoffFraction"] - rest, 0)
    return {
        "WaterFraction": water,
        "OtherFraction_dyn": other,
        "ForestFraction_dyn": forest,
        "IrrigationFraction_dyn": irrig,
        "DirectRunoffFraction": direct,
        "PermeableFraction": 1 - direct - water,
    }


# LDD keypad code -> (row shift, col shift), mirrored from graph/ldd.py
_LDD_OFFSETS = {1: (1, -1), 2: (1, 0), 3: (1, 1), 4: (0, -1),
                6: (0, 1), 7: (-1, -1), 8: (-1, 0), 9: (-1, 1)}


def _shift2d(m, dr, dc):
    """m shifted so out[r + dr, c + dc] = m[r, c] (zeros flow in)."""
    R, C = m.shape
    return jnp.pad(m, ((max(dr, 0), max(-dr, 0)), (max(dc, 0), max(-dc, 0))))[
        max(-dr, 0):max(-dr, 0) + R, max(-dc, 0):max(-dc, 0) + C]


def scatter_down_stencil(x, codes2d, land_idx, nrows, ncols):
    """scatter_to_downstream as a 2-D LDD stencil: decompress, 8 masked
    shifted adds at HBM bandwidth, compress. Numerically exact up to the
    addition ORDER of multi-upstream cells (<= 8 fixed-order adds vs
    segment_sum's grouping) — the TPU-native formulation of the
    neighbour transfer; the segment-sum scatter costs ~7 ns/element."""
    dtype = x.dtype
    g = jnp.zeros(nrows * ncols, dtype).at[land_idx].set(x).reshape(nrows, ncols)
    cd = codes2d.reshape(nrows, ncols)
    out = jnp.zeros_like(g)
    for code, (dr, dc) in _LDD_OFFSETS.items():
        out = out + _shift2d(g * (cd == code), dr, dc)
    return out.reshape(-1)[land_idx]


def evapowater_step(cfg, p, s, d):
    """Open-water evaporation moved downstream (evapowater.py:123-159)."""
    P = cfg.num_pixels
    if (cfg.use_eva_stencil and "evaDir2D" in p
            and cfg.grid_rows and cfg.grid_cols):
        move_down = lambda x: scatter_down_stencil(
            x, p["evaDir2D"], p["landIdx"], cfg.grid_rows, cfg.grid_cols)
    else:
        move_down = lambda x: scatter_to_downstream(x, p["downEva"], P)
    upstream_eva = d["EWRef"] * p["MMtoM3"] * d["WaterFraction"]
    chan_m_iter = d["ChanM3Kin"]
    chan_left = chan_m_iter * 0.1
    eva_add = jnp.zeros(P, upstream_eva.dtype)
    for _ in range(cfg.max_no_eva):
        chan_help = jnp.maximum(chan_m_iter - upstream_eva, chan_left)
        eva_iter = jnp.maximum(upstream_eva - (chan_m_iter - chan_help), 0)
        chan_m_iter = chan_help
        eva_add = eva_add + upstream_eva - eva_iter
        upstream_eva = move_down(eva_iter)
    return {
        "EvaAddM3": eva_add,
        "EvaAddM3Dt": eva_add / cfg.no_rout_steps,
        "EvaCumM3": s["EvaCumM3"] + eva_add,
        "EvaWBM3": eva_add,
    }


# ---------------------------------------------------------------------------
# water level (waterlevel.py:49-77)


def waterlevel_step(cfg, p, s, d):
    chan_csa = jnp.where(p["IsChannelKinematic"],
                         jnp.minimum(d["TotalCrossSectionArea"], p["TotalCrossSectionAreaBankFull"]), 0)
    floodplain_csa = d["TotalCrossSectionArea"] - chan_csa
    chan_depth = 2 * chan_csa / (p["ChanUpperWidth"] + p["ChanBottomWidth"])
    floodplain_depth = floodplain_csa / p["FloodPlainWidth"]
    level = chan_depth + floodplain_depth
    return {"WaterLevel": jnp.where(p["IsChannelKinematic"], level, 0)}


# ---------------------------------------------------------------------------
# pF soil-suction diagnostics (soilloop.py:673-704, simulatePF option)


def pf_step(cfg, p, d):
    """Capillary pressure head per soil layer from van Genuchten inversion;
    pF = log10(head[cm]), -1 where the head is zero. Vegetation index maps
    1:1 onto landuse index for the three prescribed fractions, so the
    (3, P) soil parameter arrays broadcast directly against the (3, P)
    moisture states (reference index_landuse_all, soilloop.py:684-687)."""

    def pf(w, psnz, wres, ws, inv_alpha, inv_m, inv_n):
        sat = jnp.where(psnz, jnp.clip((w - wres) / (ws - wres), 0.0, 1.0), 0.0)
        head_raw = inv_alpha * jnp.power(
            jnp.power(1.0 / jnp.maximum(sat, 1e-30), inv_m) - 1.0,
            inv_n)
        head = jnp.where(sat == 0, p["HeadMax"],
                         jnp.minimum(p["HeadMax"], head_raw))
        return jnp.where(head > 0, jnp.log10(jnp.maximum(head, 1e-30)), -1.0)

    return {
        "pF0": pf(d["W1a"], p["PoreSpaceNotZero1a"], p["WRes1a"], p["WS1a"],
                  p["GenuInvAlpha1a"], p["GenuInvM1a"], p["GenuInvN1a"]),
        "pF1": pf(d["W1b"], p["PoreSpaceNotZero1b"], p["WRes1b"], p["WS1b"],
                  p["GenuInvAlpha1b"], p["GenuInvM1b"], p["GenuInvN1b"]),
        "pF2": pf(d["W2"], p["PoreSpaceNotZero2"], p["WRes2"], p["WS2"],
                  p["GenuInvAlpha2"], p["GenuInvM2"], p["GenuInvN2"]),
    }
