"""Water-security indicators and groundwater smoothing.

- `indicator_step`: monthly/annual Water Exploitation Indices (WEI-Dem/
  Abs/Cns/Plus), Falkenmark per-capita, dependency / sustainability /
  security indices, accumulated per water region
  (reference indicatorcalc.py:80-235).
- `groundwater_smooth`: windowtotal-based LZ smoothing over groundwater
  bodies with catchment-average correction
  (reference waterabstraction.py:602-628).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .physics import segment_spread


def indicator_state_zero(cfg, P, dtype):
    """Monthly accumulators (indicatorcalc.py:201-235)."""
    z = jnp.zeros(P, dtype)
    return {
        "DayCounter": jnp.zeros((), dtype),
        "MonthETpotMM": z, "MonthETactMM": z,
        "MonthAbstractionRequiredAllSourcesM3": z,
        "MonthAbstractionRequiredSurfaceGroundWaterM3": z,
        "MonthAbstractionRequiredSurfaceWaterM3": z,
        "MonthConsumptionActualM3": z, "MonthConsumptionRequiredM3": z,
        "MonthDisM3": z, "MonthInternalFlowM3": z,
        "RegionMonthIrrigationShortageM3": z,
        "MonthWaterAbstractedfromLakesReservoirsM3": z,
    }


INDICATOR_KEYS = (
    "DayCounter", "MonthETpotMM", "MonthETactMM",
    "MonthAbstractionRequiredAllSourcesM3",
    "MonthAbstractionRequiredSurfaceGroundWaterM3",
    "MonthAbstractionRequiredSurfaceWaterM3",
    "MonthConsumptionActualM3", "MonthConsumptionRequiredM3",
    "MonthDisM3", "MonthInternalFlowM3",
    "RegionMonthIrrigationShortageM3",
    "MonthWaterAbstractedfromLakesReservoirsM3",
)


def indicator_step(cfg, p, s, d):
    """Monthly accumulation + end-of-month WEI computation
    (indicatorcalc.py:80-198). `d["monthend"]` is a device bool scalar."""
    wreg = p["WUseRegionC"]
    nreg = cfg.num_wregions
    regional = lambda x: segment_spread(x, wreg, nreg)
    out = {}
    out["DayCounter"] = s["DayCounter"] + 1
    month_etpot = s["MonthETpotMM"] + d["ETRef"]
    month_etact = s["MonthETactMM"] + (p["SoilFraction"] * d["TaInterception"]).sum(0) + d["TaPixel"] + d["ESActPixel"]
    if cfg.open_water_evapo:
        month_etact = month_etact + d["EvaAddM3"] * p["M3toMM"]
    out["MonthETpotMM"] = month_etpot
    out["MonthETactMM"] = month_etact
    out["MonthETdifMM"] = jnp.maximum((month_etpot - month_etact) * p["LandUseMask"], 0.0)

    out["MonthAbstractionRequiredAllSourcesM3"] = s["MonthAbstractionRequiredAllSourcesM3"] + d["abstraction_allSources_required_M3"]
    out["MonthAbstractionRequiredSurfaceGroundWaterM3"] = s["MonthAbstractionRequiredSurfaceGroundWaterM3"] + d["abstraction_SwGw_required_M3"]
    out["MonthAbstractionRequiredSurfaceWaterM3"] = s["MonthAbstractionRequiredSurfaceWaterM3"] + d["abstraction_SW_required_M3"]
    out["MonthConsumptionRequiredM3"] = s["MonthConsumptionRequiredM3"] + d["consumption_SwGw_required_M3"]
    out["MonthConsumptionActualM3"] = s["MonthConsumptionActualM3"] + d["consumption_SwGw_actual_M3"]
    out["MonthDisM3"] = s["MonthDisM3"] + d["ChanQAvg"] * cfg.dt_sec
    out["MonthWaterAbstractedfromLakesReservoirsM3"] = s["MonthWaterAbstractedfromLakesReservoirsM3"] + d["ReservoirAbstractionM3"] + d["LakeAbstractionM3"]
    out["RegionMonthIrrigationShortageM3"] = s["RegionMonthIrrigationShortageM3"] + d["areatotal_shortage_SW_M3"]
    out["MonthInternalFlowM3"] = s["MonthInternalFlowM3"] + d["ToChanM3Runoff"]

    # end-of-month: WEI family (indicatorcalc.py:120-198); computed every
    # step but only meaningful at monthend (reported values gated there)
    region_internal = regional(out["MonthInternalFlowM3"])
    # external inflow at water-region inflow points: sum of upstream MonthDisM3
    ups_dis = d["UpstreamSumMonthDis"]  # provided by step: upstream_sum(MonthDisM3)
    inflow_points = p["WaterRegionInflowPoints"]
    region_external = regional(jnp.where(inflow_points, ups_dis, 0.0))
    upstream_inflow = region_external
    local_fresh = region_internal
    local_demand = regional(out["MonthAbstractionRequiredAllSourcesM3"])
    remaining = jnp.maximum(local_demand - local_fresh, 0.0)
    upstream_used = jnp.minimum(remaining, upstream_inflow)
    fossil_used = jnp.maximum(remaining - upstream_used, 0.0)
    freshwater_total = upstream_inflow + local_fresh
    avail = freshwater_total > 0
    safe_fresh = jnp.where(avail, freshwater_total, 1.0)
    out["WEI_Dem"] = jnp.where(avail, local_demand / safe_fresh, 0.0)
    out["WEI_Abs"] = jnp.where(avail, regional(out["MonthAbstractionRequiredSurfaceGroundWaterM3"]) / safe_fresh, 0.0)
    out["WEI_Cns"] = jnp.where(avail, regional(out["MonthConsumptionRequiredM3"]) / safe_fresh, 0.0)
    out["WEI_Plus"] = jnp.where(avail, regional(out["MonthConsumptionActualM3"]) / safe_fresh, 0.0)
    out["WaterSustainabilityIndex"] = jnp.where(local_demand > 0, fossil_used / (local_demand + 1), 0.0)
    out["WaterDependencyIndex"] = jnp.where(local_demand > 0, upstream_used / (local_demand + 1), 0.0)
    out["WaterSecurityIndex"] = jnp.where(upstream_inflow > 0, upstream_used / (upstream_inflow + 1), 0.0)
    pop = p["RegionPopulation"]
    out["FalkenmarkM3Capita1"] = jnp.where(pop > 0, region_internal * 12 / pop, 0.0)
    out["FalkenmarkM3Capita2"] = jnp.where(pop > 0, local_fresh * 12 / pop, 0.0)
    out["FalkenmarkM3Capita3"] = jnp.where(pop > 0, freshwater_total * 12 / pop, 0.0)
    out["UpstreamInflowUsedM3"] = upstream_used
    return out


def groundwater_smooth(cfg, p, lz, land_rows, land_cols, nrows, ncols):
    """LZ smoothing via windowtotal over groundwater bodies
    (waterabstraction.py:602-628), fully on device.

    land_rows/land_cols: static per-pixel 2-D coordinates. The square
    window sum is computed with a summed-area table (two cumsums)."""
    window = jnp.asarray(p["LZSmoothRangeCells"], jnp.int32)
    is_gw = p["GroundwaterBodies"] > 0
    # scatter LZ (on gw bodies) to the 2-D grid
    grid_lz = jnp.zeros((nrows, ncols), lz.dtype).at[land_rows, land_cols].set(jnp.where(is_gw, lz, 0.0))
    grid_cnt = jnp.zeros((nrows, ncols), lz.dtype).at[land_rows, land_cols].set(jnp.where(is_gw, 1.0, 0.0))

    def window_total(a, k):
        # SAT with zero padding; k static (from params int)
        half = k // 2
        pad = jnp.pad(a, ((half, k - half), (half, k - half)))
        sat = jnp.pad(pad.cumsum(0).cumsum(1), ((1, 0), (1, 0)))
        return (sat[k:, k:] - sat[:-k, k:] - sat[k:, :-k] + sat[:-k, :-k])[: a.shape[0], : a.shape[1]]

    k = int(p["LZSmoothRangeCells"])
    tot = window_total(grid_lz, k)[land_rows, land_cols]
    cnt = window_total(grid_cnt, k)[land_rows, land_cols]
    smooth = jnp.where(cnt == 0, 0.0, tot / jnp.where(cnt == 0, 1.0, cnt))
    lz_new = jnp.where(is_gw, 0.9 * lz + 0.1 * smooth, lz)
    # catchment-average correction over groundwater catchments
    gw_catch = p["GroundwaterCatch"]          # int labels (0 = outside)
    ncatch = cfg.num_catchments * 2 + 2       # label space bound
    diff = jnp.where(is_gw, smooth - lz, 0.0)
    cnt_c = segment_spread(jnp.where(is_gw, 1.0, 0.0), gw_catch, ncatch)
    sum_c = segment_spread(diff, gw_catch, ncatch)
    corr = 0.1 * jnp.where(cnt_c > 0, sum_c / jnp.where(cnt_c > 0, cnt_c, 1.0), 0.0)
    corr = jnp.where(gw_catch > 0, corr, 0.0)
    return lz_new - corr
