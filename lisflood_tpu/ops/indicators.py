"""Water-security indicators and groundwater smoothing.

- `indicator_step`: monthly/annual Water Exploitation Indices (WEI-Dem/
  Abs/Cns/Plus), Falkenmark per-capita, dependency / sustainability /
  security indices, accumulated per water region
  (reference indicatorcalc.py:80-235). The reference computes the WEI
  family only inside its `if monthend:` branch; here they are computed
  every step from the same running accumulators, which yields identical
  values at monthend — and every WEI-family output is declared
  monthly=True (default_options.py:1152-1200), so nothing is ever
  reported off-monthend.
- `groundwater_smooth`: windowtotal-based LZ smoothing over groundwater
  bodies with catchment-average correction
  (reference waterabstraction.py:602-628).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .physics import segment_spread


#: per-sector monthly accounting accumulators (repWaterUse,
#: waterabstraction.py:631-646 / indicatorcalc.py:218-235)
SECTORAL_MONTH_KEYS = (
    "consumption_required_domestic_MM_month",
    "consumption_required_energy_MM_month",
    "consumption_required_industry_MM_month",
    "consumption_required_livestock_MM_month",
    "consumption_required_irrigation_MM_month",
    "consumption_actual_irrigation_MM_month",
    "abstraction_allSources_required_irrigation_M3Month",
    "abstraction_allSources_actual_irrigation_M3Month",
    "abstraction_SwGw_required_irrigation_M3Month",
    "abstraction_SwGw_actual_irrigation_M3Month",
)

INDICATOR_KEYS_BASE = (
    "DayCounter", "MonthETpotMM", "MonthETactMM",
    "MonthAbstractionRequiredAllSourcesM3",
    "MonthAbstractionRequiredSurfaceGroundWaterM3",
    "MonthAbstractionRequiredSurfaceWaterM3",
    "MonthConsumptionActualM3", "MonthConsumptionRequiredM3",
    "MonthDisM3", "MonthInternalFlowM3",
    "RegionMonthIrrigationShortageM3",
    "MonthWaterAbstractedfromLakesReservoirsM3",
)

# backward-compat alias (step.py state plumbing uses indicator_keys(cfg))
INDICATOR_KEYS = INDICATOR_KEYS_BASE


def indicator_keys(cfg):
    """Monthly-accumulator state keys for this configuration."""
    keys = list(INDICATOR_KEYS_BASE)
    if cfg.rep_water_use:
        keys += list(SECTORAL_MONTH_KEYS)
    return tuple(keys)


def indicator_state_zero(cfg, P, dtype):
    """Monthly accumulators reset to zero (indicatorcalc.py:201-235
    dynamic_setzero)."""
    z = jnp.zeros(P, dtype)
    out = {k: z for k in indicator_keys(cfg)}
    out["DayCounter"] = jnp.zeros((), dtype)
    return out


def indicator_step(cfg, p, s, d):
    """Monthly accumulation + WEI/Falkenmark/regional outputs
    (indicatorcalc.py:80-198). All formulas below are line-matched to the
    reference, including its `/(X+1)` small-denominator guards
    (indicatorcalc.py:167-185: "the '+1' is to prevent division by small
    values") and the domestic M3MonthRegion sum that the reference leaves
    in MM (no MMtoM3 factor, indicatorcalc.py:219)."""
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

    # per-sector monthly accounting (waterabstraction.py:631-646)
    if cfg.rep_water_use:
        paddy_m3 = d["PaddyRiceWaterAbstractionFromSurfaceWaterM3"]
        paddy_mm = paddy_m3 * p["M3toMM"]
        out["consumption_required_domestic_MM_month"] = s["consumption_required_domestic_MM_month"] + d["consumption_required_domestic_MM"]
        out["consumption_required_energy_MM_month"] = s["consumption_required_energy_MM_month"] + d["consumption_required_energy_MM"]
        out["consumption_required_industry_MM_month"] = s["consumption_required_industry_MM_month"] + d["consumption_required_industry_MM"]
        out["consumption_required_livestock_MM_month"] = s["consumption_required_livestock_MM_month"] + d["consumption_required_livestock_MM"]
        out["consumption_required_irrigation_MM_month"] = s["consumption_required_irrigation_MM_month"] + d["consumption_SwGw_required_irrigation_MM"] + paddy_mm
        out["consumption_actual_irrigation_MM_month"] = s["consumption_actual_irrigation_MM_month"] + d["consumption_actual_irrigation_MM"] + paddy_mm
        out["abstraction_allSources_required_irrigation_M3Month"] = s["abstraction_allSources_required_irrigation_M3Month"] + d["abstraction_required_irrigation_M3"] + paddy_m3
        out["abstraction_allSources_actual_irrigation_M3Month"] = s["abstraction_allSources_actual_irrigation_M3Month"] + d["abstraction_SwGw_actual_irrigation_M3"] + d["abstraction_Reuse_irrigation_M3"] + paddy_m3
        out["abstraction_SwGw_required_irrigation_M3Month"] = s["abstraction_SwGw_required_irrigation_M3Month"] + d["abstraction_SwGw_required_irrigation_M3"] + paddy_m3
        out["abstraction_SwGw_actual_irrigation_M3Month"] = s["abstraction_SwGw_actual_irrigation_M3Month"] + d["abstraction_SwGw_actual_irrigation_M3"] + paddy_m3

    # monthend block (indicatorcalc.py:120-198); computed every step from
    # the running accumulators — identical to the reference at monthend,
    # and all consumers are monthly-gated outputs
    region_internal = regional(out["MonthInternalFlowM3"])
    # external inflow at water-region inflow points: areatotal over the
    # region of upstream(LddStructuresKinematic, MonthDisM3) at the
    # inflow points (indicatorcalc.py:139-141); UpstreamSumMonthDis is
    # the upstream-neighbour sum over the PRE-structure-cut downstruct
    ups_dis = d["UpstreamSumMonthDis"]
    inflow_points = p["WaterRegionInflowPoints"]
    region_external = regional(jnp.where(inflow_points, ups_dis, 0.0))
    region_demand_all = regional(out["MonthAbstractionRequiredAllSourcesM3"])
    region_abs_swgw = regional(out["MonthAbstractionRequiredSurfaceGroundWaterM3"])
    region_abs_sw = regional(out["MonthAbstractionRequiredSurfaceWaterM3"])
    region_cons_req = regional(out["MonthConsumptionRequiredM3"])
    region_cons_act = regional(out["MonthConsumptionActualM3"])
    out["RegionMonthExternalInflowM3"] = region_external
    out["RegionMonthInternalFlowM3"] = region_internal
    out["RegionMonthAbstractionRequiredAllSourcesM3"] = region_demand_all
    out["RegionMonthAbstractionRequiredSurfaceGroundWaterM3"] = region_abs_swgw
    out["RegionMonthAbstractionRequiredSurfaceWaterM3"] = region_abs_sw
    out["RegionMonthConsumptionRequiredM3"] = region_cons_req
    out["RegionMonthConsumptionActualM3"] = region_cons_act
    if cfg.simulate_lakes and cfg.simulate_reservoirs:
        # indicatorcalc.py:126-131
        out["RegionMonthReservoirAndLakeStorageM3"] = regional(d["ReservoirStorageM3"] + d["LakeStorageM3"])
        out["RegionMonthWaterAbstractedfromLakesReservoirsM3"] = regional(out["MonthWaterAbstractedfromLakesReservoirsM3"])

    upstream_inflow = region_external
    local_fresh = region_internal
    local_demand = region_demand_all
    remaining = jnp.maximum(local_demand - local_fresh, 0.0)
    upstream_used = jnp.minimum(remaining, upstream_inflow)
    fossil_used = jnp.maximum(remaining - upstream_used, 0.0)
    freshwater_total = upstream_inflow + local_fresh
    avail = freshwater_total > 0
    safe_fresh = jnp.where(avail, freshwater_total, 1.0)
    out["UpstreamInflowM3"] = upstream_inflow
    out["LocalFreshwaterM3"] = local_fresh
    out["LocalTotalWaterDemandM3"] = local_demand
    out["FossilGroundwaterUsedM3"] = fossil_used
    out["WEI_Dem"] = jnp.where(avail, local_demand / safe_fresh, 0.0)
    out["WEI_Abs"] = jnp.where(avail, region_abs_swgw / safe_fresh, 0.0)
    out["WEI_Cns"] = jnp.where(avail, region_cons_req / safe_fresh, 0.0)
    out["WEI_Plus"] = jnp.where(avail, region_cons_act / safe_fresh, 0.0)
    # the '+1' denominators are the reference's own guards
    # (indicatorcalc.py:167-185)
    out["WaterSustainabilityIndex"] = jnp.where(local_demand > 0, fossil_used / (local_demand + 1), 0.0)
    out["WaterDependencyIndex"] = jnp.where(local_demand > 0, upstream_used / (local_demand + 1), 0.0)
    out["WaterSecurityIndex"] = jnp.where(upstream_inflow > 0, upstream_used / (upstream_inflow + 1), 0.0)
    pop = p["RegionPopulation"]
    out["FalkenmarkM3Capita1"] = jnp.where(pop > 0, region_internal * 12 / pop, 0.0)
    out["FalkenmarkM3Capita2"] = jnp.where(pop > 0, local_fresh * 12 / pop, 0.0)
    out["FalkenmarkM3Capita3"] = jnp.where(pop > 0, freshwater_total * 12 / pop, 0.0)
    out["UpstreamInflowUsedM3"] = upstream_used

    # sectoral regional sums (indicatorcalc.py:187-198). Quirk preserved:
    # the domestic sum keeps MM units (the reference omits MMtoM3 there)
    if cfg.rep_water_use:
        mmto_m3 = p["MMtoM3"]
        out["consumption_required_domestic_M3MonthRegion"] = regional(out["consumption_required_domestic_MM_month"])
        out["consumption_required_energy_M3MonthRegion"] = regional(out["consumption_required_energy_MM_month"] * mmto_m3)
        out["consumption_required_industry_M3MonthRegion"] = regional(out["consumption_required_industry_MM_month"] * mmto_m3)
        out["consumption_required_livestock_M3MonthRegion"] = regional(out["consumption_required_livestock_MM_month"] * mmto_m3)
        out["consumption_required_irrigation_M3MonthRegion"] = regional(out["consumption_required_irrigation_MM_month"] * mmto_m3)
        out["consumption_actual_irrigation_M3MonthRegion"] = regional(out["consumption_actual_irrigation_MM_month"] * mmto_m3)
        out["abstraction_allSources_required_irrigation_M3MonthRegion"] = regional(out["abstraction_allSources_required_irrigation_M3Month"])
        out["abstraction_allSources_actual_irrigation_M3MonthRegion"] = regional(out["abstraction_allSources_actual_irrigation_M3Month"])
        out["abstraction_SwGw_required_irrigation_M3MonthRegion"] = regional(out["abstraction_SwGw_required_irrigation_M3Month"])
        out["abstraction_SwGw_actual_irrigation_M3MonthRegion"] = regional(out["abstraction_SwGw_actual_irrigation_M3Month"])
    return out


def groundwater_smooth(cfg, p, lz, land_rows, land_cols, nrows, ncols):
    """LZ smoothing via windowtotal over groundwater bodies
    (waterabstraction.py:602-628), fully on device.

    land_rows/land_cols: static per-pixel 2-D coordinates. The square
    window sum is computed with a summed-area table (two cumsums).

    Exactness note: PCRaster windowtotal weights cells partially covered
    by the window edge by area fraction; a whole-cell SAT matches it
    exactly for odd LZSmoothRange (the shipped configs use 5) and
    approximates even ranges by a floor/ceil whole-cell window."""
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
    # average-error correction: the reference's groundwaterCatch is
    # boolean(GroundwaterBodies*Catchments) (waterabstraction.py:145-146),
    # i.e. ONE area spanning every groundwater-body cell — areaaverage
    # there is a single global mean of (LZSmooth - LZ) over gw cells,
    # subtracted on gw cells only (cover(diffCorr, 0) elsewhere)
    in_area = p["GroundwaterCatch"] != 0      # == is_gw when catchments>0
    diff_sum = jnp.sum(jnp.where(in_area, smooth - lz, 0.0))
    n_area = jnp.sum(in_area.astype(lz.dtype))
    corr = 0.1 * jnp.where(n_area > 0, diff_sum / jnp.where(n_area > 0, n_area, 1.0), 0.0)
    return jnp.where(in_area, lz_new - corr, lz_new)
