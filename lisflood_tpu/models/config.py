"""Static model configuration — the trace-time specialization surface.

Every boolean here selects a physics/code path inside the jitted step
function, mirroring the reference's option-gated module dispatch
(Lisflood_dynamic.py:38-268). The dataclass is frozen/hashable so a given
configuration compiles exactly one executable.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ModelConfig:
    # physics options
    init_lisflood: bool = False
    init_lisflood_without_split: bool = False
    split_routing: bool = False
    simulate_lakes: bool = False
    simulate_reservoirs: bool = False
    simulate_polders: bool = False
    open_water_evapo: bool = False
    var_fraction_water: bool = False
    rice_irrigation: bool = False
    water_use: bool = False
    water_use_region: bool = False
    transient_water_demand: bool = False
    transient_landuse: bool = False
    water_demand_ave_year: bool = False
    drained_irrigation: bool = False
    groundwater_smooth: bool = False
    trans_loss: bool = False
    inflow: bool = False
    indicator: bool = False
    simulate_water_levels: bool = False
    simulate_pf: bool = False
    temperature_in_kelvin: bool = False
    rep_mbts: bool = False
    rep_average_dis: bool = False
    rep_total_water_storage: bool = False
    rep_water_use: bool = False
    # kinematic-wave implementation: 'packed' (scatter-free windowed sweep,
    # default), 'sharded' (subcatchment-partitioned packed sweep with
    # explicit cut-edge exchange, for device meshes), or 'scan'
    # (gather/scatter reference path)
    routing_kernel: str = "packed"
    # logical shard count for routing_kernel='sharded' (fixed independent
    # of the device count so results are bit-identical across meshes)
    num_shards: int = 1
    # sub-step loop schedule: 'auto' (default — fastest equivalence-gated
    # path for the configuration: the fused Mosaic kernel on a float32 TPU
    # run, else the wavefront-pipelined diagonal loop, else the sequential
    # loop), 'substeps' (sequential NoRoutSteps x chunks scan), 'diagonal'
    # (wavefront-pipelined over substep+chunk diagonals, ~NoRoutSteps x
    # fewer sequential iterations), or 'pallas' (fused Mosaic kernel)
    routing_pipeline: str = "auto"
    # open-water evaporation chain formulation: the 2-D LDD stencil form
    # (ops/physics.scatter_down_stencil) measured +27 ms/step SLOWER than
    # the segment-sum scatter inside the full continental step graph (XLA
    # scheduling interaction) but 7% FASTER on the latency-bound ETRS89
    # catchment (2.66 vs 2.85 ms/step) — 'auto' (default) picks the
    # stencil on small grids only; the EvaStencil binding forces it
    # (True/False). Both forms are equivalence-gated (test_graph.py).
    eva_stencil: object = "auto"
    # discretisation
    no_rout_steps: int = 24
    dt_sec: float = 86400.0
    # structure counts (static shapes)
    num_lakes: int = 0
    num_reservoirs: int = 0
    num_catchments: int = 0
    num_wregions: int = 0
    num_pixels: int = 0
    grid_rows: int = 0
    grid_cols: int = 0
    max_no_eva: int = 5
    # soil Courant sub-stepping cap (masked loop bound); per-pixel counts are
    # data-dependent in the reference (soilloop.py:249); the loop runs to the
    # runtime max via lax.while_loop, this is only a hard safety cap
    max_soil_substeps: int = 100

    @property
    def use_eva_stencil(self):
        # 'auto': the stencil wins only where kernel-launch latency
        # dominates (small grids on an accelerator — measured 2.66 vs
        # 2.85 ms/step on ETRS89-TPU, +27 ms/step LOSS at continental
        # scale); the crossover is well above the ETRS89 scale and well
        # below continental — 2e5 pixels splits them. CPU runs (where the
        # f64 golden artifacts are pinned) keep the segment-sum form so
        # the 1e-12 golden gates stay summation-order-exact.
        if self.eva_stencil == "auto":
            if not (0 < self.num_pixels <= 200_000):
                return False
            import jax
            return jax.default_backend() != "cpu"
        return bool(self.eva_stencil)

    @property
    def dt_day(self):
        return self.dt_sec / 86400.0

    @property
    def dt_routing(self):
        return self.dt_sec / self.no_rout_steps

    @classmethod
    def from_settings(cls, settings, **overrides):
        o = settings.options
        dt_sec = float(settings.binding["DtSec"])
        dt_sec_channel = float(settings.binding["DtSecChannel"])
        no_rout = max(1, int(round(dt_sec / dt_sec_channel)))
        if o.get("InitLisflood"):
            no_rout = 1
        kw = dict(
            init_lisflood=bool(o.get("InitLisflood")),
            init_lisflood_without_split=bool(o.get("InitLisfloodwithoutSplit")),
            split_routing=bool(o.get("SplitRouting")),
            simulate_lakes=bool(o.get("simulateLakes")),
            simulate_reservoirs=bool(o.get("simulateReservoirs")),
            simulate_polders=bool(o.get("simulatePolders")),
            open_water_evapo=bool(o.get("openwaterevapo")),
            var_fraction_water=bool(o.get("varfractionwater")),
            rice_irrigation=bool(o.get("riceIrrigation")),
            water_use=bool(o.get("wateruse")),
            water_use_region=bool(o.get("wateruseRegion")),
            transient_water_demand=bool(o.get("TransientWaterDemandChange")),
            transient_landuse=bool(o.get("TransientLandUseChange")),
            water_demand_ave_year=bool(o.get("useWaterDemandAveYear")),
            drained_irrigation=bool(o.get("drainedIrrigation")),
            groundwater_smooth=bool(o.get("groundwaterSmooth")),
            trans_loss=bool(o.get("TransLoss")),
            inflow=bool(o.get("inflow")),
            indicator=bool(o.get("indicator")),
            simulate_water_levels=bool(o.get("simulateWaterLevels")),
            simulate_pf=bool(o.get("simulatePF")),
            temperature_in_kelvin=bool(o.get("TemperatureInKelvin")),
            rep_mbts=bool(o.get("repMBTs")),
            rep_average_dis=bool(o.get("repAverageDis")),
            rep_total_water_storage=bool(o.get("repTotalWaterStorageMaps")),
            rep_water_use=bool(o.get("repWaterUse")),
            routing_kernel=str(settings.binding.get("RoutingKernel", "packed")),
            num_shards=int(settings.binding.get("RoutingShards", 4)
                           if str(settings.binding.get("RoutingKernel", "packed")) == "sharded"
                           else 1),
            routing_pipeline=str(settings.binding.get("RoutingPipeline", "auto")),
            eva_stencil={"True": True, "False": False}.get(
                str(settings.binding.get("EvaStencil", "auto")), "auto"),
            no_rout_steps=no_rout,
            dt_sec=dt_sec,
        )
        kw.update(overrides)
        return cls(**kw)
