"""Soil-column Courant sub-stepping gates (ops/physics.soil_columns_step).

The compact-tail formulation (sub-step 0 loop-free over the grid, rare
no_subs>1 lanes iterated in a static-size compacted buffer, whole-grid
masked loop only as overflow fallback) must reproduce the reference's
per-pixel data-dependent loop (soilloop.py:213-321) exactly. The oracle
here is a literal NumPy per-lane transcription of that loop.
"""
import dataclasses

import numpy as np
import pytest


def _numpy_soil_oracle(cfg, p, s, d):
    """Per-lane NumPy transcription of soilloop.py:137-321 (bare-soil
    evaporation + Xinanjiang infiltration + Courant-sub-stepped Darcy
    seepage); returns the three accumulated seepage fields."""
    f = lambda k: np.asarray(p[k], np.float64)
    dt_day = cfg.dt_day
    rain_plus_melt = np.asarray(d["Rain"]) + np.asarray(d["SnowMelt"])
    w1a = np.asarray(s["W1a"], np.float64).copy()
    w1b = np.asarray(s["W1b"], np.float64).copy()
    w2 = np.asarray(s["W2"], np.float64).copy()
    dslr = np.asarray(s["DSLR"], np.float64).copy()
    frozen = np.asarray(d["isFrozenSoil"])[None]

    avail_inf = np.maximum(rain_plus_melt[None] + np.asarray(d["LeafDrainage"])
                           - np.asarray(d["Interception"]), 0.0)
    dslr = np.where(avail_inf > f("AvWaterThreshold"), 1.0, dslr + dt_day)
    es_max = np.asarray(d["ESRef"])[None] * np.asarray(d["LAITerm"])
    es_act = es_max * (np.sqrt(dslr) - np.sqrt(dslr - 1))
    w1 = w1a + w1b
    es_act = np.maximum(np.minimum(es_act, w1 - f("WRes1")), 0.0)
    supply1a = w1a - f("WRes1a")
    es1a = np.minimum(es_act, supply1a)
    es1b = np.maximum(es_act - supply1a, 0.0)
    w1a = np.where(frozen, w1a, np.maximum(w1a - es1a, f("WRes1a")))
    w1b = np.where(frozen, w1b, np.maximum(w1b - es1b, f("WRes1b")))
    w1 = w1a + w1b

    rel_sat1 = np.where(f("PoreSpaceNotZero1a"), np.minimum(w1 / f("WS1"), 1.0), 0.0)
    sat_fraction = 1.0 - (1.0 - rel_sat1) ** f("b_Xinanjiang")[None]
    inf_pot = np.where(frozen, 0.0,
                       f("StoreMaxPervious") * (1 - sat_fraction) ** f("PowerInfPot")[None] * dt_day)
    pref_flow = (rel_sat1 ** f("PowerPrefFlow")[None]) * avail_inf
    avail_inf = avail_inf - pref_flow
    infiltration = np.maximum(np.minimum(avail_inf, inf_pot), 0.0)
    test_w1a = w1a + infiltration
    w1a = np.minimum(f("WS1a"), test_w1a)
    w1b = w1b + np.maximum(test_w1a - f("WS1a"), 0.0)

    def k_of(w, layer):
        psnz = f("PoreSpaceNotZero" + layer).astype(bool)
        wres, ws = f("WRes" + layer), f("WS" + layer)
        sat = np.where(psnz, np.clip((w - wres) / np.where(psnz, ws - wres, 1.0), 0, 1), 0.0)
        m, invm = f("GenuM" + layer), f("GenuInvM" + layer)
        return f("KSat" + layer) * np.sqrt(sat) * (1 - (1 - sat ** invm) ** m) ** 2

    k1a0, k1b0, k20 = k_of(w1a, "1a"), k_of(w1b, "1b"), k_of(w2, "2")
    aw1a, aw1b, aw2 = w1a - f("WRes1a"), w1b - f("WRes1b"), w2 - f("WRes2")
    cdiv = lambda k, aw: np.where(aw == 0, 0.0, k * dt_day / np.where(aw == 0, 1.0, aw))
    courant = np.maximum.reduce([cdiv(k1a0, aw1a), cdiv(k1b0, aw1b), cdiv(k20, aw2)])
    no_subs = np.minimum(np.maximum(1, np.ceil(courant / float(p["CourantCrit"]))).astype(int),
                         cfg.max_soil_substeps)
    dt_sub = dt_day / no_subs
    cap1 = f("WS1b") - w1b
    cap2 = f("WS2") - w2

    shp = w1a.shape
    seep_a = np.zeros(shp)
    seep_b = np.zeros(shp)
    seep_gw = np.zeros(shp)
    # the reference's per-pixel loop, literally (soilloop.py:237-321)
    for lane in np.ndindex(*shp):
        a, b, c = aw1a[lane], aw1b[lane], aw2[lane]
        c1, c2 = cap1[lane], cap2[lane]
        dsub = dt_sub[lane]
        for i in range(no_subs[lane]):
            if i == 0:
                k1a, k1b, k2 = k1a0[lane], k1b0[lane], k20[lane]
            else:
                one = lambda w_, layer: float(k_of(
                    np.full(shp, w_), layer)[lane])
                k1a = one(a + f("WRes1a")[lane], "1a")
                k1b = one(b + f("WRes1b")[lane], "1b")
                k2 = one(c + f("WRes2")[lane], "2")
            sa = min(k1a * dsub, c1)
            sb = min(k1b * dsub, c2)
            sg = min(k2 * dsub, c)
            a -= sa
            b += sa - sb
            c += sb - sg
            c1 = f("WS1b")[lane] - (b + f("WRes1b")[lane])
            c2 = f("WS2")[lane] - (c + f("WRes2")[lane])
            seep_a[lane] += sa
            seep_b[lane] += sb
            seep_gw[lane] += sg
    seep_a = np.where(frozen, 0.0, seep_a)
    seep_b = np.where(frozen, 0.0, seep_b)
    seep_gw = np.where(frozen, 0.0, seep_gw)
    return seep_a, seep_b, seep_gw, no_subs


def _soil_setup(nrows, ncols, seed=3, wet=0.98, ksat_boost=None):
    import jax.numpy as jnp
    from lisflood_tpu.models.synthetic import build_synthetic_model
    from lisflood_tpu.models.config import ModelConfig  # noqa: F401

    cfg, params, state, aux = build_synthetic_model(nrows=nrows, ncols=ncols)
    rng = np.random.default_rng(seed)
    P = cfg.num_pixels
    # near-saturated layers + boosted conductivity force multi-sub-step lanes
    for layer, lo in (("1a", wet), ("1b", wet), ("2", wet)):
        ws, wres = params["WS" + layer], params["WRes" + layer]
        state_key = {"1a": "W1a", "1b": "W1b", "2": "W2"}[layer]
        state[state_key] = wres + (ws - wres) * rng.uniform(lo, 1.0, (3, P))
        if ksat_boost is not None:
            params["KSat" + layer] = params["KSat" + layer] * ksat_boost
    d = {
        "Rain": rng.uniform(0, 5, P), "SnowMelt": rng.uniform(0, 2, P),
        "LeafDrainage": rng.uniform(0, 1, (3, P)),
        "Interception": rng.uniform(0, 0.5, (3, P)),
        "ESRef": rng.uniform(0, 3, P), "LAITerm": rng.uniform(0.1, 1, (3, P)),
        "isFrozenSoil": rng.uniform(0, 1, P) < 0.1,
    }
    return cfg, params, state, aux, d


def _run_soil(cfg, params, state, aux, d):
    import jax.numpy as jnp
    from lisflood_tpu.models.step import build_step
    from lisflood_tpu.ops.physics import soil_columns_step

    step, p = build_step(cfg, params, aux, dtype=jnp.float64)
    s = {k: jnp.asarray(v) for k, v in state.items()}
    dd = {k: jnp.asarray(v) for k, v in d.items()}
    return soil_columns_step(cfg, p, s, dd)


def test_soil_tail_matches_perlane_oracle():
    """Compacted-tail seepage == the reference's per-lane loop, with a
    meaningful share of lanes needing >1 sub-step."""
    cfg, params, state, aux, d = _soil_setup(8, 8, ksat_boost=8.0)
    out = _run_soil(cfg, params, state, aux, d)
    sa, sb, sg, ns = _numpy_soil_oracle(cfg, params, state, d)
    assert (ns > 1).sum() >= 10, "setup must force multi-sub-step lanes"
    for name, ref in (("SeepTopToSubA", sa), ("SeepTopToSubB", sb), ("SeepSubToGW", sg)):
        got = np.asarray(out[name])
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9, err_msg=name)
    assert not bool(out["SoilCourantCapHit"])


def test_soil_overflow_fallback_matches_oracle():
    """More multi-sub-step lanes than the compaction budget M: the
    whole-grid fallback must kick in and still match the oracle."""
    # 24x24 -> 1728 lanes, M = min(1728, max(1024, 27)) = 1024; drive
    # (almost) every lane to multi-sub-step so n_multi > M
    cfg, params, state, aux, d = _soil_setup(24, 24, wet=0.995, ksat_boost=40.0)
    d["isFrozenSoil"][:] = False
    out = _run_soil(cfg, params, state, aux, d)
    sa, sb, sg, ns = _numpy_soil_oracle(cfg, params, state, d)
    n_lanes = ns.size
    M = min(n_lanes, max(1024, n_lanes // 64))
    assert (ns > 1).sum() > M, "setup must overflow the compaction budget"
    for name, ref in (("SeepTopToSubA", sa), ("SeepTopToSubB", sb), ("SeepSubToGW", sg)):
        got = np.asarray(out[name])
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9, err_msg=name)


def test_soil_cap_hit_diagnostic():
    """A binding max_soil_substeps cap raises the SoilCourantCapHit flag
    (and the truncated physics still matches the oracle under the same
    cap — the cap applies identically in both)."""
    cfg, params, state, aux, d = _soil_setup(8, 8, wet=0.995, ksat_boost=40.0)
    cfg = dataclasses.replace(cfg, max_soil_substeps=2)
    out = _run_soil(cfg, params, state, aux, d)
    assert bool(out["SoilCourantCapHit"])
    sa, sb, sg, ns = _numpy_soil_oracle(cfg, params, state, d)
    assert ns.max() == 2
    np.testing.assert_allclose(np.asarray(out["SeepTopToSubA"]), sa,
                               rtol=1e-9, atol=1e-9)
