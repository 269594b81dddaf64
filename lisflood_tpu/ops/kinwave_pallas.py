"""Pallas TPU kernel: the channel-routing sub-step loop as one Mosaic
program, including the lake / reservoir structure chains.

Both XLA formulations of the sub-step loop (sequential and chunk-major
pipelined, ops/routing_ops.py) bottom out at per-op dispatch overhead:
the loop body is ~30 small (L, C) VPU ops per (chunk, sub-step), ~2M op
executions per continental model step. This kernel fuses the whole loop:
grid = chunks (sequential on-core), the T sub-steps run as an in-kernel
unrolled loop, and every intermediate — the rolling inflow window, the
one-hot scatter operand, the collected sub-step discharges — lives in
VMEM. The scatter matmul (T*L, C) x (C, W*C) hits the MXU with T*L rows
and its selection operand never touches HBM.

Structures (lakes.py:199-263, reservoir.py:173-303): because the packed
schedule chunks every structure cell strictly AFTER its feeder pixels
(graph/ldd.py build_schedule order_graph; asserted in
models/step.py packed_routing_params), a structure's per-sub-step inflow
buffer is complete before its owner chunk runs. The whole T-deep
Modified-Puls / rule-curve chain therefore hoists OUT of the routing
t-loop: it runs once per owner chunk as (1, NLp) VPU math over a
lane-padded structure axis, its T outflows scatter into the chunk's
sideflow rows with ONE (T, NLp) x (NLp, C) MXU matmul, and feeder chunks
stage their T discharges into the inflow buffers with one
(T, C) x (C, NLp) matmul. Chunks that neither own nor feed a structure
skip all of it via pl.when on SMEM per-chunk flags — structure cost is
O(#structure-adjacent chunks), not O(n_chunks).

Scope: split and single routing with the elementwise sideflow terms
(open-water evaporation, water use, inflow ramp, transmission loss) and
lakes/reservoirs. float32 only (Mosaic has no f64): this is the TPU
production/bench precision; the f64 parity path stays on the XLA kernels.

Layout contract: ops/kinwave_packed.PackedSchedule (chunk-major packed
position space). Per-pixel numerics identical to the sequential path
(same Newton, same clamp order); gated by tests/test_pallas_routing.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kinwave_packed import NEWTON_TOL, _newton_unrolled, _newton_v

# temporary A/B tuning hooks (scripts/bench_kernel.py); production defaults
import os as _os
_PRECS = {"default": jax.lax.Precision.DEFAULT, "high": jax.lax.Precision.HIGH,
          "highest": jax.lax.Precision.HIGHEST}
_TUNE_PREC = _PRECS[_os.environ.get("KINP_PREC", "highest")]
_TUNE_NEWTON = int(_os.environ.get("KINP_NEWTON", "0")) or None
_TUNE_POLY = _os.environ.get("KINP_POLY", "1") == "1"


def _rnd(n, m):
    return ((n + m - 1) // m) * m


def _dot_scatter(lhs, onehot, dtype):
    """f32-exact scatter matmul against a 0/1 selection operand in 3 MXU
    passes instead of Precision.HIGHEST's 6.

    The one-hot rhs is exactly representable in bf16, so splitting only
    the lhs into three bf16 terms (8+8+8 = the full 24-bit f32 mantissa;
    bf16 shares f32's exponent range, making the residuals exact) yields
    exact per-product values under DEFAULT (bf16 in, f32 accumulate) —
    the 6-pass lhs x rhs cross-term decomposition is redundant when one
    side is exact. Measured ~5 ms/step on the continental grid."""
    t0 = lhs.astype(jnp.bfloat16).astype(dtype)
    r1 = lhs - t0
    t1 = r1.astype(jnp.bfloat16).astype(dtype)
    t2 = r1 - t1
    dot = lambda a: jax.lax.dot(a, onehot, precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=dtype)
    return dot(t0) + dot(t1) + dot(t2)


def build_substep_pallas(cfg, ps, beta, has, interpret=False):
    """Returns `run(xs) -> ys` executing the full sub-step loop.

    `xs`: dict of (n_chunks, C) float32 chunk-major operands (see
    routing_ops.channel_routing_pipelined for the naming) plus, when
    has['lakes']/has['reservoirs'], the structure operands documented in
    routing_ops.channel_routing_pallas;
    `ys`: dict of (n_chunks, C) outputs (final-sub-step state rows plus
    per-chunk accumulators) and (1, NLp)/(1, NRp) structure-state rows."""
    T = cfg.no_rout_steps
    C = ps.chunk
    n_chunks = ps.n_chunks
    W = ps.window
    split = bool(has.get("split"))
    lakes = bool(has.get("lakes"))
    reservoirs = bool(has.get("reservoirs"))
    eva_chain = bool(has.get("eva_chain"))
    E = int(cfg.max_no_eva) if eva_chain else 0
    L = 2 if split else 1
    beta = float(beta)
    # beta = 3/5 (every LISFLOOD configuration: the reference's settings
    # all bind beta=0.6, routing.py:66) dispatches the polynomial v-space
    # solver — no transcendentals anywhere in the t-loop; any other beta
    # keeps the generic q-space Newton
    poly = abs(beta - 0.6) < 1e-9 and _TUNE_POLY
    dt_r = float(cfg.dt_routing)
    dtype = jnp.float32
    NLp = _rnd(max(cfg.num_lakes, 1), 128) if lakes else 0
    NRp = _rnd(max(cfg.num_reservoirs, 1), 128) if reservoirs else 0
    Tp = _rnd(T + 1, 8)
    Ep = _rnd(max(E, 1), 8)

    in_names = ["ToChan", "dx", "adx1", "alpha1", "ischan", "dl",
                "q1_0", "m31_0", "chanq_0"]
    if eva_chain:
        in_names += ["ev_up0", "ev_dl"]
    if split:
        in_names += ["adx2", "alpha2", "qlimit", "m3limit", "chan2m3start",
                     "chan2qstart", "q2_0", "m32_0"]
    for k in ("eva", "wuse", "qin_old", "qdelta", "uptrans", "tp1", "tp2", "tsub"):
        if has.get(k):
            in_names.append(k)

    # structure operands: per-chunk blocked masks/lanes/feeders, SMEM
    # skip-flags, and (1, Np) parameter/state rows (constant index maps)
    lake_chunked = ["lk_on", "lk_lane", "lk_fee_lane", "lk_fee_w"]
    lake_flags = ["lk_own_flag", "lk_fee_flag"]
    lake_rows = ["lk_factor", "lk_factorsqr", "lk_area",
                 "lk_st0", "lk_inold0", "lk_out0", "lk_bal0", "lk_buf0"]
    res_chunked = ["rs_on", "rs_lane", "rs_fee_lane", "rs_fee_w"]
    res_flags = ["rs_own_flag", "rs_fee_flag"]
    res_rows = ["rs_tot", "rs_cons", "rs_norm", "rs_flood", "rs_nfl",
                "rs_nondam", "rs_normout", "rs_minout", "rs_do", "rs_dln",
                "rs_dnfl", "rs_st0", "rs_fill0", "rs_buf0"]
    if lakes:
        in_names += lake_chunked + lake_flags + lake_rows
    if reservoirs:
        in_names += res_chunked + res_flags + res_rows

    out_names = ["q1", "m31", "chanq", "sumdis"]
    if split:
        out_names += ["q2", "m32", "cross2", "side1"]
    if has.get("uptrans"):
        out_names.append("trans")
    if eva_chain:
        out_names.append("ev_add")
    lake_outs = ["lk_st", "lk_inold", "lk_in", "lk_out", "lk_bal",
                 "lk_level", "lk_sumin", "lk_sumout"]
    res_outs = ["rs_st", "rs_fill", "rs_sumin", "rs_sumout"]
    if lakes:
        out_names += lake_outs
    if reservoirs:
        out_names += res_outs

    import sys
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)     # deep trace: B-unrolled chunk chain
    # chunks per grid step: >=8 (sublane tiling) AND a multiple of the
    # rotating-window modulus W+1, so every chunk's window SLOT index
    # (c mod (W+1)) is a STATIC value of its in-block position b — the
    # rolling inflow window then needs NO data movement per chunk (the
    # round-3 kernel's double-buffered shift copied 2 x (T*L, W*C) VMEM
    # per chunk, measured as the largest in-kernel cost)
    import math
    S = W + 1
    B = 8 * S // math.gcd(8, S)
    B = B * int(_os.environ.get("KINP_BMULT", "1"))
    n_blocks = (n_chunks + B - 1) // B

    def kernel(*refs):
        ins = dict(zip(in_names, refs[: len(in_names)]))
        outs = dict(zip(out_names, refs[len(in_names): len(in_names) + len(out_names)]))
        scratch = list(refs[len(in_names) + len(out_names):])
        win, Q = scratch[:2]
        scratch = scratch[2:]
        if eva_chain:
            ev_win = scratch.pop(0)          # (Ep, S*C) hop-arrival window
            Q_ev = scratch.pop(0)            # (Ep, C) hop transfer rows
        if lakes or reservoirs:
            chanq_buf = scratch.pop(0)       # (Tp, C) per-chunk sub-step chanq
            side_add = scratch.pop(0)        # (Tp, C) structure sideflow rows
        if lakes:
            buf_lake = scratch.pop(0)        # (Tp, NLp) inflow buffer
            qout_lake = scratch.pop(0)       # (Tp, NLp) owner-chunk outflows
        if reservoirs:
            buf_res = scratch.pop(0)
            qout_res = scratch.pop(0)

        @pl.when(pl.program_id(0) == 0)
        def _():
            win[:] = jnp.zeros_like(win)
            if eva_chain:
                ev_win[:] = jnp.zeros_like(ev_win)
                Q_ev[:] = jnp.zeros_like(Q_ev)
            if lakes:
                buf_lake[:] = jnp.zeros_like(buf_lake)
                buf_lake[0:1, :] = ins["lk_buf0"][:]
                for name in ("lk_st", "lk_inold", "lk_out", "lk_bal"):
                    outs[name][:] = ins[name + "0"][:]
                outs["lk_in"][:] = jnp.zeros((1, NLp), dtype)
                outs["lk_level"][:] = jnp.zeros((1, NLp), dtype)
                outs["lk_sumin"][:] = jnp.zeros((1, NLp), dtype)
                outs["lk_sumout"][:] = jnp.zeros((1, NLp), dtype)
            if reservoirs:
                buf_res[:] = jnp.zeros_like(buf_res)
                buf_res[0:1, :] = ins["rs_buf0"][:]
                outs["rs_st"][:] = ins["rs_st0"][:]
                outs["rs_fill"][:] = ins["rs_fill0"][:]
                outs["rs_sumin"][:] = jnp.zeros((1, NRp), dtype)
                outs["rs_sumout"][:] = jnp.zeros((1, NRp), dtype)

        for b in range(B):
            # keep every row access 2-D (1, C): 1-D sublane-indexed
            # vector reads are a known Mosaic hazard
            x = {k: ins[k][b:b + 1] for k in in_names
                 if k not in ("dl",) and not k.startswith(("lk_", "rs_"))}
            dl = ins["dl"][b:b + 1][0]
            inv_dx = 1.0 / x["dx"]
            # rotating window slot of this chunk — STATIC because
            # B % (W+1) == 0 makes (pid*B + b) % (W+1) == b % (W+1)
            sc = b % S

            # ---- open-water evaporation chain (evapowater.py:123-159):
            # isomorphic to the routing sub-step loop — per-chunk
            # absorption math, downstream transfers ride their own
            # rotating window (eva edges are a subset of the pre-cut
            # graph, so they fit the same W-chunk windows) ----
            if eva_chain:
                ev_dl = ins["ev_dl"][b:b + 1][0]
                chan_m = x["m31_0"]
                chan_left = chan_m * 0.1
                eva_add = jnp.zeros((1, C), dtype)
                for t in range(E):
                    up = (x["ev_up0"] if t == 0
                          else ev_win[t:t + 1, sc * C:(sc + 1) * C])
                    chan_help = jnp.maximum(chan_m - up, chan_left)
                    ev_it = jnp.maximum(up - (chan_m - chan_help), 0.0)
                    chan_m = chan_help
                    eva_add = eva_add + up - ev_it
                    if t < E - 1:
                        Q_ev[t:t + 1, :] = ev_it
                onehot_e = (ev_dl[:, None] == jax.lax.broadcasted_iota(
                    jnp.int32, (C, W * C), 1)).astype(dtype)
                add_e = _dot_scatter(Q_ev[:], onehot_e, dtype)
                for k in range(W):
                    sk = (b + 1 + k) % S
                    # hop-t transfers arrive for hop t+1 (window row t+1)
                    ev_win[1:E, sk * C:(sk + 1) * C] = (
                        ev_win[1:E, sk * C:(sk + 1) * C]
                        + add_e[0:E - 1, k * C:(k + 1) * C])
                ev_win[:, sc * C:(sc + 1) * C] = jnp.zeros((Ep, C), dtype)
                outs["ev_add"][b:b + 1] = eva_add
                eva_dt = eva_add * (1.0 / T)

            if lakes or reservoirs:
                side_add[:] = jnp.zeros((Tp, C), dtype)

            # ---- structure chains: hoisted ahead of the routing t-loop ----
            # (the inflow buffers were completed by earlier feeder chunks)
            if lakes:
                @pl.when(ins["lk_own_flag"][pl.program_id(0) * B + b] == 1)
                def _():
                    on = ins["lk_on"][b:b + 1]                       # (1, NLp)
                    lane_col = ins["lk_lane"][b * NLp:(b + 1) * NLp]  # (NLp, 1)
                    st = outs["lk_st"][:]
                    inold = outs["lk_inold"][:]
                    outflow = outs["lk_out"][:]
                    bal = outs["lk_bal"][:]
                    inflow_last = outs["lk_in"][:]
                    level = outs["lk_level"][:]
                    sumin = outs["lk_sumin"][:]
                    sumout = outs["lk_sumout"][:]
                    for t in range(T):
                        inflow = buf_lake[t:t + 1, :]
                        # Modified Puls (lakes.py:199-263), mirror of
                        # routing_ops._lake_substep_cc
                        lake_in = (inflow + inold) * 0.5
                        si = st / dt_r - 0.5 * outflow + lake_in
                        out_new = jnp.square(
                            -ins["lk_factor"][:] +
                            jnp.sqrt(ins["lk_factorsqr"][:] + 2.0 * si))
                        q_out_m3 = out_new * dt_r
                        st_new = (si - out_new * 0.5) * dt_r
                        st_new = jnp.where(jnp.isnan(st_new) | (st_new < 0), 0.0, st_new)
                        bal_new = bal + lake_in * dt_r - q_out_m3
                        qout_lake[t:t + 1, :] = jnp.where(on != 0, q_out_m3, 0.0)
                        # masked commit: only lakes owned by this chunk advance
                        sel = lambda a, b_: jnp.where(on != 0, a, b_)
                        inold = sel(inflow, inold)
                        inflow_last = sel(inflow, inflow_last)
                        outflow = sel(out_new, outflow)
                        st = sel(st_new, st)
                        bal = sel(bal_new, bal)
                        level = sel(st_new / ins["lk_area"][:], level)
                        sumin = sel(sumin + inflow * dt_r, sumin)
                        sumout = sel(sumout + q_out_m3, sumout)
                    outs["lk_st"][:] = st
                    outs["lk_inold"][:] = inold
                    outs["lk_in"][:] = inflow_last
                    outs["lk_out"][:] = outflow
                    outs["lk_bal"][:] = bal
                    outs["lk_level"][:] = level
                    outs["lk_sumin"][:] = sumin
                    outs["lk_sumout"][:] = sumout
                    # scatter all T outflows into this chunk's sideflow rows:
                    # row j of the selection operand is one-hot at the owned
                    # lake's lane (lane == C for lakes owned elsewhere)
                    sel_mat = (jax.lax.broadcasted_iota(jnp.int32, (NLp, C), 1)
                               == lane_col).astype(dtype)
                    side_add[0:Tp, :] = side_add[0:Tp, :] + jax.lax.dot(
                        qout_lake[:], sel_mat,
                        precision=_TUNE_PREC,
                        preferred_element_type=dtype)

            if reservoirs:
                @pl.when(ins["rs_own_flag"][pl.program_id(0) * B + b] == 1)
                def _():
                    on = ins["rs_on"][b:b + 1]
                    lane_col = ins["rs_lane"][b * NRp:(b + 1) * NRp]
                    st = outs["rs_st"][:]
                    fill = outs["rs_fill"][:]
                    sumin = outs["rs_sumin"][:]
                    sumout = outs["rs_sumout"][:]
                    inv_day = 1.0 / 86400.0
                    total = ins["rs_tot"][:]
                    for t in range(T):
                        inflow = buf_res[t:t + 1, :]
                        # rule-curve operation (reservoir.py:173-303), mirror
                        # of routing_ops._reservoir_substep_cc
                        q_in_m3 = inflow * dt_r
                        st_new = st + q_in_m3
                        f = st_new / total
                        o1 = jnp.minimum(ins["rs_minout"][:], st_new * inv_day)
                        o2 = (ins["rs_minout"][:] + ins["rs_do"][:]
                              * (f - 2 * ins["rs_cons"][:]) / ins["rs_dln"][:])
                        o3a = ins["rs_normout"][:]
                        o3b = o3a + ((f - ins["rs_nfl"][:]) / ins["rs_dnfl"][:]) * (
                            ins["rs_nondam"][:] - o3a)
                        temp4 = jnp.minimum(ins["rs_nondam"][:],
                                            jnp.maximum(inflow * 1.2, o3a))
                        o4 = jnp.maximum((f - ins["rs_flood"][:] - 0.01) * total * inv_day, temp4)
                        outflow = o1
                        outflow = jnp.where(f > 2 * ins["rs_cons"][:], o2, outflow)
                        outflow = jnp.where(f > ins["rs_norm"][:], o3a, outflow)
                        outflow = jnp.where(f > ins["rs_nfl"][:], o3b, outflow)
                        outflow = jnp.where(f > ins["rs_flood"][:], o4, outflow)
                        temp = jnp.minimum(outflow, jnp.maximum(inflow, o3a))
                        outflow = jnp.where((outflow > 1.2 * inflow) & (outflow > o3a)
                                            & (f < ins["rs_flood"][:]), temp, outflow)
                        q_out_m3 = outflow * dt_r
                        q_out_m3 = jnp.minimum(q_out_m3, st_new)
                        q_out_m3 = jnp.maximum(q_out_m3, st_new - total)
                        st_new = st_new - q_out_m3
                        f = st_new / total
                        f = jnp.where(jnp.isnan(f) | (f < 0), 0.0, f)
                        qout_res[t:t + 1, :] = jnp.where(on != 0, q_out_m3, 0.0)
                        sel = lambda a, b_: jnp.where(on != 0, a, b_)
                        st = sel(st_new, st)
                        fill = sel(f, fill)
                        sumin = sel(sumin + q_in_m3, sumin)
                        sumout = sel(sumout + q_out_m3, sumout)
                    outs["rs_st"][:] = st
                    outs["rs_fill"][:] = fill
                    outs["rs_sumin"][:] = sumin
                    outs["rs_sumout"][:] = sumout
                    sel_mat = (jax.lax.broadcasted_iota(jnp.int32, (NRp, C), 1)
                               == lane_col).astype(dtype)
                    side_add[0:Tp, :] = side_add[0:Tp, :] + jax.lax.dot(
                        qout_res[:], sel_mat,
                        precision=_TUNE_PREC,
                        preferred_element_type=dtype)

            # ---- the routing sub-step loop ----
            # t-invariant hoists (bit-identical: same fp association order
            # as the in-loop originals, just computed once per chunk)
            sf_base = x["ToChan"]
            if has.get("eva"):
                sf_base = sf_base - x["eva"]
            if eva_chain:
                sf_base = sf_base - eva_dt
            if has.get("wuse"):
                sf_base = sf_base - x["wuse"]
            if split:
                adx = jnp.concatenate([x["adx1"], x["adx2"]], axis=0)
                c2q_dx = x["chan2qstart"] * inv_dx
            if poly:
                # carried q^beta values; sub-step 0 seeds from the state
                # (the same pow the generic path computes at t=0)
                qb1_c = x["q1_0"] ** beta
                if split:
                    qb2_c = x["q2_0"] ** beta
                    # lane-2 clamp floor: when M3 clamps to Chan2M3Start the
                    # generic path's round-trip yields these t-invariant
                    # values EXACTLY (same expression of the same params)
                    q2_floor = (x["chan2m3start"] * inv_dx / x["alpha2"]) ** (1 / beta)
                    qb2_floor = x["chan2m3start"] * inv_dx / x["alpha2"]

            def assemble_sideflow(t, chanq, trans_acc):
                sideflow_m3 = sf_base
                if has.get("qin_old"):
                    sideflow_m3 = sideflow_m3 + (x["qin_old"] + float(t + 1) * x["qdelta"]) / T
                if has.get("uptrans"):
                    trans_out = jnp.where(x["uptrans"] != 0,
                                          (chanq ** x["tp2"] - x["tsub"]) ** x["tp1"],
                                          chanq)
                    trans_loss_m3 = (chanq - trans_out) * cfg.dt_routing
                    sideflow_m3 = sideflow_m3 - trans_loss_m3
                    trans_acc = trans_acc + trans_loss_m3
                if lakes or reservoirs:
                    sideflow_m3 = sideflow_m3 + side_add[t:t + 1, :]
                sideflow = jnp.where(x["ischan"] != 0,
                                     sideflow_m3 * inv_dx / cfg.dt_routing, 0.0)
                return jnp.where(jnp.isnan(sideflow), 0.0, sideflow), trans_acc

            def split_assembly(sideflow, m31, m32):
                ratio_den = m31 + m32
                sideflow_ratio = jnp.where(
                    ratio_den > 0, m31 / jnp.where(ratio_den > 0, ratio_den, 1.0), 0.0)
                over_limit = (m31 + m32 - x["chan2m3start"]) > x["m3limit"]
                sideflow1 = jnp.where(over_limit, sideflow_ratio * sideflow, sideflow)
                sideflow1 = jnp.where(jnp.abs(sideflow) < 1e-7, sideflow, sideflow1)
                sideflow2 = sideflow - sideflow1 + c2q_dx
                return sideflow1, sideflow2

            def substep(t, carry):
                # t is a PYTHON int (unrolled loop): all window/Q indices
                # must be static — Mosaic requires 8-aligned dynamic
                # sublane offsets, which t*L is not
                q1, m31, chanq, q2, m32, side1, sumdis, trans_acc = carry
                sideflow, trans_acc = assemble_sideflow(t, chanq, trans_acc)
                if not split:
                    ups = win[t:t + 1, sc * C:(sc + 1) * C]
                    cc_const = ups + x["adx1"] * q1 ** beta + sideflow * x["dx"]
                    q = _newton_unrolled(cc_const, x["adx1"], beta, iters=_TUNE_NEWTON)
                    Q[t:t + 1, :] = q
                    m31 = jnp.maximum(x["dx"] * x["alpha1"] * q ** beta, 0.0)
                    q1 = (m31 * inv_dx / x["alpha1"]) ** (1 / beta)
                    chanq = q1
                else:
                    sideflow1, sideflow2 = split_assembly(sideflow, m31, m32)
                    q_in = jnp.concatenate([q1, q2], axis=0)
                    lat = jnp.concatenate([sideflow1, sideflow2], axis=0) * x["dx"]
                    ups = win[t * L:(t + 1) * L, sc * C:(sc + 1) * C]
                    cc_const = ups + adx * q_in ** beta + lat
                    q = _newton_unrolled(cc_const, adx, beta, iters=_TUNE_NEWTON)
                    Q[t * L:(t + 1) * L, :] = q
                    q1v, q2v = q[0:1], q[1:2]
                    m31 = jnp.maximum(x["dx"] * x["alpha1"] * q1v ** beta, 0.0)
                    q1 = (m31 * inv_dx / x["alpha1"]) ** (1 / beta)
                    m32 = x["dx"] * x["alpha2"] * q2v ** beta
                    m32 = jnp.where(m32 - x["chan2m3start"] < 0.0, x["chan2m3start"], m32)
                    q2 = (m32 * inv_dx / x["alpha2"]) ** (1 / beta)
                    chanq = jnp.maximum(q1 + q2 - x["qlimit"], 0.0)
                    side1 = sideflow1
                if lakes or reservoirs:
                    chanq_buf[t:t + 1, :] = chanq
                sumdis = sumdis + chanq
                return (q1, m31, chanq, q2, m32, side1, sumdis, trans_acc)

            def substep_poly(t, carry):
                # beta = 3/5 specialization: v = q^(1/5) polynomial Newton
                # (kinwave_packed._newton_v) — v^3 = q^0.6 and v^5 = q fall
                # out of the iterate, eliminating every in-loop pow (the
                # generic path spends ~11 transcendental vector-ops per
                # sub-step; this one spends zero)
                qb1, q1, m31, chanq, qb2, q2, m32, side1, sumdis, trans_acc = carry
                sideflow, trans_acc = assemble_sideflow(t, chanq, trans_acc)
                if not split:
                    ups = win[t:t + 1, sc * C:(sc + 1) * C]
                    cc_const = ups + x["adx1"] * qb1 + sideflow * x["dx"]
                    small = cc_const <= NEWTON_TOL
                    v = _newton_v(jnp.where(small, 1.0, cc_const), x["adx1"])
                    v3 = v * v * v
                    qb1 = jnp.where(small, 0.0, v3)
                    q = jnp.where(small, 0.0, v3 * v * v)
                    Q[t:t + 1, :] = q
                    m31 = x["dx"] * x["alpha1"] * qb1
                    q1 = q
                    chanq = q
                else:
                    sideflow1, sideflow2 = split_assembly(sideflow, m31, m32)
                    qb = jnp.concatenate([qb1, qb2], axis=0)
                    lat = jnp.concatenate([sideflow1, sideflow2], axis=0) * x["dx"]
                    ups = win[t * L:(t + 1) * L, sc * C:(sc + 1) * C]
                    cc_const = ups + adx * qb + lat
                    small = cc_const <= NEWTON_TOL
                    v = _newton_v(jnp.where(small, 1.0, cc_const), adx)
                    v3 = v * v * v
                    qb_n = jnp.where(small, 0.0, v3)
                    q = jnp.where(small, 0.0, v3 * v * v)
                    Q[t * L:(t + 1) * L, :] = q
                    qb1, q1 = qb_n[0:1], q[0:1]
                    m31 = x["dx"] * x["alpha1"] * qb1
                    m32r = x["dx"] * x["alpha2"] * qb_n[1:2]
                    clamp2 = m32r - x["chan2m3start"] < 0.0
                    m32 = jnp.where(clamp2, x["chan2m3start"], m32r)
                    q2 = jnp.where(clamp2, q2_floor, q[1:2])
                    qb2 = jnp.where(clamp2, qb2_floor, qb_n[1:2])
                    chanq = jnp.maximum(q1 + q2 - x["qlimit"], 0.0)
                    side1 = sideflow1
                if lakes or reservoirs:
                    chanq_buf[t:t + 1, :] = chanq
                sumdis = sumdis + chanq
                return (qb1, q1, m31, chanq, qb2, q2, m32, side1, sumdis, trans_acc)

            zero = jnp.zeros((1, C), dtype)
            if poly:
                carry = (qb1_c, x["q1_0"], x["m31_0"], x["chanq_0"],
                         qb2_c if split else zero, x["q2_0"] if split else zero,
                         x["m32_0"] if split else zero, zero, zero, zero)
                for t in range(T):
                    carry = substep_poly(t, carry)
                _, q1, m31, chanq, _, q2, m32, side1, sumdis, trans_acc = carry
            else:
                carry = (x["q1_0"], x["m31_0"], x["chanq_0"],
                         x["q2_0"] if split else zero, x["m32_0"] if split else zero,
                         zero, zero, zero)
                for t in range(T):
                    carry = substep(t, carry)
                q1, m31, chanq, q2, m32, side1, sumdis, trans_acc = carry
            # CrossSection2Area is carried-and-overwritten in the reference
            # loop (routing.py:585): only the final sub-step's value
            # survives, so compute it once here (identical inputs)
            cross2 = (m32 - x["chan2m3start"]) * inv_dx if split else zero

            # shared scatter for all T sub-steps (VMEM one-hot, MXU matmul):
            # window-local offset k*C+lane targets chunk c+1+k -> slot
            # (b+1+k) % S, all static — no window shift, just W slot adds
            # and a zero of the vacated slot
            onehot = (dl[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (C, W * C), 1)).astype(dtype)
            add = _dot_scatter(Q[:], onehot, dtype)
            for k in range(W):
                sk = (b + 1 + k) % S
                win[:, sk * C:(sk + 1) * C] = (
                    win[:, sk * C:(sk + 1) * C] + add[:, k * C:(k + 1) * C])
            # this chunk's slot becomes chunk c+S's accumulator
            win[:, sc * C:(sc + 1) * C] = jnp.zeros((T * L, C), dtype)

            # ---- feeder staging: this chunk's sub-step discharges feed
            # downstream structures' inflow buffers (rows 1..T) ----
            if lakes:
                @pl.when(ins["lk_fee_flag"][pl.program_id(0) * B + b] == 1)
                def _():
                    fee_lane = ins["lk_fee_lane"][b * 8:(b + 1) * 8]   # (8, NLp)
                    fee_w = ins["lk_fee_w"][b * 8:(b + 1) * 8]
                    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, NLp), 0)
                    M = jnp.zeros((C, NLp), dtype)
                    for k in range(8):
                        M = M + (iota_c == fee_lane[k:k + 1, :]).astype(dtype) * fee_w[k:k + 1, :]
                    contrib = jax.lax.dot(chanq_buf[:], M,
                                          precision=_TUNE_PREC,
                                          preferred_element_type=dtype)   # (Tp, NLp)
                    # rows 0..T-1 of chanq_buf are sub-steps 0..T-1; a
                    # structure at sub-step t consumes buf row t (= feeder
                    # discharge at t-1), so contributions land at rows 1..T
                    buf_lake[1:Tp, :] = buf_lake[1:Tp, :] + contrib[0:Tp - 1, :]
            if reservoirs:
                @pl.when(ins["rs_fee_flag"][pl.program_id(0) * B + b] == 1)
                def _():
                    fee_lane = ins["rs_fee_lane"][b * 8:(b + 1) * 8]
                    fee_w = ins["rs_fee_w"][b * 8:(b + 1) * 8]
                    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, NRp), 0)
                    M = jnp.zeros((C, NRp), dtype)
                    for k in range(8):
                        M = M + (iota_c == fee_lane[k:k + 1, :]).astype(dtype) * fee_w[k:k + 1, :]
                    contrib = jax.lax.dot(chanq_buf[:], M,
                                          precision=_TUNE_PREC,
                                          preferred_element_type=dtype)
                    buf_res[1:Tp, :] = buf_res[1:Tp, :] + contrib[0:Tp - 1, :]

            outs["q1"][b:b + 1] = q1
            outs["m31"][b:b + 1] = m31
            outs["chanq"][b:b + 1] = chanq
            outs["sumdis"][b:b + 1] = sumdis
            if split:
                outs["q2"][b:b + 1] = q2
                outs["m32"][b:b + 1] = m32
                outs["cross2"][b:b + 1] = cross2
                outs["side1"][b:b + 1] = side1
            if has.get("uptrans"):
                outs["trans"][b:b + 1] = trans_acc

    row_spec = pl.BlockSpec((B, C), lambda c: (c, 0), memory_space=pltpu.VMEM)
    n_pad = n_blocks * B

    def specs_for(names, Np):
        sp, shapes = [], {}
        for k in names:
            if k.endswith("_on") or k.endswith("_fee_w"):
                rows = 1 if k.endswith("_on") else 8
                sp.append(pl.BlockSpec((B * rows, Np), lambda c: (c, 0),
                                       memory_space=pltpu.VMEM))
                shapes[k] = (n_pad * rows, Np)
            elif k.endswith("_fee_lane"):
                sp.append(pl.BlockSpec((B * 8, Np), lambda c: (c, 0),
                                       memory_space=pltpu.VMEM))
                shapes[k] = (n_pad * 8, Np)
            elif k.endswith("_lane"):
                sp.append(pl.BlockSpec((B * Np, 1), lambda c: (c, 0),
                                       memory_space=pltpu.VMEM))
                shapes[k] = (n_pad * Np, 1)
            elif k.endswith("_flag"):
                # rank-1 SMEM blocks must be whole-array (Mosaic tiling
                # rule); indexed as [program_id*B + b] in the kernel
                sp.append(pl.BlockSpec(memory_space=pltpu.SMEM))
                shapes[k] = (n_pad,)
            else:   # (1, Np) parameter/state rows
                sp.append(pl.BlockSpec((1, Np), lambda c: (0, 0),
                                       memory_space=pltpu.VMEM))
                shapes[k] = (1, Np)
        return sp, shapes

    base_names = [k for k in in_names if not k.startswith(("lk_", "rs_"))]
    in_specs = [row_spec] * len(base_names)
    struct_shapes = {}
    if lakes:
        sp, shp = specs_for(lake_chunked + lake_flags + lake_rows, NLp)
        in_specs += sp
        struct_shapes.update(shp)
    if reservoirs:
        sp, shp = specs_for(res_chunked + res_flags + res_rows, NRp)
        in_specs += sp
        struct_shapes.update(shp)

    out_specs = []
    out_shape = []
    for k in out_names:
        if k.startswith("lk_"):
            out_specs.append(pl.BlockSpec((1, NLp), lambda c: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((1, NLp), dtype))
        elif k.startswith("rs_"):
            out_specs.append(pl.BlockSpec((1, NRp), lambda c: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((1, NRp), dtype))
        else:
            out_specs.append(row_spec)
            out_shape.append(jax.ShapeDtypeStruct((n_pad, C), dtype))

    scratch_shapes = [
        pltpu.VMEM((T * L, S * C), dtype),     # rotating inflow window
        pltpu.VMEM((T * L, C), dtype),         # collected sub-step q rows
    ]
    if eva_chain:
        scratch_shapes += [pltpu.VMEM((Ep, S * C), dtype),   # eva arrivals
                           pltpu.VMEM((Ep, C), dtype)]       # eva transfers
    if lakes or reservoirs:
        scratch_shapes += [pltpu.VMEM((Tp, C), dtype),    # chanq rows
                           pltpu.VMEM((Tp, C), dtype)]    # structure sideflow
    if lakes:
        scratch_shapes += [pltpu.VMEM((Tp, NLp), dtype),  # inflow buffer
                           pltpu.VMEM((Tp, NLp), dtype)]  # owner outflows
    if reservoirs:
        scratch_shapes += [pltpu.VMEM((Tp, NRp), dtype),
                           pltpu.VMEM((Tp, NRp), dtype)]
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    def run(xs):
        args = []
        for k in in_names:
            v = xs[k]
            is_int = k in ("dl", "ev_dl") or k.endswith(("_lane", "_flag", "_fee_lane"))
            v = v.astype(jnp.int32) if is_int else v.astype(dtype)
            if k.startswith(("lk_", "rs_")):
                shape = struct_shapes[k]
                if v.shape != shape:
                    # pad the leading (chunk-derived) axis; lanes pad with
                    # the no-scatter sentinel C, everything else with 0
                    fill = C if k.endswith("lane") else 0
                    v = jnp.pad(v, ((0, shape[0] - v.shape[0]),) +
                                ((0, 0),) * (v.ndim - 1), constant_values=fill)
            else:
                # pad the chunk axis to a full block; dl pads with the
                # sentinel (no scatter), everything else with inert values
                fill = W * C if k in ("dl", "ev_dl") else (
                    1.0 if k in ("dx", "adx1", "alpha1", "adx2", "alpha2") else 0.0)
                v = jnp.pad(v, ((0, n_pad - n_chunks), (0, 0)), constant_values=fill)
            args.append(v)
        # the framework enables x64 globally; Mosaic has no 64-bit types —
        # trace the kernel with 32-bit weak scalars and loop counters
        with jax.enable_x64(False):
            res = call(*args)
        out = {}
        for k, r in zip(out_names, res):
            out[k] = r if k.startswith(("lk_", "rs_")) else r[:n_chunks]
        return out

    return run
