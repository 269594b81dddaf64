"""Pallas TPU kernel: the channel-routing sub-step loop as one Mosaic
program.

Both XLA formulations of the sub-step loop (sequential and chunk-major
pipelined, ops/routing_ops.py) bottom out at per-op dispatch overhead:
the loop body is ~30 small (L, C) VPU ops per (chunk, sub-step), ~2M op
executions per continental model step. This kernel fuses the whole loop:
grid = chunks (sequential on-core), the T sub-steps run as an in-kernel
fori_loop, and every intermediate — the rolling inflow window, the
one-hot scatter operand, the collected sub-step discharges — lives in
VMEM. The scatter matmul (T*L, C) x (C, W*C) hits the MXU with T*L rows
and its selection operand never touches HBM.

Scope: split and single routing with the elementwise sideflow terms
(open-water evaporation, water use, inflow ramp, transmission loss).
Lake/reservoir chunks fall back to the XLA paths (routing_ops.py) — the
structure sub-step chains are scalar-heavy and stay outside. float32
only (Mosaic has no f64): this is the TPU production/bench precision;
the f64 parity path stays on the XLA kernels.

Layout contract: ops/kinwave_packed.PackedSchedule (chunk-major packed
position space). Per-pixel numerics identical to the sequential path
(same Newton, same clamp order); gated by tests/test_pallas_routing.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kinwave_packed import _newton_unrolled


def build_substep_pallas(cfg, ps, beta, has, interpret=False):
    """Returns `run(xs) -> ys` executing the full sub-step loop.

    `xs`: dict of (n_chunks, C) float32 chunk-major operands (see
    routing_ops.channel_routing_pipelined for the naming);
    `ys`: dict of (n_chunks, C) outputs (final-sub-step state rows plus
    per-chunk accumulators)."""
    T = cfg.no_rout_steps
    C = ps.chunk
    n_chunks = ps.n_chunks
    W = ps.window
    split = bool(has.get("split"))
    L = 2 if split else 1
    beta = float(beta)
    dtype = jnp.float32

    in_names = ["ToChan", "dx", "adx1", "alpha1", "ischan", "dl",
                "q1_0", "m31_0", "chanq_0"]
    if split:
        in_names += ["adx2", "alpha2", "qlimit", "m3limit", "chan2m3start",
                     "chan2qstart", "q2_0", "m32_0"]
    for k in ("eva", "wuse", "qin_old", "qdelta", "uptrans", "tp1", "tp2", "tsub"):
        if has.get(k):
            in_names.append(k)
    out_names = ["q1", "m31", "chanq", "sumdis"]
    if split:
        out_names += ["q2", "m32", "cross2", "side1"]
    if has.get("uptrans"):
        out_names.append("trans")

    import sys
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)     # deep trace: B-unrolled chunk chain
    B = 8            # chunks per grid step (sublane tiling requires >=8)
    n_blocks = (n_chunks + B - 1) // B

    def kernel(*refs):
        ins = dict(zip(in_names, refs[: len(in_names)]))
        outs = dict(zip(out_names, refs[len(in_names): len(in_names) + len(out_names)]))
        win, win2, Q = refs[len(in_names) + len(out_names):]

        @pl.when(pl.program_id(0) == 0)
        def _():
            win[:] = jnp.zeros_like(win)

        for b in range(B):
            # keep every row access 2-D (1, C): 1-D sublane-indexed
            # vector reads are a known Mosaic hazard
            x = {k: ins[k][b:b + 1] for k in in_names if k != "dl"}
            dl = ins["dl"][b:b + 1][0]
            inv_dx = 1.0 / x["dx"]

            def substep(t, carry):
                # t is a PYTHON int (unrolled loop): all window/Q indices
                # must be static — Mosaic requires 8-aligned dynamic
                # sublane offsets, which t*L is not
                q1, m31, chanq, q2, m32, cross2, side1, sumdis, trans_acc = carry
                sideflow_m3 = x["ToChan"]
                if has.get("eva"):
                    sideflow_m3 = sideflow_m3 - x["eva"]
                if has.get("wuse"):
                    sideflow_m3 = sideflow_m3 - x["wuse"]
                if has.get("qin_old"):
                    sideflow_m3 = sideflow_m3 + (x["qin_old"] + float(t + 1) * x["qdelta"]) / T
                if has.get("uptrans"):
                    trans_out = jnp.where(x["uptrans"] != 0,
                                          (chanq ** x["tp2"] - x["tsub"]) ** x["tp1"],
                                          chanq)
                    trans_loss_m3 = (chanq - trans_out) * cfg.dt_routing
                    sideflow_m3 = sideflow_m3 - trans_loss_m3
                    trans_acc = trans_acc + trans_loss_m3

                sideflow = jnp.where(x["ischan"] != 0,
                                     sideflow_m3 * inv_dx / cfg.dt_routing, 0.0)
                sideflow = jnp.where(jnp.isnan(sideflow), 0.0, sideflow)

                if not split:
                    ups = win[t:t + 1, :C]
                    cc_const = ups + x["adx1"] * q1 ** beta + sideflow * x["dx"]
                    q = _newton_unrolled(cc_const, x["adx1"], beta)
                    Q[t:t + 1, :] = q
                    m31 = jnp.maximum(x["dx"] * x["alpha1"] * q ** beta, 0.0)
                    q1 = (m31 * inv_dx / x["alpha1"]) ** (1 / beta)
                    chanq = q1
                else:
                    ratio_den = m31 + m32
                    sideflow_ratio = jnp.where(
                        ratio_den > 0, m31 / jnp.where(ratio_den > 0, ratio_den, 1.0), 0.0)
                    over_limit = (m31 + m32 - x["chan2m3start"]) > x["m3limit"]
                    sideflow1 = jnp.where(over_limit, sideflow_ratio * sideflow, sideflow)
                    sideflow1 = jnp.where(jnp.abs(sideflow) < 1e-7, sideflow, sideflow1)
                    sideflow2 = sideflow - sideflow1 + x["chan2qstart"] * inv_dx
                    q_in = jnp.concatenate([q1, q2], axis=0)
                    lat = jnp.concatenate([sideflow1, sideflow2], axis=0) * x["dx"]
                    adx = jnp.concatenate([x["adx1"], x["adx2"]], axis=0)
                    ups = win[t * L:(t + 1) * L, :C]
                    cc_const = ups + adx * q_in ** beta + lat
                    q = _newton_unrolled(cc_const, adx, beta)
                    Q[t * L:(t + 1) * L, :] = q
                    q1v, q2v = q[0:1], q[1:2]
                    m31 = jnp.maximum(x["dx"] * x["alpha1"] * q1v ** beta, 0.0)
                    q1 = (m31 * inv_dx / x["alpha1"]) ** (1 / beta)
                    m32 = x["dx"] * x["alpha2"] * q2v ** beta
                    m32 = jnp.where(m32 - x["chan2m3start"] < 0.0, x["chan2m3start"], m32)
                    q2 = (m32 * inv_dx / x["alpha2"]) ** (1 / beta)
                    cross2 = (m32 - x["chan2m3start"]) * inv_dx
                    chanq = jnp.maximum(q1 + q2 - x["qlimit"], 0.0)
                    side1 = sideflow1
                sumdis = sumdis + chanq
                return (q1, m31, chanq, q2, m32, cross2, side1, sumdis, trans_acc)

            zero = jnp.zeros((1, C), dtype)
            init = (x["q1_0"], x["m31_0"], x["chanq_0"],
                    x["q2_0"] if split else zero, x["m32_0"] if split else zero,
                    zero, zero, zero, zero)
            carry = init
            for t in range(T):
                carry = substep(t, carry)
            q1, m31, chanq, q2, m32, cross2, side1, sumdis, trans_acc = carry

            # shared scatter for all T sub-steps (VMEM one-hot, MXU matmul)
            onehot = (dl[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (C, W * C), 1)).astype(dtype)
            add = jax.lax.dot(Q[:], onehot, precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=dtype)
            # double-buffered shift: an in-place `win[:] = shift(win) + add`
            # lets Mosaic tile the write over the aliased read region and
            # corrupts the carry at large W*C (observed on-chip)
            win2[:] = jnp.concatenate(
                [win[:, C:], jnp.zeros((T * L, C), dtype)], axis=1) + add
            win[:] = win2[:]

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
    in_specs = [row_spec] * len(in_names)
    out_specs = [row_spec] * len(out_names)
    n_pad = n_blocks * B
    out_shape = [jax.ShapeDtypeStruct((n_pad, C), dtype) for _ in out_names]
    scratch_shapes = [
        pltpu.VMEM((T * L, W * C), dtype),     # rolling inflow window
        pltpu.VMEM((T * L, W * C), dtype),     # shift double-buffer
        pltpu.VMEM((T * L, C), dtype),         # collected sub-step q rows
    ]
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
            v = v.astype(jnp.int32) if k == "dl" else v.astype(dtype)
            # pad the chunk axis to a full block; dl pads with the sentinel
            # (no scatter), everything else with inert values
            fill = W * C if k == "dl" else (1.0 if k in ("dx", "adx1", "alpha1",
                                                         "adx2", "alpha2") else 0.0)
            v = jnp.pad(v, ((0, n_pad - n_chunks), (0, 0)), constant_values=fill)
            args.append(v)
        # the framework enables x64 globally; Mosaic has no 64-bit types —
        # trace the kernel with 32-bit weak scalars and loop counters
        with jax.enable_x64(False):
            res = call(*args)
        return {k: r[:n_chunks] for k, r in zip(out_names, res)}

    return run
