"""Pallas TPU kernel for the kinematic-wave wavefront sweep.

The XLA path (ops/kinwave.py) runs the chunked sweep as a `lax.scan`,
paying per-iteration dispatch (~10 us/chunk on TPU). This kernel fuses the
ENTIRE sweep into one Mosaic program: discharge, inflow accumulator and
chunk operands live in VMEM; the chunk loop is in-kernel; the Newton solve
is vectorized on the VPU; the downstream scatter-accumulate runs as a
scalar loop with dynamic VMEM stores.

Layout contract (prepared by `pack_schedule`): pixels are renumbered into
schedule order, so chunk c occupies the static slice [c*C, (c+1)*C) of all
operand vectors — chunk reads need no dynamic gather, only the
downstream scatter is dynamically indexed. Slot P_pad (= n_chunks*C) is
the dump slot for pits and padding.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEWTON_TOL = 1e-12
NEWTON_ITERS = 18
LANE = 128


@dataclass
class PackedSchedule:
    """Host-side renumbering of a graph/RoutingSchedule for the kernel."""

    perm: np.ndarray          # (P_pad,) position -> natural pixel index (P = pad)
    inv_perm: np.ndarray      # (P,) natural pixel -> position
    down_pos: np.ndarray      # (P_pad,) position -> downstream position (P_pad = dump)
    n_chunks: int
    chunk: int
    num_pixels: int

    @property
    def p_pad(self):
        return self.n_chunks * self.chunk


def pack_schedule(schedule) -> PackedSchedule:
    P = schedule.num_pixels
    chunks = schedule.chunks          # (n_chunks, C), pad = P
    n_chunks, C = chunks.shape
    perm = chunks.reshape(-1).astype(np.int64)            # position -> pixel (P = pad)
    p_pad = n_chunks * C
    inv_perm = np.full(P, p_pad, dtype=np.int64)
    valid = perm < P
    inv_perm[perm[valid]] = np.flatnonzero(valid)
    # downstream position: natural downstream index -> position
    down_nat = schedule.downstream                         # (P+1,), P = pit
    down_pos = np.full(p_pad, p_pad, dtype=np.int32)
    src = perm[valid]
    tgt = down_nat[src]                                    # natural downstream (or P)
    tgt_pos = np.where(tgt < P, inv_perm[np.minimum(tgt, P - 1)], p_pad)
    down_pos[np.flatnonzero(valid)] = tgt_pos.astype(np.int32)
    return PackedSchedule(perm=perm, inv_perm=inv_perm, down_pos=down_pos,
                          n_chunks=n_chunks, chunk=C, num_pixels=P)


def _newton_vec(c, adx, beta):
    inv_beta = 1.0 / beta
    b_minus_1 = beta - 1.0
    b_a_dx = beta * adx
    small = c <= NEWTON_TOL
    cs = jnp.where(small, 1.0, c)
    a_pow = b_a_dx * cs ** b_minus_1
    secant = jnp.where(a_pow <= 1.0, cs / (1.0 + a_pow), cs / (1.0 + a_pow ** inv_beta))
    other = ((cs - secant) / adx) ** inv_beta
    q = 0.5 * (secant + other)
    prev = jnp.full_like(q, -1.0)

    def body(_, qp):
        q, prev = qp
        err = q + adx * q ** beta - cs
        active = (jnp.abs(err) > NEWTON_TOL) & (q != prev)
        qn = jnp.maximum(q - err / (1.0 + b_a_dx * q ** b_minus_1), NEWTON_TOL)
        return (jnp.where(active, qn, q), jnp.where(active, q, prev))

    q, _ = jax.lax.fori_loop(0, NEWTON_ITERS, body, (q, prev))
    q = jnp.where(q == NEWTON_TOL, 0.0, q)
    return jnp.where(small, 0.0, q)


def _sweep_kernel(n_chunks, chunk, beta, down_ref, const_ref, adx_ref, q_ref, inflow):
    """One fused wavefront sweep. Shapes: (L, P_pad [+LANE pad]) in VMEM,
    down_ref (P_pad,) int32 in SMEM."""
    inflow[...] = jnp.zeros(inflow.shape, inflow.dtype)

    def per_chunk(c, _):
        sl = pl.ds(c * chunk, chunk)
        ups = inflow[:, sl]
        cc = ups + const_ref[:, sl]
        q = _newton_vec(cc, adx_ref[:, sl], beta)
        q_ref[:, sl] = q

        def scat(j, _):
            tgt = down_ref[c * chunk + j]
            qcol = q_ref[:, pl.ds(c * chunk + j, 1)]
            cur = inflow[:, pl.ds(tgt, 1)]
            inflow[:, pl.ds(tgt, 1)] = cur + qcol
            return 0

        jax.lax.fori_loop(0, chunk, scat, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, per_chunk, 0)


@partial(jax.jit, static_argnames=("n_chunks", "chunk", "beta"))
def _sweep_pallas(const_p, adx_p, down_pos, n_chunks, chunk, beta):
    """const_p/adx_p: (L, P_pad + LANE) permuted operands (dump slot + lane
    padding appended). Returns q (L, P_pad + LANE)."""
    L, width = const_p.shape
    kernel = partial(_sweep_kernel, n_chunks, chunk, beta)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, width), const_p.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L, width), const_p.dtype)],
    )(down_pos, const_p, adx_p)


class PallasRouter:
    """Drop-in wavefront router using the fused kernel.

    Usage: build once from a RoutingSchedule; `route(discharge, lateral,
    adx)` takes natural-order (L, P) operands and returns natural-order
    discharge — the permutation/padding round trip happens on device.
    """

    def __init__(self, schedule, beta, dtype=jnp.float32):
        ps = pack_schedule(schedule)
        self.ps = ps
        self.beta = float(beta)
        self.dtype = dtype
        # gather indices with dump handling: use index P (one past end) on a
        # padded source vector
        self.perm = jnp.asarray(np.where(ps.perm < ps.num_pixels, ps.perm, ps.num_pixels))
        self.inv_perm = jnp.asarray(ps.inv_perm)
        self.down_pos = jnp.asarray(ps.down_pos)
        self.width = ps.p_pad + LANE

    def route(self, discharge, lateral, adx):
        """discharge/lateral/adx: (L, P) natural order."""
        L, P = discharge.shape
        ps = self.ps
        constant = adx * discharge ** self.beta + lateral

        def to_perm(x, fill):
            xp = jnp.concatenate([x.astype(self.dtype), jnp.full((L, 1), fill, self.dtype)], axis=1)
            g = xp[:, self.perm]                       # (L, P_pad)
            pad = jnp.full((L, self.width - ps.p_pad), fill, self.dtype)
            return jnp.concatenate([g, pad], axis=1)

        const_p = to_perm(constant, 0.0)
        adx_p = to_perm(adx, 1.0)
        q_p = _sweep_pallas(const_p, adx_p, self.down_pos, ps.n_chunks, ps.chunk, self.beta)
        # back to natural order
        q_full = jnp.concatenate([q_p, jnp.zeros((L, 1), self.dtype)], axis=1)
        return q_full[:, self.inv_perm].astype(discharge.dtype)
