"""Kinematic-wave routing — wavefront scan with batched Newton solves.

TPU-native recast of the reference's level-parallel solver
(kinematic_wave_parallel.py:160-184, kinematic_wave_parallel_tools.py:34-92):
instead of a serial Python loop over topological levels with threaded
pixels, the drainage DAG is packed host-side into dependency-safe
fixed-width chunks (graph/ldd.py:build_schedule) and the whole sweep runs
as one `lax.scan` on device:

  per chunk: gather accumulated upstream inflow -> vectorized
  Newton-Raphson on  Q + a·dx/dt·Q^beta = upstream + a·dx/dt·Qold^beta + q·dx
  -> scatter discharge into the downstream inflow accumulator.

The Newton iteration reproduces the reference solver exactly: analytic
secant bounds for the initial guess, convergence to |error| <= 1e-12,
per-iteration clamping at the tolerance and the zero short-circuits
(kwpt.py:48-87).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEWTON_TOL = 1e-12
MAX_ITERS = 3000


# Empirically, the analytic secant-bound initial guess puts plain Newton at
# <2e-13 relative error after 4 iterations across c in [1e-10,1e6] x
# a.dx/dt in [1e-4,1e5] (see git history for the sweep); 6 leaves margin.
NEWTON_FIXED_ITERS = 6


def _newton_solve(const_plus_ups, a_dx_div_dt, beta):
    """Vectorized Newton-Raphson for Q + a·dx/dt·Q^beta = const_plus_ups.

    All operands (C,) vectors. Same math as kwpt.solve1Pixel:48-87, but with
    a fixed masked iteration count instead of a data-dependent loop: the
    analytic secant-bound initial guess makes Newton quadratically
    convergent, so NEWTON_FIXED_ITERS iterations reach the reference's
    1e-12 tolerance (converged lanes are frozen by the mask, reproducing
    the reference's early-exit sequence exactly); a fixed trip count keeps
    the routing scan a static-shape pipeline on TPU."""
    inv_beta = 1.0 / beta
    b_minus_1 = beta - 1.0
    b_a_dx = beta * a_dx_div_dt

    small = const_plus_ups <= NEWTON_TOL
    c = jnp.where(small, 1.0, const_plus_ups)   # safe value for masked lanes

    a_cpui_pow = b_a_dx * c ** b_minus_1
    secant_bound = jnp.where(
        a_cpui_pow <= 1.0,
        c / (1.0 + a_cpui_pow),
        c / (1.0 + a_cpui_pow ** inv_beta),
    )
    other_bound = ((c - secant_bound) / a_dx_div_dt) ** inv_beta
    q0 = 0.5 * (secant_bound + other_bound)

    def body(_, state):
        q, prev = state
        # one pow per iteration: q^(beta-1) = q^beta / q (q >= NEWTON_TOL > 0)
        powq = q ** beta
        err = q + a_dx_div_dt * powq - c
        active = (jnp.abs(err) > NEWTON_TOL) & (q != prev)
        q_next = jnp.maximum(q - err / (1.0 + b_a_dx * powq / q), NEWTON_TOL)
        return (jnp.where(active, q_next, q), jnp.where(active, q, prev))

    q, _ = jax.lax.fori_loop(0, NEWTON_FIXED_ITERS, body,
                             (q0, jnp.full_like(q0, -1.0)))
    q = jnp.where(q == NEWTON_TOL, 0.0, q)
    return jnp.where(small, 0.0, q)


@partial(jax.jit, static_argnames=("beta",))
def _route_batched(discharge, lateral_inflow, a_dx_div_dt, chunks, downstream, beta):
    """Batched wavefront sweep: all (L, P) operands routed over the same
    drainage schedule in one scan (the L lanes share chunk gathers/scatters,
    so e.g. the 3 overland runoff lanes or main channel + floodplain compile
    and run as a single kernel)."""
    L, P = discharge.shape
    constant = a_dx_div_dt * discharge ** beta + lateral_inflow

    # padded (L, P+1) working arrays; slot P is scratch for pits and padding
    pad = lambda x, v: jnp.concatenate([x, jnp.full((L, 1), v, x.dtype)], axis=1)
    constant_p = pad(constant, 0.0)
    adx_p = pad(a_dx_div_dt, 1.0)

    q_out = jnp.zeros((L, P + 1), discharge.dtype)
    inflow = jnp.zeros((L, P + 1), discharge.dtype)

    def body(carry, chunk_pix):
        q_out, inflow = carry
        c = inflow[:, chunk_pix] + constant_p[:, chunk_pix]
        q = _newton_solve(c, adx_p[:, chunk_pix], beta)
        q_out = q_out.at[:, chunk_pix].set(q)
        inflow = inflow.at[:, downstream[chunk_pix]].add(q)
        return (q_out, inflow), None

    (q_out, _), _ = jax.lax.scan(body, (q_out, inflow), chunks)
    return q_out[:, :P]


def _route(discharge, lateral_inflow, a_dx_div_dt, chunks, downstream, beta):
    """Single-lane wrapper over _route_batched."""
    return _route_batched(discharge[None], lateral_inflow[None], a_dx_div_dt[None],
                          chunks, downstream, beta)[0]


@dataclass
class ScanRouter:
    """Gather/scatter scan router over a RoutingSchedule (the round-1 path,
    kept as the reference implementation behind the `RoutingKernel=scan`
    switch; the packed scatter-free path in ops/kinwave_packed.py is the
    default and is gated against this one at 1e-12)."""

    chunks: jnp.ndarray
    downstream: jnp.ndarray

    def __init__(self, schedule):
        self.chunks = jnp.asarray(schedule.chunks)
        self.downstream = jnp.asarray(schedule.downstream)

    def route_batched(self, discharge, lateral_inflow, a_dx_div_dt, beta):
        return _route_batched(discharge, lateral_inflow, a_dx_div_dt,
                              self.chunks, self.downstream, float(beta))

    def route(self, discharge, lateral_inflow, a_dx_div_dt, beta):
        return self.route_batched(discharge[None], lateral_inflow[None],
                                  a_dx_div_dt[None], beta)[0]


@dataclass
class KinematicWaveRouter:
    """Router bound to a drainage schedule and channel geometry.

    Mirrors the reference kinematicWave class (kinematic_wave_parallel.py:
    114-184) incl. the optional floodplain (split-routing) section."""

    chunks: jnp.ndarray          # (n_chunks, C) int32
    downstream: jnp.ndarray      # (P+1,) int32
    space_delta: jnp.ndarray     # (P,) dx [m]
    beta: float
    a_dx_div_dt_channel: jnp.ndarray
    a_dx_div_dt_floodplains: jnp.ndarray | None = None

    @classmethod
    def build(cls, schedule, alpha_channel, beta, space_delta, time_delta,
              alpha_floodplains=None, dtype=jnp.float64):
        space_delta = jnp.asarray(space_delta, dtype) * jnp.ones(schedule.num_pixels, dtype)
        a_main = jnp.asarray(alpha_channel, dtype) * space_delta / time_delta
        a_flood = None
        if alpha_floodplains is not None:
            a_flood = jnp.asarray(alpha_floodplains, dtype) * space_delta / time_delta
        return cls(
            chunks=jnp.asarray(schedule.chunks),
            downstream=jnp.asarray(schedule.downstream),
            space_delta=space_delta,
            beta=float(beta),
            a_dx_div_dt_channel=a_main,
            a_dx_div_dt_floodplains=a_flood,
        )

    def routing(self, discharge, specific_lateral_inflow, section="main_channel"):
        """One routing sub-step; returns the updated discharge vector."""
        if section == "main_channel":
            adx = self.a_dx_div_dt_channel
        elif section == "floodplains":
            adx = self.a_dx_div_dt_floodplains
        else:
            raise ValueError("section must be 'main_channel' or 'floodplains'")
        lateral = specific_lateral_inflow * self.space_delta
        return _route(jnp.asarray(discharge), lateral, adx,
                      self.chunks, self.downstream, self.beta)
