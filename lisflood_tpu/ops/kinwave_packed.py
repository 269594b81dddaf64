"""Packed kinematic-wave sweep — scatter-free wavefront routing.

TPU-first recast of the chunked wavefront sweep (ops/kinwave.py). The
schedule's pixels are renumbered host-side into *schedule order* so chunk
``c`` occupies the contiguous position slice ``[c*C, (c+1)*C)`` of every
operand vector. Because a pixel's downstream neighbour sits exactly one
topological level closer to the outlet, its position in schedule order
falls inside a small bounded window of following chunks (measured at pack
time, typically 2-4 chunks). That turns the whole sweep into static-shape
primitives only:

  per chunk: dynamic-slice the upstream-inflow window -> vectorized
  Newton-Raphson -> build a one-hot (C, W*C) selection matrix from the
  precomputed local downstream offsets -> one small matmul scatters the
  chunk's discharge into the next W chunks' inflow accumulator.

No gather, no scatter-add, no data-dependent shapes anywhere: each scan
iteration compiles to a single fused region (slices + VPU Newton + one MXU
matmul), which removes the per-chunk dispatch overhead that dominated the
round-1 gather/scatter path on TPU. The Newton iteration reproduces the
reference solver (kinematic_wave_parallel_tools.py:48-87) exactly: same
analytic secant-bound initial guess, same convergence mask and clamping,
with the data-dependent loop replaced by a fixed unrolled iteration count
(converged lanes freeze, reproducing the early-exit sequence bit-for-bit).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEWTON_TOL = 1e-12
# The analytic secant-bound initial guess makes Newton quadratically
# convergent; 6 masked iterations reach <=1e-12 across the adversarial
# (alpha, beta, const) sweep in tests/test_kinwave.py. At float32 the
# iterates freeze at the f32 ulp well before that: 4 iterations sit
# within 8e-6 relative of 6 on the same adversarial sweep (measured),
# below the established f32 cross-path noise floor — and the unrolled
# Newton chain dominates the Mosaic kernel's sequential t-loop, so the
# f32 production path runs the shorter unroll.
NEWTON_FIXED_ITERS = 6
NEWTON_FIXED_ITERS_F32 = 4


def _root_est(x, p):
    """Exponent bit-hack estimate of x**p for x > 0, p in (0, 1): scale
    the float's bit pattern linearly (the fast-inverse-sqrt trick). Error
    <~7% across the full f32 range — always polished by Newton."""
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    f = i.astype(jnp.float32) * jnp.float32(p) + jnp.float32((1.0 - p) * 1065353216.0)
    return jax.lax.bitcast_convert_type(f.astype(jnp.int32), jnp.float32)


# v-space Newton iteration count: 5 reaches the f32 noise floor (max rel
# error 6.6e-7 vs f64 ground truth over an adversarial a in 1e-4..1e4,
# c in 1e-10..1e8 sweep — tests/test_kinwave.py gates it; the q-space
# 4-iteration solver's worst case on the same sweep is 5.9e-4)
NEWTON_V_ITERS = 5


def _newton_v(cc, a, iters=NEWTON_V_ITERS):
    """Kinematic-wave solve for beta = 3/5 with NO transcendentals.

    q + a*q^0.6 = cc substituted with v = q^(1/5) becomes the polynomial
    v^5 + a*v^3 = cc. The initial guess min(cc^(1/5), (cc/a)^(1/3)) — both
    via the exponent bit-hack — is within [1.0, 1.26]x of the root once
    scaled by 1.12 (measured over the adversarial sweep; the min of the
    two regime bounds is >= root/2^(1/3) and the hack errs <7%), and
    Newton on this convex increasing polynomial converges monotonically
    from above: 5 polynomial iterations replace the pow-per-iteration
    q-space loop. Returns v (callers use v^3 = q^0.6 and v^5 = q directly,
    eliminating the M3/Q round-trip pows of routing.py:518-604).

    Caller contract: cc > 0 (mask cc <= NEWTON_TOL to 0 outside, as
    _newton_unrolled does)."""
    va = _root_est(cc, 0.2)
    vb = _root_est(cc / a, 1.0 / 3.0)
    v = jnp.minimum(va, vb) * jnp.float32(1.12)
    for _ in range(iters):
        v2 = v * v
        v3 = v2 * v
        v4 = v2 * v2
        g = v * v4 + a * v3 - cc
        gp = jnp.float32(5.0) * v4 + jnp.float32(3.0) * a * v2
        v = v - g / gp
    return v


def newton_solve(const_plus_ups, a_dx_div_dt, beta, iters=None):
    """Kinematic-wave solver dispatch for Q + a*dx/dt*Q^beta = const.

    float32 with beta = 3/5 (every LISFLOOD configuration binds beta=0.6,
    reference routing.py:66) takes the transcendental-free polynomial
    v-space path; float64 (reference-parity runs) and generic beta keep
    the reference q-space iteration (_newton_unrolled)."""
    if const_plus_ups.dtype == jnp.float32 and abs(float(beta) - 0.6) < 1e-9:
        small = const_plus_ups <= NEWTON_TOL
        cc = jnp.where(small, jnp.float32(1.0), const_plus_ups)
        v = _newton_v(cc, a_dx_div_dt, iters=iters or NEWTON_V_ITERS)
        v3 = v * v * v
        return jnp.where(small, jnp.float32(0.0), v3 * v * v)
    return _newton_unrolled(const_plus_ups, a_dx_div_dt, beta, iters)


def _newton_unrolled(const_plus_ups, a_dx_div_dt, beta, iters=None):
    """Vectorized Newton-Raphson for Q + a*dx/dt*Q^beta = const_plus_ups,
    identical math to ops/kinwave._newton_solve but with the fixed
    iteration count unrolled into straight-line code (no while loop);
    dtype-dependent unroll depth (see NEWTON_FIXED_ITERS_F32)."""
    if iters is None:
        iters = (NEWTON_FIXED_ITERS_F32
                 if const_plus_ups.dtype == jnp.float32 else NEWTON_FIXED_ITERS)
    inv_beta = 1.0 / beta
    b_minus_1 = beta - 1.0
    b_a_dx = beta * a_dx_div_dt

    small = const_plus_ups <= NEWTON_TOL
    c = jnp.where(small, 1.0, const_plus_ups)

    a_cpui_pow = b_a_dx * c ** b_minus_1
    secant_bound = jnp.where(
        a_cpui_pow <= 1.0,
        c / (1.0 + a_cpui_pow),
        c / (1.0 + a_cpui_pow ** inv_beta),
    )
    other_bound = ((c - secant_bound) / a_dx_div_dt) ** inv_beta
    q = 0.5 * (secant_bound + other_bound)
    prev = jnp.full_like(q, -1.0)
    for _ in range(iters):
        powq = q ** beta
        err = q + a_dx_div_dt * powq - c
        active = (jnp.abs(err) > NEWTON_TOL) & (q != prev)
        q_next = jnp.maximum(q - err / (1.0 + b_a_dx * powq / q), NEWTON_TOL)
        q, prev = jnp.where(active, q_next, q), jnp.where(active, q, prev)
    q = jnp.where(q == NEWTON_TOL, 0.0, q)
    return jnp.where(small, 0.0, q)


@dataclass
class PackedSchedule:
    """Host-side renumbering of a graph/RoutingSchedule into schedule order."""

    perm: np.ndarray         # (p_pad,) position -> natural pixel index (P = padding)
    inv_perm: np.ndarray     # (P,) natural pixel -> position
    down_local: np.ndarray   # (n_chunks, C) int32 local window offset in [0, W*C]; W*C = none
    down_pos: np.ndarray     # (p_pad,) int32 downstream position, p_pad = pit/padding
    n_chunks: int
    chunk: int
    window: int              # W: max chunk distance to the downstream chunk
    num_pixels: int

    @property
    def p_pad(self):
        return self.n_chunks * self.chunk

    def pack_np(self, x, fill=0.0):
        """Host-side natural -> packed reorder of a trailing pixel axis."""
        x = np.asarray(x)
        shape = x.shape[:-1] + (1,)
        xp = np.concatenate([x, np.full(shape, fill, x.dtype)], axis=-1)
        src = np.where(self.perm < self.num_pixels, self.perm, self.num_pixels)
        return xp[..., src]


def pack_schedule(schedule) -> PackedSchedule:
    """Renumber a RoutingSchedule into positions and express every pixel's
    downstream as a local offset into the window of the next W chunks."""
    P = schedule.num_pixels
    chunks = np.asarray(schedule.chunks)          # (n_chunks, C), pad value = P
    n_chunks, C = chunks.shape
    perm = chunks.reshape(-1).astype(np.int64)    # position -> pixel (P = pad)
    p_pad = n_chunks * C
    valid = perm < P
    inv_perm = np.empty(P, dtype=np.int64)
    inv_perm[perm[valid]] = np.flatnonzero(valid)

    down_nat = np.asarray(schedule.downstream)    # (P+1,), P = pit
    pos = np.flatnonzero(valid)
    src_pix = perm[valid]
    tgt_nat = down_nat[src_pix]                   # natural downstream (or P = pit)
    has_down = tgt_nat < P
    tgt_pos = np.full(pos.size, -1, dtype=np.int64)
    tgt_pos[has_down] = inv_perm[tgt_nat[has_down]]

    src_chunk = pos // C
    delta = tgt_pos // C - src_chunk
    if has_down.any():
        assert delta[has_down].min() >= 1, "downstream must be in a later chunk"
        window = int(delta[has_down].max())
    else:
        window = 1
    sentinel = window * C
    down_local = np.full(p_pad, sentinel, dtype=np.int32)
    local = tgt_pos - (src_chunk + 1) * C
    down_local[pos[has_down]] = local[has_down].astype(np.int32)
    # position-space downstream index (p_pad = pit/padding dump slot), the
    # packed analogue of the reference downstruct (routing.py:159-164)
    down_pos = np.full(p_pad, p_pad, dtype=np.int32)
    down_pos[pos[has_down]] = tgt_pos[has_down].astype(np.int32)
    return PackedSchedule(perm=perm, inv_perm=inv_perm,
                          down_local=down_local.reshape(n_chunks, C),
                          down_pos=down_pos,
                          n_chunks=n_chunks, chunk=C, window=window,
                          num_pixels=P)


@partial(jax.jit, static_argnames=("n_chunks", "chunk", "window", "beta", "unroll"))
def _sweep(const_p, adx_p, down_local, n_chunks, chunk, window, beta, unroll=4):
    """The wavefront sweep over packed operands.

    const_p/adx_p: (n_chunks, L, C) schedule-order operands;
    down_local:    (n_chunks, C) int32 local window offsets.
    Returns q (n_chunks, L, C) in schedule order.

    The scan carry is only the rolling W-chunk inflow window (at iteration
    c it holds the accumulated upstream inflow for chunks [c, c+W)) — a
    few KB, with purely static slicing, so XLA keeps the loop state in
    registers/VMEM instead of copying a P-sized accumulator per chunk.
    """
    _, L, C = const_p.shape
    W = window
    dtype = const_p.dtype
    win0 = jnp.zeros((L, W * C), dtype)
    iota = jnp.arange(W * C, dtype=jnp.int32)

    def body(win, xs):
        cst, adx, dl = xs
        q = newton_solve(win[:, :C] + cst, adx, beta)
        # scatter-free downstream accumulation over the next W chunks
        # ([c+1, c+1+W) after the shift below): one-hot selection matmul.
        # Measured on the real chip against a K-wide inverse gather (14x
        # slower — TPU gathers) and a fused broadcast-multiply-reduce
        # (~12% slower) — the MXU dot wins despite materializing the
        # (C, W*C) selection operand.
        onehot = (dl[:, None] == iota[None, :]).astype(dtype)        # (C, W*C)
        add = jax.lax.dot(q, onehot, precision=jax.lax.Precision.HIGHEST)
        win = jnp.concatenate([win[:, C:], jnp.zeros((L, C), dtype)], axis=1) + add
        return win, q

    _, qs = jax.lax.scan(body, win0, (const_p, adx_p, down_local), unroll=unroll)
    return qs


class PackedRouter:
    """Wavefront router over a packed schedule; natural-order interface.

    Drop-in equivalent of the gather/scatter scan in ops/kinwave.py
    (equivalence gated at 1e-12 by tests/test_kinwave.py); the reference
    semantics it reproduces are kinematic_wave_parallel.py:160-184 +
    kinematic_wave_parallel_tools.py:34-92.
    """

    def __init__(self, schedule, unroll=4):
        ps = pack_schedule(schedule)
        self.ps = ps
        self.unroll = int(unroll)
        # dependency-free graph (e.g. an all-channel overland schedule where
        # every cell is its own pit): every pixel solves independently, no
        # sweep or permutation needed
        self.no_edges = bool((ps.down_local == ps.window * ps.chunk).all())
        # gather indices: padding positions read slot P of a (P+1)-padded source
        # int32 indices: under the global x64 flag a plain asarray yields
        # int64 gather indices, and the TPU gather for the per-step
        # pack/unpack permutations of continental vectors runs several
        # times slower (profiled)
        self.perm = jnp.asarray(
            np.where(ps.perm < ps.num_pixels, ps.perm, ps.num_pixels), jnp.int32)
        self.inv_perm = jnp.asarray(ps.inv_perm, jnp.int32)
        self.down_local = jnp.asarray(ps.down_local, jnp.int32)

    def pack(self, x, fill=0.0):
        """Natural (..., P) -> packed (..., p_pad) reorder on device."""
        fill_block = jnp.full(x.shape[:-1] + (1,), fill, x.dtype)
        xp = jnp.concatenate([x, fill_block], axis=-1)
        return xp[..., self.perm]

    def unpack(self, xp):
        """Packed (..., p_pad) -> natural (..., P)."""
        return xp[..., self.inv_perm]

    def _route_const(self, constant, a_dx_div_dt, beta):
        """Sweep over packed (L, p_pad) constant/adx operands."""
        ps = self.ps
        L = constant.shape[0]
        shape = (L, ps.n_chunks, ps.chunk)
        qs = _sweep(constant.reshape(shape).transpose(1, 0, 2),
                    a_dx_div_dt.reshape(shape).transpose(1, 0, 2),
                    self.down_local, ps.n_chunks, ps.chunk,
                    ps.window, float(beta), self.unroll)
        return qs.transpose(1, 0, 2).reshape(L, ps.p_pad)

    def route_packed(self, discharge, lateral_inflow, a_dx_div_dt, beta):
        """(L, p_pad) packed-order operands -> (L, p_pad) routed discharge.
        No permutation: for callers that keep the whole routing state in
        schedule order (ops/routing_ops.channel_routing does, so the
        permute gathers happen once per model step, not once per sweep)."""
        constant = a_dx_div_dt * discharge ** beta + lateral_inflow
        if self.no_edges:
            return newton_solve(constant, a_dx_div_dt, float(beta))
        return self._route_const(constant, a_dx_div_dt, beta)

    def route_batched(self, discharge, lateral_inflow, a_dx_div_dt, beta):
        """(L, P) natural-order operands -> (L, P) routed discharge."""
        constant = a_dx_div_dt * discharge ** beta + lateral_inflow
        if self.no_edges:
            return newton_solve(constant, a_dx_div_dt, float(beta))
        q_p = self._route_const(self.pack(constant), self.pack(a_dx_div_dt, 1.0), beta)
        return self.unpack(q_p)

    def route(self, discharge, lateral_inflow, a_dx_div_dt, beta):
        """Single-lane convenience wrapper."""
        return self.route_batched(discharge[None], lateral_inflow[None],
                                  a_dx_div_dt[None], beta)[0]
