"""Shard-local packed kinematic-wave sweep with explicit cut-edge exchange.

Multi-device recast of ops/kinwave_packed.py for subcatchment-aware domain
decomposition (SURVEY.md §5): pixels are partitioned into S shards along
subtree boundaries (parallel/partition.py), and every operand carries an
explicit shard axis. Each scan step routes ONE chunk per shard:

  per chunk: slice each shard's inflow window -> vectorized Newton ->
  per-shard one-hot einsum scatters each shard's discharge into its own
  rolling window (batched matmul, zero cross-shard traffic) -> the few
  cut LDD edges are exchanged with one small dense (L, K) x (K, S*W*C)
  matmul (K = max cut edges per chunk; skipped entirely when the
  partition has no cut edges).

Under `jit` over a device mesh with the shard axis sharded, the per-shard
einsum stays device-local and only the K-wide cut exchange lowers to a
collective — the explicit halo the reference's shared-memory wavefront
(kinematic_wave_parallel.py:140-158) never needed.

The chunking is built in GLOBAL topological lockstep (a chunk closes for
all shards at once), so every edge — local or cut — targets a strictly
later chunk and the sweep is bit-compatible across any device count for
a fixed shard count S.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .kinwave_packed import _newton_unrolled


@dataclass
class ShardedSchedule:
    """Host-side renumbering into (shard, chunk, lane) positions.

    Flat position space is shard-major: pos = s*(n_chunks*C) + c*C + l,
    p_pad = S*n_chunks*C; padding positions map to pixel index P."""

    perm: np.ndarray         # (p_pad,) position -> natural pixel (P = pad)
    inv_perm: np.ndarray     # (P,) natural pixel -> position
    down_local: np.ndarray   # (n_chunks, S, C) int32 window offset; W*C = none
    down_pos: np.ndarray     # (p_pad,) int32 downstream position; p_pad = pit
    cut_src: np.ndarray      # (n_chunks, K) int32 lane in (S*C); S*C = pad
    cut_dst: np.ndarray      # (n_chunks, K) int32 index in (S*W*C); pad slot 0
    n_chunks: int
    n_shards: int
    chunk: int
    window: int
    num_pixels: int

    @property
    def p_pad(self):
        return self.n_shards * self.n_chunks * self.chunk

    def pack_np(self, x, fill=0.0):
        """Host-side natural -> packed reorder of a trailing pixel axis."""
        x = np.asarray(x)
        shape = x.shape[:-1] + (1,)
        xp = np.concatenate([x, np.full(shape, fill, x.dtype)], axis=-1)
        src = np.where(self.perm < self.num_pixels, self.perm, self.num_pixels)
        return xp[..., src]


def build_sharded_schedule(graph, shard_of, chunk_size=256) -> ShardedSchedule:
    """Chunk the graph in global topological lockstep with per-shard lane
    capacity: iterating headwaters -> outlets, a pixel joins the current
    chunk unless one of its upstreams is already in it (read-before-write
    within a chunk, including across shards) or its shard's lane budget is
    full — then the chunk closes for ALL shards."""
    P = graph.num_pixels
    shard_of = np.asarray(shard_of, np.int32)
    S = int(shard_of.max()) + 1
    C = int(chunk_size)
    down = graph.downstream
    dist = graph.topo_distance()
    order = np.lexsort((np.arange(P), -dist))
    ups_lists = graph.upstream_lists()

    chunk_of = -np.ones(P, np.int64)
    lane_of = -np.ones(P, np.int64)
    counts = np.zeros(S, np.int64)
    chunks = []                       # list of per-shard lists
    current = [[] for _ in range(S)]

    def close():
        chunks.append(current)
        counts[:] = 0

    n_open = 0
    for p in order:
        s = shard_of[p]
        conflict = any(chunk_of[u] == len(chunks) for u in ups_lists[p])
        if conflict or counts[s] >= C:
            close()
            current = [[] for _ in range(S)]
        lane_of[p] = counts[s]
        chunk_of[p] = len(chunks)
        current[s].append(int(p))
        counts[s] += 1
        n_open += 1
    if any(current[s] for s in range(S)):
        chunks.append(current)

    n_chunks = len(chunks)
    # perm / inv_perm (shard-major flat layout)
    B = n_chunks * C
    p_pad = S * B
    perm = np.full(p_pad, P, np.int64)
    inv_perm = np.empty(P, np.int64)
    pos = shard_of.astype(np.int64) * B + chunk_of * C + lane_of
    perm[pos] = np.arange(P)
    inv_perm[:] = pos

    # edges (a dependency-free graph — e.g. the all-pit overland schedule —
    # has none; the router then takes the no_edges fast path)
    src_valid = np.flatnonzero(down >= 0)
    dst = down[src_valid]
    if src_valid.size:
        delta = chunk_of[dst] - chunk_of[src_valid]
        assert delta.min() >= 1, "downstream must land in a later chunk"
        W = int(max(1, delta.max()))
    else:
        W = 1

    down_local = np.full((n_chunks, S, C), W * C, np.int32)
    down_pos = np.full(p_pad, p_pad, np.int32)
    down_pos[pos] = p_pad
    same = shard_of[src_valid] == shard_of[dst]
    ls, ld = src_valid[same], dst[same]
    down_local[chunk_of[ls], shard_of[ls], lane_of[ls]] = (
        (chunk_of[ld] - chunk_of[ls] - 1) * C + lane_of[ld]).astype(np.int32)
    down_pos[pos[src_valid]] = pos[dst].astype(np.int32)

    # cut edges, grouped by source chunk
    cs, cd = src_valid[~same], dst[~same]
    K = 0
    if cs.size:
        per_chunk = np.bincount(chunk_of[cs], minlength=n_chunks)
        K = int(per_chunk.max())
    cut_src = np.full((n_chunks, max(K, 1)), S * C, np.int32)
    cut_dst = np.zeros((n_chunks, max(K, 1)), np.int32)
    if cs.size:
        fill = np.zeros(n_chunks, np.int64)
        for u, v in zip(cs, cd):
            c = chunk_of[u]
            j = fill[c]
            fill[c] = j + 1
            cut_src[c, j] = shard_of[u] * C + lane_of[u]
            cut_dst[c, j] = (shard_of[v] * (W * C)
                             + (chunk_of[v] - c - 1) * C + lane_of[v])
    return ShardedSchedule(perm=perm, inv_perm=inv_perm, down_local=down_local,
                           down_pos=down_pos, cut_src=cut_src, cut_dst=cut_dst,
                           n_chunks=n_chunks, n_shards=S, chunk=C, window=W,
                           num_pixels=P)


@partial(jax.jit, static_argnames=("n_chunks", "S", "C", "W", "beta",
                                   "has_cuts", "unroll"))
def _sweep_sharded(const_p, adx_p, down_local, cut_src, cut_dst,
                   n_chunks, S, C, W, beta, has_cuts, unroll=2):
    """const_p/adx_p: (n_chunks, L, S, C). Returns q in the same layout."""
    _, L, _, _ = const_p.shape
    dtype = const_p.dtype
    iota_w = jnp.arange(W * C, dtype=jnp.int32)
    win0 = jnp.zeros((L, S, W * C), dtype)
    iota_cut = jnp.arange(S * W * C, dtype=jnp.int32)

    def body(win, xs):
        cst, adx, dl, csrc, cdst = xs
        q = _newton_unrolled(win[:, :, :C] + cst, adx, beta)        # (L, S, C)
        onehot = (dl[:, :, None] == iota_w[None, None, :]).astype(dtype)
        add = jnp.einsum("lsc,scw->lsw", q, onehot,
                         precision=jax.lax.Precision.HIGHEST)
        if has_cuts:
            qflat = q.reshape(L, S * C)
            qpad = jnp.concatenate([qflat, jnp.zeros((L, 1), dtype)], axis=1)
            vals = qpad[:, csrc]                                    # (L, K)
            oh2 = (cdst[:, None] == iota_cut[None, :]).astype(dtype)
            add = add + jax.lax.dot(vals, oh2,
                                    precision=jax.lax.Precision.HIGHEST
                                    ).reshape(L, S, W * C)
        win = jnp.concatenate([win[:, :, C:], jnp.zeros((L, S, C), dtype)],
                              axis=2) + add
        return win, q

    _, qs = jax.lax.scan(body, win0,
                         (const_p, adx_p, down_local, cut_src, cut_dst),
                         unroll=unroll)
    return qs


class ShardedRouter:
    """Drop-in router over a subcatchment-sharded schedule; same interface
    contract as ops/kinwave_packed.PackedRouter (pack/unpack/route_packed/
    route_batched + `ps` position space), gated by the same 1e-12
    equivalence tests."""

    def __init__(self, schedule_or_graph, shard_of=None, chunk_size=256,
                 unroll=2):
        if isinstance(schedule_or_graph, ShardedSchedule):
            ps = schedule_or_graph
        else:
            ps = build_sharded_schedule(schedule_or_graph, shard_of, chunk_size)
        self.ps = ps
        self.unroll = int(unroll)
        sentinel = ps.window * ps.chunk
        self.no_edges = bool((ps.down_local == sentinel).all()
                             and (ps.cut_src == ps.n_shards * ps.chunk).all())
        self.has_cuts = bool((ps.cut_src != ps.n_shards * ps.chunk).any())
        self.perm = jnp.asarray(np.where(ps.perm < ps.num_pixels, ps.perm,
                                         ps.num_pixels))
        self.inv_perm = jnp.asarray(ps.inv_perm)
        self.down_local = jnp.asarray(ps.down_local)
        self.cut_src = jnp.asarray(ps.cut_src)
        self.cut_dst = jnp.asarray(ps.cut_dst)

    def pack(self, x, fill=0.0):
        fill_block = jnp.full(x.shape[:-1] + (1,), fill, x.dtype)
        xp = jnp.concatenate([x, fill_block], axis=-1)
        return xp[..., self.perm]

    def unpack(self, xp):
        return xp[..., self.inv_perm]

    def _route_const(self, constant, a_dx_div_dt, beta):
        ps = self.ps
        L = constant.shape[0]
        shape = (L, ps.n_shards, ps.n_chunks, ps.chunk)
        to_xs = lambda x: x.reshape(shape).transpose(2, 0, 1, 3)
        qs = _sweep_sharded(to_xs(constant), to_xs(a_dx_div_dt),
                            self.down_local, self.cut_src, self.cut_dst,
                            ps.n_chunks, ps.n_shards, ps.chunk, ps.window,
                            float(beta), self.has_cuts, self.unroll)
        return qs.transpose(1, 2, 0, 3).reshape(L, ps.p_pad)

    def route_packed(self, discharge, lateral_inflow, a_dx_div_dt, beta):
        constant = a_dx_div_dt * discharge ** beta + lateral_inflow
        if self.no_edges:
            return _newton_unrolled(constant, a_dx_div_dt, float(beta))
        return self._route_const(constant, a_dx_div_dt, beta)

    def route_batched(self, discharge, lateral_inflow, a_dx_div_dt, beta):
        constant = a_dx_div_dt * discharge ** beta + lateral_inflow
        if self.no_edges:
            return _newton_unrolled(constant, a_dx_div_dt, float(beta))
        q_p = self._route_const(self.pack(constant), self.pack(a_dx_div_dt, 1.0), beta)
        return self.unpack(q_p)

    def route(self, discharge, lateral_inflow, a_dx_div_dt, beta):
        return self.route_batched(discharge[None], lateral_inflow[None],
                                  a_dx_div_dt[None], beta)[0]
