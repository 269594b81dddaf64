"""Subcatchment-aware domain decomposition for multi-device routing.

The reference parallelizes routing only within shared memory (wavefront
levels, kinematic_wave_parallel.py:140-158). For a device mesh the right
decomposition keeps whole drainage subtrees on one shard so the wavefront
sweep is shard-local and only the few cut LDD edges exchange discharge
(SURVEY.md §5 long-context analogue). This module computes that partition
host-side at init:

- whole catchments are bin-packed (LPT) onto shards, balanced by pixel
  count — catchments are independent trees, so a whole-catchment
  partition has ZERO cut edges;
- a catchment larger than the shard budget is split at subtree roots
  (greedy largest-fitting-subtree), each split root's downstream link
  becoming a cut edge.
"""
from __future__ import annotations

import numpy as np


def subtree_pixels(graph, root):
    """All pixels draining through `root` (inclusive) — DFS over
    upstream_lists."""
    ups = graph.upstream_lists()
    out = []
    stack = [int(root)]
    while stack:
        p = stack.pop()
        out.append(p)
        stack.extend(int(u) for u in ups[p])
    return np.asarray(out, dtype=np.int64)


def catchment_partition(graph, n_shards, slack=0.10):
    """Partition pixels into `n_shards` shards along subtree boundaries.

    Returns (shard_of, stats): shard_of is (P,) int32; stats carries the
    cut-edge count/list and per-shard pixel counts."""
    P = graph.num_pixels
    if n_shards <= 1:
        return np.zeros(P, np.int32), {"cut_edges": np.zeros((0, 2), np.int64),
                                       "shard_sizes": np.array([P])}
    labels = graph.catchment_labels()              # 1..N
    upc = graph.accuflux(np.ones(P)).astype(np.int64)   # subtree size incl self
    cap = int(np.ceil(P / n_shards) * (1.0 + slack))

    # units to pack: whole catchments, or subtree pieces of oversized ones
    units = []          # (size, [pixel arrays])
    ups = graph.upstream_lists()
    down = graph.downstream
    for lab in np.unique(labels):
        pix = np.flatnonzero(labels == lab)
        if pix.size <= cap:
            units.append((pix.size, pix))
            continue
        # split: repeatedly peel the largest subtree that fits the budget
        remaining = set(pix.tolist())
        # iterate candidate roots by subtree size descending; a root is
        # usable when its whole subtree is still unassigned and fits
        order = pix[np.argsort(-upc[pix])]
        for root in order:
            if int(root) not in remaining:
                continue
            if upc[root] > cap:
                continue        # too big — its children will be visited
            sub = subtree_pixels(graph, root)
            if not all(int(q) in remaining for q in sub):
                # part of this subtree was peeled into an earlier unit
                sub = np.asarray([q for q in sub if int(q) in remaining], np.int64)
            units.append((sub.size, sub))
            remaining -= set(sub.tolist())
        if remaining:       # the stem near the outlet (each subtree too big)
            rest = np.asarray(sorted(remaining), np.int64)
            units.append((rest.size, rest))

    # LPT bin packing
    units.sort(key=lambda t: -t[0])
    loads = np.zeros(n_shards, np.int64)
    shard_of = np.full(P, -1, np.int32)
    for size, pix in units:
        s = int(np.argmin(loads))
        shard_of[pix] = s
        loads[s] += size
    assert (shard_of >= 0).all()

    # cut edges: LDD edges crossing shards
    src = np.flatnonzero(down >= 0)
    dst = down[src]
    cross = shard_of[src] != shard_of[dst]
    cut = np.stack([src[cross], dst[cross]], axis=1)
    return shard_of, {"cut_edges": cut, "shard_sizes": loads}
