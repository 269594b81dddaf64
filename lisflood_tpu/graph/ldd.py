"""Local-drain-direction (LDD) graph preprocessing — host-side NumPy.

Re-implements the subset of PCRaster map algebra the reference uses at
initialisation (routing.py:90-178, structures.py:43-61,
kinematic_wave_parallel.py:59-158): LDD decode, downstream/upstream
adjacency, topological levels from the outlets (Liu et al. 2014 wavefront
layers), flow accumulation, catchment labelling, pit handling and the
to-channel / structure-cut LDD edits.

All functions operate on the compressed (P,) pixel space of a Grid. The
routing *schedule* produced here (`build_schedule`) is the device-side
contract: pixels packed into fixed-width chunks such that every pixel's
upstream neighbours sit in strictly earlier chunks — the kinematic-wave
scan consumes it directly on TPU.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

FORCE_PYTHON = False   # tests set this to pin the NumPy fallbacks


def _native():
    """The native graph library, or None (NumPy fallbacks used instead)."""
    if FORCE_PYTHON:
        return None
    try:
        from . import native
        return native.load_library()
    except Exception:
        return None


# LDD keypad encoding: code -> (row shift, col shift); 5 = pit
LDD_OFFSETS = {
    1: (1, -1), 2: (1, 0), 3: (1, 1),
    4: (0, -1), 5: (0, 0), 6: (0, 1),
    7: (-1, -1), 8: (-1, 0), 9: (-1, 1),
}
PIT = 5


@dataclass
class FlowGraph:
    """Compressed-space drainage graph."""

    downstream: np.ndarray      # (P,) int32; index of downstream pixel, -1 = none (pit/MV)
    ldd: np.ndarray             # (P,) int8 compressed ldd codes (0 = missing)
    num_pixels: int

    @property
    def is_pit(self):
        return self.downstream == -1

    def upstream_counts(self):
        cnt = np.zeros(self.num_pixels, dtype=np.int32)
        valid = self.downstream >= 0
        np.add.at(cnt, self.downstream[valid], 1)
        return cnt

    def topo_distance(self):
        """Hop distance to the terminal pit: pits get 1, their upstreams 2, …
        (reference kinematic_wave_parallel.py:92-106). Because every pixel
        has exactly one downstream neighbour, dist(u) = dist(down(u)) + 1."""
        lib = _native()
        if lib is not None:
            from . import native
            return native.topo_distance(self.downstream)
        dist = -np.ones(self.num_pixels, dtype=np.int64)
        order = self.topo_order_down_up()
        down = self.downstream
        for p in order:
            d = down[p]
            dist[p] = 1 if d < 0 else dist[d] + 1
        return dist

    def topo_order_down_up(self):
        """Pixel indices ordered outlets-first (each pixel after its
        downstream neighbour). Iterative BFS from pits."""
        down = self.downstream
        ups_lists = self.upstream_lists()
        order = np.empty(self.num_pixels, dtype=np.int64)
        head = 0
        stack = list(np.flatnonzero(down < 0))
        seen = np.zeros(self.num_pixels, dtype=bool)
        queue = stack
        while queue:
            nxt = []
            for p in queue:
                order[head] = p
                head += 1
                seen[p] = True
                nxt.extend(ups_lists[p])
            queue = nxt
        if head != self.num_pixels:
            # isolated cycles cannot occur in a sound ldd; anything left is
            # disconnected missing-ldd cells — append them as pits
            rest = np.flatnonzero(~seen)
            order[head:head + rest.size] = rest
        return order

    def upstream_lists(self):
        """List of immediate upstream pixel indices per pixel."""
        lists = [[] for _ in range(self.num_pixels)]
        for p in np.flatnonzero(self.downstream >= 0):
            lists[self.downstream[p]].append(int(p))
        return lists

    # ------------------------------------------------------------------
    def accuflux(self, material):
        """Accumulated flux: for each pixel the sum of `material` over all
        upstream pixels incl. itself (PCRaster accuflux)."""
        lib = _native()
        if lib is not None:
            from . import native
            return native.accuflux(self.downstream, np.asarray(material, np.float64))
        acc = np.asarray(material, dtype=np.float64).copy()
        order = self.topo_order_down_up()
        down = self.downstream
        for p in order[::-1]:   # headwaters first
            d = down[p]
            if d >= 0:
                acc[d] += acc[p]
        return acc

    def catchment_labels(self, point_ids=None):
        """Label every pixel with the id of its terminal pit (PCRaster
        catchment over uniqueid(pit(ldd))): pits numbered 1..Npits in
        compressed (row-major) order, matching PCRaster's uniqueid scan
        order (reference routing.py:168-178)."""
        lib = _native()
        if point_ids is None and lib is not None:
            from . import native
            return native.catchment_labels(self.downstream)
        labels = np.zeros(self.num_pixels, dtype=np.int32)
        pits = np.flatnonzero(self.downstream < 0)
        if point_ids is None:
            labels[pits] = np.arange(1, pits.size + 1, dtype=np.int32)
        else:
            labels[pits] = point_ids[pits]
        down = self.downstream
        for p in self.topo_order_down_up():
            d = down[p]
            if d >= 0:
                labels[p] = labels[d]
        return labels

    def downstream_value(self, values, pit_value=None):
        """Value of `values` at the downstream pixel; at pits the pixel's own
        value (PCRaster downstream)."""
        values = np.asarray(values)
        out = values.copy()
        valid = self.downstream >= 0
        out[valid] = values[self.downstream[valid]]
        if pit_value is not None:
            out[~valid] = pit_value
        return out

    def upstream_sum(self, values):
        """Sum of `values` over immediate upstream pixels (PCRaster upstream)."""
        out = np.zeros(self.num_pixels, dtype=np.float64)
        valid = self.downstream >= 0
        np.add.at(out, self.downstream[valid], np.asarray(values, dtype=np.float64)[valid])
        return out


def build_flow_graph(ldd_compressed, grid) -> FlowGraph:
    """Build the compressed-space FlowGraph from a compressed LDD vector.

    Cells whose LDD is missing (NaN/0) are isolated pits; cells draining
    outside the grid or into masked cells become pits (this reproduces the
    net effect of PCRaster lddmask + the boundary guard in the reference's
    upDownLookups, kinematic_wave_parallel_tools.py:111-130)."""
    P = grid.num_pixels
    ldd = np.nan_to_num(np.asarray(ldd_compressed, dtype=np.float64), nan=0.0).astype(np.int8)
    # compressed index -> (row, col)
    flat_idx = np.flatnonzero(grid.land_flat)
    rows, cols = np.divmod(flat_idx, grid.ncols)
    # land lookup: (row, col) -> compressed index
    land_points = -np.ones(grid.nrows * grid.ncols, dtype=np.int64)
    land_points[flat_idx] = np.arange(P)

    downstream = -np.ones(P, dtype=np.int32)
    for code, (dr, dc) in LDD_OFFSETS.items():
        if code == PIT:
            continue
        sel = np.flatnonzero(ldd == code)
        if sel.size == 0:
            continue
        r2 = rows[sel] + dr
        c2 = cols[sel] + dc
        inside = (r2 >= 0) & (r2 < grid.nrows) & (c2 >= 0) & (c2 < grid.ncols)
        tgt = np.full(sel.size, -1, dtype=np.int64)
        tgt[inside] = land_points[r2[inside] * grid.ncols + c2[inside]]
        downstream[sel] = tgt.astype(np.int32)
    return FlowGraph(downstream=downstream, ldd=ldd, num_pixels=P)


def ldd_to_channel(ldd_compressed, is_channel):
    """LddToChan: set channel pixels to pits so runoff routes overland to the
    nearest channel (reference routing.py:125, lddrepair(ifthenelse(...)))."""
    ldd = np.asarray(ldd_compressed, dtype=np.float64).copy()
    ldd[np.asarray(is_channel, dtype=bool)] = PIT
    return ldd


def ldd_mask(ldd_compressed, keep):
    """lddmask: restrict the ldd to `keep` cells; others become missing (0)."""
    ldd = np.nan_to_num(np.asarray(ldd_compressed, dtype=np.float64), nan=0.0).copy()
    ldd[~np.asarray(keep, dtype=bool)] = 0.0
    return ldd


def cut_structures(ldd_compressed, graph: FlowGraph, is_structure):
    """Insert pits at cells immediately upstream of structures
    (reservoirs/lakes), so the kinematic wave stops there; the structure's
    outflow is re-injected downstream (reference structures.py:43-61).
    Returns (new_ldd, is_ups_of_structure)."""
    is_structure = np.asarray(is_structure, dtype=bool)
    # pixel is "upstream of structure" if its downstream pixel is a structure
    down_ok = graph.downstream >= 0
    is_ups = np.zeros(graph.num_pixels, dtype=bool)
    is_ups[down_ok] = is_structure[graph.downstream[down_ok]]
    new_ldd = np.asarray(ldd_compressed, dtype=np.float64).copy()
    new_ldd[is_ups] = PIT
    return new_ldd, is_ups


# ---------------------------------------------------------------------------
# Routing schedule: dependency-safe fixed-width chunks


@dataclass
class RoutingSchedule:
    """Chunked wavefront schedule for the kinematic-wave scan.

    chunks:      (n_chunks, chunk) int32 pixel indices, padded with P (an
                 extra scratch slot) so gathers/scatters on padded lanes are
                 harmless;
    downstream:  (P+1,) int32 downstream index per pixel, P for pits/padding
                 (matches the reference's downstruct convention,
                 routing.py:159-164);
    """

    chunks: np.ndarray
    downstream: np.ndarray
    num_pixels: int
    chunk_size: int

    @property
    def num_chunks(self):
        return self.chunks.shape[0]


def build_schedule(graph: FlowGraph, chunk_size=256, order_graph=None) -> RoutingSchedule:
    """Pack pixels into fixed-width chunks in topological (headwater->outlet)
    order such that each pixel's upstream neighbours are in strictly earlier
    chunks. This generalises the reference's per-level batches
    (kinematic_wave_parallel.py:140-158): consecutive sparse levels fuse
    into one chunk when they have no internal dependency, reducing the
    sequential depth of the scan.

    Dispatches to the native C++ pass (native/graph_preproc.cpp pack_chunks,
    equivalence-tested in tests/test_native_graph.py) and falls back to the
    NumPy/Python implementation when the toolchain is unavailable.

    `order_graph` (optional) supplies EXTRA ordering constraints: chunks
    are packed against its (superset) edge set while the schedule's
    downstream/edge table stays `graph`'s. The structure-cut routing graph
    uses the PRE-CUT channel graph here so lake/reservoir cells land in
    chunks strictly after their upstream feeders — required by the
    diagonal-pipelined sub-step loop (ops/routing_ops.py), harmless (just
    a stricter packing) for the sequential one."""
    P = graph.num_pixels
    og = order_graph if order_graph is not None else graph
    lib = _native()
    if lib is not None:
        from . import native
        packed, _ = native.pack_chunks(og.downstream, chunk_size)
        downstream = np.full(P + 1, P, dtype=np.int32)
        valid = graph.downstream >= 0
        downstream[:P][valid] = graph.downstream[valid]
        return RoutingSchedule(chunks=packed, downstream=downstream,
                               num_pixels=P, chunk_size=chunk_size)
    dist = og.topo_distance()
    # iterate headwaters (max dist) -> outlets (dist 1), stable by pixel index
    order = np.lexsort((np.arange(P), -dist))
    chunk_of = -np.ones(P, dtype=np.int64)
    chunks = []
    current = []
    down = graph.downstream
    # Pixels arrive upstream-before-downstream; a pixel can join the current
    # chunk unless one of its upstreams is already in it.
    ups_lists = og.upstream_lists()
    for p in order:
        conflict = any(chunk_of[u] == len(chunks) for u in ups_lists[p])
        if conflict or len(current) >= chunk_size:
            chunks.append(current)
            current = []
        current.append(int(p))
        chunk_of[p] = len(chunks)
    if current:
        chunks.append(current)

    n = len(chunks)
    packed = np.full((n, chunk_size), P, dtype=np.int32)
    for i, ch in enumerate(chunks):
        packed[i, : len(ch)] = ch
    downstream = np.full(P + 1, P, dtype=np.int32)
    valid = down >= 0
    downstream[:P][valid] = down[valid]
    return RoutingSchedule(chunks=packed, downstream=downstream,
                           num_pixels=P, chunk_size=chunk_size)


def direction_codes(downstream, flat_idx, nrows, ncols):
    """Per-2D-cell LDD keypad code RECOMPUTED from a (possibly repaired)
    downstream table: 0 where the pixel has no downstream (pit/missing).
    Lets neighbour-transfer ops run as 2-D stencils (8 masked shifted
    adds at HBM bandwidth) instead of segment-sum scatters — the TPU-native
    formulation of PCRaster's upstream() on the raster grid."""
    downstream = np.asarray(downstream)
    flat_idx = np.asarray(flat_idx, np.int64)
    codes2d = np.zeros(nrows * ncols, np.int8)
    valid = downstream >= 0
    src = flat_idx[valid]
    tgt = flat_idx[downstream[valid]]
    dr = tgt // ncols - src // ncols
    dc = tgt % ncols - src % ncols
    lut = {off: code for code, off in LDD_OFFSETS.items()}
    codes = np.zeros(src.size, np.int8)
    for (r_, c_), code in lut.items():
        if code == PIT:
            continue
        codes[(dr == r_) & (dc == c_)] = code
    # every edge must be grid-adjacent for the stencil to be exact
    all_adjacent = bool((codes != 0).all())
    codes2d[src] = codes
    return codes2d, all_adjacent


def window_total(values2d, window_cells):
    """PCRaster windowtotal on the 2-D grid: sum over a square window of
    `window_cells` x `window_cells` cells centred on each cell (used by
    groundwaterSmooth, reference waterabstraction.py:602-628). NaN cells
    contribute 0."""
    k = int(window_cells)
    half = k // 2
    data = np.nan_to_num(np.asarray(values2d, dtype=np.float64), nan=0.0)
    # summed-area table with zero padding
    padded = np.zeros((data.shape[0] + k, data.shape[1] + k))
    padded[half:half + data.shape[0], half:half + data.shape[1]] = data
    sat = padded.cumsum(0).cumsum(1)
    sat = np.pad(sat, ((1, 0), (1, 0)))
    out = (sat[k:, k:] - sat[:-k, k:] - sat[k:, :-k] + sat[:-k, :-k])
    return out[: data.shape[0], : data.shape[1]]
